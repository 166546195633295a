"""ntt_cuda_tpu: TPU-native NTT + BFV primitive library (JAX/Pallas).

A from-scratch re-design of the capabilities of ozgunozerk/NTT-Cuda for
TPU: 60-bit modular arithmetic in native-u64 lanes (Montgomery form),
fused negacyclic NTT kernels in VMEM, Salsa20 samplers, and full BFV
keygen/encrypt/decrypt, sharded over device meshes via shard_map.

The library requires 64-bit integer support; importing enables
``jax_enable_x64`` process-wide.
"""

import sys as _sys

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# The op-fused BFV kernels trace to jaxprs deep enough to overflow
# CPython's default 1000-frame recursion limit inside jax's tracing
# recursion (seen first on real-TPU keygen at n=16384).  Raise it once,
# process-wide, to a depth that covers the largest parameter set.
if _sys.getrecursionlimit() < 20000:
    _sys.setrecursionlimit(20000)

from . import params  # noqa: E402,F401
from .params import BFVParams, get_bfv_params, get_params  # noqa: E402,F401

__version__ = "0.1.0"
