"""Mosaic-lowering regression tests: AOT-lower the op-fused pipelines to
the TPU platform from the CPU host.

jax.jit(f).trace().lower(lowering_platforms=("tpu",)) runs the FULL
Mosaic kernel lowering (pallas kernel bodies AND BlockSpec index maps)
without any TPU attached, so every class of trace/lowering failure the
round-3 bench hit on hardware — most notably the infinite
_convert_helper recursion on any 64-bit cast that sneaks into an
index-map jaxpr under x64 (a bare python literal in jnp.where is
enough) — is caught here on CPU.

The reference has no analog (nvcc either compiles or it doesn't at
build time); this is the TPU-native counterpart of "the template
instantiates" (ntt_60bit.cuh:699-777).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ntt_cuda_tpu import params as params_mod
from ntt_cuda_tpu.models import bfv


def _lower_tpu(fn):
    return jax.jit(fn).trace().lower(lowering_platforms=("tpu",))


@pytest.fixture(scope="module")
def ctx4k():
    return bfv.BFVContext.build(params_mod.get_bfv_params("4k_3q"),
                                backend="pallas", fusion="op")


@pytest.fixture(scope="module")
def zeros4k(ctx4k):
    p = ctx4k.params
    m = jnp.asarray(np.arange(p.n, dtype=np.uint64) % p.t)
    sk_s, pk_s = jax.eval_shape(lambda: ctx4k.keygen(nonce=0))
    sk = jnp.zeros(sk_s.shape, sk_s.dtype)
    pk = jnp.zeros(pk_s.shape, pk_s.dtype)
    ct_s = jax.eval_shape(lambda: ctx4k.encrypt(pk, m, nonce=1))
    ct = jnp.zeros(ct_s.shape, ct_s.dtype)
    return m, sk, pk, ct


def test_keygen_lowers_to_mosaic(ctx4k):
    _lower_tpu(lambda: ctx4k.keygen(nonce=0))


def test_encrypt_lowers_to_mosaic(ctx4k, zeros4k):
    m, sk, pk, ct = zeros4k
    _lower_tpu(lambda: ctx4k.encrypt(pk, m, nonce=1))


def test_decrypt_lowers_to_mosaic(ctx4k, zeros4k):
    m, sk, pk, ct = zeros4k
    _lower_tpu(lambda: ctx4k.decrypt(sk, ct))


def test_mul_relin_lowers_to_mosaic(ctx4k, zeros4k):
    m, sk, pk, ct = zeros4k
    rk_s = jax.eval_shape(lambda: ctx4k.relin_keygen(sk, nonce=2))
    rk = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), rk_s)
    _lower_tpu(lambda: ctx4k.relinearize(ctx4k.mul(ct, ct), rk))


def test_no_64bit_in_kernel_index_maps(ctx4k, zeros4k):
    """Structural guard: no pallas kernel jaxpr (body or index map) may
    contain a 64-bit convert_element_type — Mosaic's _convert_helper
    recurses without termination on them (jax 0.9.0
    pallas/mosaic/lowering.py:2291), which surfaced as the round-3
    RecursionError at the 32k sets."""
    m, sk, pk, ct = zeros4k

    def walk(jaxpr, in_kernel, hits):
        for eqn in jaxpr.eqns:
            k = in_kernel or eqn.primitive.name == "pallas_call"
            if in_kernel and eqn.primitive.name == "convert_element_type":
                src = str(eqn.invars[0].aval.dtype)
                dst = str(eqn.outvars[0].aval.dtype)
                if "64" in src or "64" in dst:
                    hits.append((src, dst, eqn))
            for v in eqn.params.values():
                for vv in (v if isinstance(v, (list, tuple)) else [v]):
                    j = getattr(vv, "jaxpr", None)
                    if j is not None:
                        walk(j if hasattr(j, "eqns") else j.jaxpr, k, hits)
        return hits

    for fn in (lambda: ctx4k.keygen(nonce=0),
               lambda: ctx4k.encrypt(pk, m, nonce=1),
               lambda: ctx4k.decrypt(sk, ct)):
        hits = walk(jax.make_jaxpr(fn)().jaxpr, False, [])
        assert not hits, f"64-bit converts inside pallas kernels: {hits[:3]}"
