"""J-sweep for batched encrypt/decrypt throughput at 16k_5q.

Question (round 4 session 4): batched encrypt at J=16 measures 0.87x the
V100's derived 8385 ops/s — does a larger per-launch message batch
(chunk cap at n=2^14 is 192) amortize enough per-op overhead to cross
1x?  Same-process sweep, bench.py methodology (chained fori_loop slopes,
inner counts auto-scaled so the signal stays >= ~100 ms).

Run on the real TPU:  python scratch/batched_jsweep.py [set ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench  # noqa: E402  (sets the compile cache env at import)
from ntt_cuda_tpu.models import bfv
from ntt_cuda_tpu.params import get_bfv_params
from ntt_cuda_tpu.utils import profiling


def main():
    sets = sys.argv[1:] or ["16k_5q"]
    print(f"[jsweep] backend={jax.default_backend()}")
    for name in sets:
        for J in (16, 32, 64):
            row = bench._bench_bfv_batched_one(
                bfv, get_bfv_params, profiling, jax, jnp, name, J)
            print(f"[jsweep] {name} J={J}: {row}", flush=True)


if __name__ == "__main__":
    main()
