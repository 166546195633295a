"""Measured VPU speed-of-light probe for the NTT butterfly mix
(VERDICT round-4 item 8: the README's per-transform floor was an
arithmetic ESTIMATE — measure it).

Three Pallas microkernels run K dependent iterations of the exact
instruction mixes the transform kernels execute, on a VMEM-resident
(2, n1, 128) u32 limb tile with NO table/HBM traffic inside the loop
(the loop-carried dependence x_{i+1} = f(x_i) makes the body
unhoistable):

  * mul     — one shoup_mulmod_lazy4 per element per iteration
              (24 lane-muls + adds: the twiddle product alone)
  * stageA  — one full forward stage-A roll+select butterfly pass
              (2 sublane rotates + 2 selects + shoup + signed add +
              reduce_once: ntt_pallas._stage_a_fwd body at fixed d)
  * stageB  — one full stage-B lane-rotate butterfly pass
              (pltpu.roll axis=1 instead of axis=0)

Per-iteration cost = (chained-slope time of one K=256-iteration kernel)
/ 256: the body dominates launch + tile-IO (~1 us) by >100x, so the
uncorrected bias is ~1%.  (A two-kernel K-slope variant measured first
amplified the relay's between-measurement drift into 2x swings —
min-over-epochs of ONE compiled kernel is the stable estimator.)  The
derived per-transform floor at n=2^15 is  L1*stageA + L2*stageB +
1*mul (twiddle fix) — printed against the shipped kernel's measured
us/transform.

Usage (real TPU):  python benchmarks/floor_probe.py [n]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntt_cuda_tpu.ops import limb32
from ntt_cuda_tpu.params import get_params
from ntt_cuda_tpu.utils import profiling, hostmath

U32 = jnp.uint32
N2 = 128


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _pair_const(val, shape):
    lo = jnp.full(shape, np.uint32(val & 0xFFFFFFFF), U32)
    hi = jnp.full(shape, np.uint32(val >> 32), U32)
    return lo, hi


def make_probe(kind: str, K: int, n1: int, q: int, psi: int):
    """Jitted step(x, k_outer) chaining k_outer kernel calls, each doing
    K in-kernel iterations of `kind`'s instruction mix."""
    wv = pow(psi, 3, q)                      # any fixed twiddle < q
    wpv = (wv << 64) // q

    def kernel(x_ref, o_ref):
        row = jax.lax.broadcasted_iota(U32, (n1, N2), 0)
        lane = jax.lax.broadcasted_iota(U32, (n1, N2), 1)
        q4 = _pair_const(4 * q, (n1, N2))
        qq = _pair_const(q, (n1, N2))
        w = _pair_const(wv, (n1, N2))
        wp = _pair_const(wpv, (n1, N2))
        d = 8                                 # fixed butterfly distance
        u_mask_a = (row & U32(d)) == 0
        u_mask_b = (lane & U32(d)) == 0

        def body(i, x):
            if kind == "mul":
                return limb32.shoup_mulmod_lazy4(x, w, wp, qq)
            if kind == "stageA":
                rv = tuple(pltpu.roll(v, np.int32(n1 - d), 0) for v in x)
                ru = tuple(pltpu.roll(v, np.int32(d), 0) for v in x)
                u_mask = u_mask_a
            else:                             # stageB
                rv = tuple(pltpu.roll(v, np.int32(N2 - d), 1) for v in x)
                ru = tuple(pltpu.roll(v, np.int32(d), 1) for v in x)
                u_mask = u_mask_b
            v_val = limb32.select64(u_mask, rv, x)
            u_val = limb32.select64(u_mask, x, ru)
            t = limb32.shoup_mulmod_lazy4(v_val, w, wp, qq)
            tt = limb32.select64(u_mask, t, limb32.sub64(q4, t))
            return limb32.reduce_once(limb32.add64(u_val, tt), q4)

        x = (x_ref[0], x_ref[1])
        x = jax.lax.fori_loop(0, K, body, x)
        o_ref[0] = x[0]
        o_ref[1] = x[1]

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, n1, N2), U32),
    )

    @jax.jit
    def step(x, k):
        return jax.lax.fori_loop(0, k, lambda _, z: call(z), x)

    return step


def probe(kind: str, n1: int, q: int, psi: int, K: int = 256,
          epochs: int = 5):
    """Per-iteration (per-pass) seconds for `kind` on an (n1, 128) tile."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 32, (2, n1, N2), dtype=np.uint64)
                    .astype(np.uint32))
    step = make_probe(kind, K, n1, q, psi)
    per_call = profiling.time_chained_dynamic(
        step, x, inner_lo=8, inner_hi=64, reps=3, epochs=epochs)
    return per_call / K


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    n1 = n // N2
    L1 = n1.bit_length() - 1
    L2 = 7
    q, psi, _, _, _ = get_params(n)
    log(f"backend={jax.default_backend()}  n={n} n1={n1} "
        f"(L1={L1} stage-A passes, {L2} stage-B passes)")
    t0 = time.time()
    res = {}
    for kind in ("mul", "stageA", "stageB"):
        s = probe(kind, n1, q, psi)
        res[kind] = s
        per_el_ns = s / (n1 * N2) * 1e9
        log(f"  {kind:7s}: {s*1e6:8.3f} us/pass on ({n1},128) "
            f"[{per_el_ns:.3f} ns/element, "
            f"{n1 * N2 / s / 1e9:.2f} G elem/s]")
    floor_us = (L1 * res["stageA"] + L2 * res["stageB"] + res["mul"]) * 1e6
    log(f"  derived per-transform floor at n=2^{n.bit_length()-1}: "
        f"{floor_us:.2f} us "
        f"(= {L1}*stageA + {L2}*stageB + 1*mul, zero-IO)")
    log(f"  [{time.time()-t0:.0f}s total]")
    print(f'{{"n": {n}, "mul_us": {res["mul"]*1e6:.4f}, '
          f'"stageA_us": {res["stageA"]*1e6:.4f}, '
          f'"stageB_us": {res["stageB"]*1e6:.4f}, '
          f'"floor_us_per_transform": {floor_us:.3f}}}')


if __name__ == "__main__":
    main()
