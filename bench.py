"""Benchmark: NTT throughput per chip at N=2^15, 60-bit modulus family.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Baseline: the reference's Tesla V100 forward-NTT latency at N=2^15,
55-bit modulus — 39 us/transform => 25,641 NTT/s/device (Article.pdf
Table 6 + Conclusion; BASELINE.md).

Methodology: the fused four-step Pallas kernel (ops/ntt_pallas.py) runs
over the 16-modulus RNS batch of the reference's 32k/16q parameter set,
chained `inner` times inside one jit.  The measurement environment
dispatches through a network relay with O(10 ms) per-dispatch overhead,
so per-transform time is taken as the SLOPE between two inner-counts
(removing the constant dispatch cost), the standard two-point
amortization.  Completion is forced with a scalar fetch (block_until_ready
does not synchronize through the relay).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

BASELINE_NTT_PER_SEC = 1e6 / 39.0  # V100, Table 6


def main() -> None:
    import jax
    import jax.numpy as jnp
    from ntt_cuda_tpu.ops import ntt_pallas
    from ntt_cuda_tpu.params import get_bfv_params

    p = get_bfv_params("32k_16q")  # 16 distinct ~55-bit moduli, n = 2^15
    n, r = p.n, p.r
    ftab = ntt_pallas.tables_for(p)
    rng = np.random.default_rng(0)
    x = np.stack([rng.integers(0, p.q[i], n, dtype=np.uint64) for i in range(r)])
    xj = jnp.asarray(x)
    mod_idx = jnp.asarray(np.arange(r, dtype=np.int32))

    def make_step(inner):
        @jax.jit
        def step(y):
            def body(_, z):
                return ntt_pallas.ntt_forward(z, ftab, mod_idx)
            return jax.lax.fori_loop(0, inner, body, y)
        return step

    def timed(step, reps=3):
        o = step(xj)
        _ = float(jnp.sum(o[0, :2].astype(jnp.float64)))  # sync (relay-safe)
        t0 = time.perf_counter()
        for _ in range(reps):
            o = step(xj)
        _ = float(jnp.sum(o[0, :2].astype(jnp.float64)))
        return (time.perf_counter() - t0) / reps

    i1, i2 = 32, 128
    s1, s2 = make_step(i1), make_step(i2)
    # min over repeats: the relay adds heavy-tailed positive noise
    t1 = min(timed(s1) for _ in range(3))
    t2 = min(timed(s2) for _ in range(3))
    per_ntt = (t2 - t1) / ((i2 - i1) * r)   # slope: seconds per transform
    per_sec = 1.0 / per_ntt
    print(f"[bench] backend={jax.default_backend()} n={n} r={r}: "
          f"inner16={t1*1e3:.1f}ms inner64={t2*1e3:.1f}ms -> "
          f"{per_ntt*1e6:.2f} us/NTT, {per_sec:,.0f} NTT/s "
          f"(dispatch overhead {((t1 - (t2-t1)/3))*1e3:.1f} ms excluded)",
          file=sys.stderr)

    print(json.dumps({
        "metric": "NTT/s/chip @ N=2^15, 55-bit q (fused pallas, 16-modulus batch)",
        "value": round(per_sec, 1),
        "unit": "transforms/sec",
        "vs_baseline": round(per_sec / BASELINE_NTT_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
