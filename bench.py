"""Benchmark: NTT throughput per chip at N=2^15, 60-bit modulus family.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Baseline: the reference's Tesla V100 forward-NTT latency at N=2^15,
55-bit modulus — 39 us/transform => 25,641 NTT/s/device (Article.pdf
Table 6 + Conclusion; BASELINE.md).  We report throughput over a batch of
16 independent transforms per dispatch (the reference's own
forwardNTT_batch shape for the 16-modulus RNS set), iterated inside one
jit so tunnel dispatch latency doesn't pollute the measurement.
"""

import json
import sys
import time

import numpy as np

BASELINE_NTT_PER_SEC = 1e6 / 39.0  # V100, Table 6


def main() -> None:
    import jax
    import jax.numpy as jnp
    from ntt_cuda_tpu.ops import modmath, ntt
    from ntt_cuda_tpu.params import get_params, get_bfv_params

    n = 32768
    batch = 16
    inner = 8   # chained transforms per jit call
    reps = 5

    p = get_bfv_params("32k_16q")  # 16 distinct 55-bit moduli
    tables = ntt.tables_for(p)
    ms = modmath.modulus_set(p)
    rng = np.random.default_rng(0)
    x0 = np.stack([rng.integers(0, p.q[i], n, dtype=np.uint64) for i in range(batch)])

    @jax.jit
    def step(x):
        def body(_, y):
            return ntt.ntt_forward(y, tables, ms)
        return jax.lax.fori_loop(0, inner, body, x)

    x = jnp.asarray(x0)
    out = step(x)
    out.block_until_ready()  # compile

    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(x)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    ntts = batch * inner
    per_sec = ntts / dt
    per_us = dt / ntts * 1e6
    print(f"[bench] backend={jax.default_backend()} n={n} batch={batch} "
          f"inner={inner}: {per_us:.2f} us/NTT, {per_sec:,.0f} NTT/s",
          file=sys.stderr)

    print(json.dumps({
        "metric": "NTT/s/chip @ N=2^15, 55-bit q (batch=16)",
        "value": round(per_sec, 1),
        "unit": "transforms/sec",
        "vs_baseline": round(per_sec / BASELINE_NTT_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
