"""Component-level timing of the fused kernel: which stage group burns
the time?  Variants run subsets of the transform (incorrect math, pure
perf signal) — this is the measurement that drove the round-2 kernel
redesign (NOTES_NEXT_ROUND.md).

Run on TPU:  python benchmarks/component_bench.py
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ntt_cuda_tpu.ops import limb32, ntt_pallas
    from ntt_cuda_tpu.ops.ntt_pallas import N2
    from ntt_cuda_tpu.params import get_bfv_params
    from ntt_cuda_tpu.utils import profiling

    U32 = jnp.uint32

    def make_kernel(n1, parts):
        def kernel(qc_ref, xl_ref, xh_ref, ta_ref, tc_ref, tb_ref,
                   ol_ref, oh_ref):
            mi = pl.program_id(0)
            q = (qc_ref[mi, 0], qc_ref[mi, 1])
            two_q = (qc_ref[mi, 2], qc_ref[mi, 3])
            four_q = limb32.add64(two_q, two_q)
            x = (xl_ref[0], xh_ref[0])
            lane = jax.lax.broadcasted_iota(U32, (n1, N2), 1)
            row = jax.lax.broadcasted_iota(U32, (n1, N2), 0)
            if "afwd" in parts:
                x = ntt_pallas._stage_a_fwd(x, ta_ref.at[0], q, four_q, n1,
                                            row, False)
            if "ainv" in parts:
                x = ntt_pallas._stage_a_inv(x, ta_ref.at[0], q, four_q, n1,
                                            row, False)
            if "fix" in parts:
                x = ntt_pallas._elementwise_fix(x, tc_ref.at[0], q)
            if "bfwd" in parts:
                x = ntt_pallas._stage_b_fwd(x, tb_ref.at[0], q, four_q,
                                            lane, False)
            if "binv" in parts:
                x = ntt_pallas._stage_b_inv(x, tb_ref.at[0], q, four_q,
                                            lane, False)
            x = ntt_pallas._normalize(x, q, two_q)
            ol_ref[0] = x[0]
            oh_ref[0] = x[1]
        return kernel

    @functools.partial(jax.jit, static_argnames=("parts",))
    def run(x64, tables, parts):
        n, n1 = tables.n, tables.n1
        LA = (n1.bit_length() - 1) * n1   # expanded stage-A rows
        r = tables.qconst.shape[0]
        B = x64.shape[0]
        J = B // r
        xl, xh = limb32.to_pair(x64.reshape(B, n1, N2))
        z = np.int32(0)
        dmap = lambda m, j, qc: (j * np.int32(r) + m, z, z)
        tmap = lambda m, j, qc: (m, z, z, z)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(r, J),
            in_specs=[pl.BlockSpec((1, n1, N2), dmap,
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, n1, N2), dmap,
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 4, LA, N2), tmap,
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 4, n1, N2), tmap,
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 4, 8, N2), tmap,
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((1, n1, N2), dmap,
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, n1, N2), dmap,
                                    memory_space=pltpu.VMEM)],
        )
        ol, oh = pl.pallas_call(
            make_kernel(n1, parts), grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((B, n1, N2), jnp.uint32)] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(tables.qconst, xl, xh, tables.tai, tables.tci, tables.tbi)
        return limb32.from_pair((ol, oh)).reshape(B, n)

    p = get_bfv_params("32k_16q")
    n, r = p.n, p.r
    ftab = ntt_pallas.tables_for(p)
    rng = np.random.default_rng(0)
    xj = jnp.asarray(np.stack(
        [rng.integers(0, p.q[i], n, dtype=np.uint64) for i in range(r)]))

    cases = ["", "ainv", "binv", "fix", "afwd", "bfwd",
             "ainv,fix,binv", "afwd,fix,bfwd"]
    sel = os.environ.get("CASES")
    if sel is not None:
        cases = sel.split(";")
    for parts in cases:
        key = tuple(s for s in parts.split(",") if s)

        def make(key=key):
            @jax.jit
            def step(y, k):
                def body(_, z):
                    return run(z, ftab, key)
                return jax.lax.fori_loop(0, k, body, y)
            return step

        t0 = time.perf_counter()
        per = profiling.time_chained_dynamic(make(), xj, inner_lo=32,
                                             inner_hi=128, reps=3, epochs=3)
        print(f"{parts or '(io only)':>18}: {per/r*1e6:7.2f} us/transform "
              f"(wall {time.perf_counter()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
