"""Design-ladder ablation — the TPU analog of the reference's D1-D5 study.

The reference's `old/` tree benchmarks five NTT kernel designs (paper
Table 5: single-kernel, kernel-per-stage, +shared, +warp-shuffle, hybrid).
Our ladder re-climbed with TPU idioms:

  X   XLA-lowered stage loop (ops/ntt.py)    ~ D2 (one fused op per stage,
      XLA schedules; all data round-trips between stage HLOs)
  PG  Pallas fused, general modulus map      ~ D5 (whole transform in one
      kernel, VMEM-resident; per-poly twiddle gather)
  PT  Pallas fused, modulus-major tiled grid ~ D5 + constant-bank cycling
      (twiddles fetched once per modulus)

Run on TPU:  python benchmarks/ablation.py [--sizes 2048,...,32768]
Prints per-(n, design) forward/inverse us-per-transform, JSON lines last.
"""

import argparse
import json
import sys

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2048,4096,8192,16384,32768")
    ap.add_argument("--batch", type=int, default=16,
                    help="polys per measurement (RNS-style batch)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ntt_cuda_tpu.ops import modmath, ntt, ntt_pallas
    from ntt_cuda_tpu.params import get_params
    from ntt_cuda_tpu.utils import profiling

    sizes = [int(s) for s in args.sizes.split(",")]
    B = args.batch
    print(f"backend={jax.default_backend()} batch={B}", file=sys.stderr)
    rows = []
    for n in sizes:
        q, psi, _, _, _ = get_params(n)
        tables = ntt.NTTTables.build([q], [psi], n)
        ms = modmath.ModulusSet.from_moduli([q])
        ftab = ntt_pallas.FourStepTables.build([q], [psi], n)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, q, (B, n), dtype=np.uint64))
        mi = jnp.zeros(B, jnp.int32)

        designs = {
            "X": {
                "fwd": lambda c: ntt.ntt_forward(c, tables, ms),
                "inv": lambda c: ntt.ntt_inverse(c, tables, ms),
            },
            "PG": {
                "fwd": lambda c: ntt_pallas._transform(c, mi, ftab, False, False),
                "inv": lambda c: ntt_pallas._transform(c, mi, ftab, True, False),
            },
            "PT": {
                "fwd": lambda c: ntt_pallas._transform_tiled(c, ftab, False, False),
                "inv": lambda c: ntt_pallas._transform_tiled(c, ftab, True, False),
            },
        }

        def chain(f):
            def make(k):
                @jax.jit
                def step(c):
                    return jax.lax.fori_loop(0, k, lambda _, cc: f(cc), c)
                return step
            return make

        hi = max(32, (1 << 23) // n)
        for name, fns in designs.items():
            row = {"n": n, "design": name}
            for d, f in fns.items():
                t = min(profiling.time_chained(chain(f), x, hi // 4, hi)
                        for _ in range(2))
                row[d + "_us"] = round(t * 1e6 / B, 2)
            rows.append(row)
            print(f"n={n:6d} {name:2s}: fwd {row['fwd_us']:8.2f} us/t  "
                  f"inv {row['inv_us']:8.2f} us/t", file=sys.stderr)
    for row in rows:
        print(json.dumps(row))


if __name__ == "__main__":
    main()
