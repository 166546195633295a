"""Design-ladder ablation — the TPU analog of the reference's D1-D5 study.

The reference's `old/` tree benchmarks five NTT kernel designs (paper
Table 5: single-kernel, kernel-per-stage, +shared, +warp-shuffle, hybrid).
Our ladder re-climbed with TPU idioms (historical rungs live in
benchmarks/designs.py and stay bit-exact — tests/test_ablation_designs.py):

  X   XLA-lowered stage loop (ops/ntt.py)    ~ D2 (one fused op per stage,
      XLA schedules; all data round-trips between stage HLOs)
  RI  round-1 fused kernel: reshape-interleave fwd stage A, roll+select
      inverse with per-stage halving, exact Shoup [0, 2q)
  CG  Pease constant-geometry stage A — rejected (strided sublane
      interleaves dominate on Mosaic; 1.9-3.8x slower than RI)
  RS  roll+select both directions, no halving (n^-1 in fix tables),
      exact Shoup
  PG  shipped v3, general modulus map        ~ D5 (RS + loose-mulhi
      Shoup [0, 4q); per-poly twiddle gather)
  PT  shipped v3, modulus-major tiled grid   ~ D5 + constant-bank cycling
      (twiddles fetched once per modulus)

Run on TPU:  python benchmarks/ablation.py [--sizes 2048,...,32768]
  [--designs X,RI,CG,RS,PG,PT]
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
    ap.add_argument("--designs", default="X,RI,CG,RS,PG,PT")
    args = ap.parse_args()

    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    import jax.numpy as jnp
    import designs as designs_mod
    from ntt_cuda_tpu.ops import modmath, ntt, ntt_pallas
    from ntt_cuda_tpu.params import get_params
    from ntt_cuda_tpu.utils import profiling

    sizes = [int(s) for s in args.sizes.split(",")]
    sel = args.designs.split(",")
    B = args.batch
    print(f"backend={jax.default_backend()} batch={B}", file=sys.stderr)
    rows = []
    for n in sizes:
        q, psi, _, _, _ = get_params(n)
        tables = ntt.NTTTables.build([q], [psi], n)
        ms = modmath.ModulusSet.from_moduli([q])
        ftab = ntt_pallas.FourStepTables.build([q], [psi], n)
        utab = designs_mod.compact_tables([q], [psi], n,
                                          unscale_tci=True)
        ctab = designs_mod.compact_tables([q], [psi], n,
                                          unscale_tci=False)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, q, (B, n), dtype=np.uint64))
        mi = jnp.zeros(B, jnp.int32)

        def dsn(name, tab):
            return {
                "fwd": lambda c: designs_mod.transform(c, tab, name, False),
                "inv": lambda c: designs_mod.transform(c, tab, name, True),
            }

        designs = {
            "X": {
                "fwd": lambda c: ntt.ntt_forward(c, tables, ms),
                "inv": lambda c: ntt.ntt_inverse(c, tables, ms),
            },
            "RI": dsn("RI", utab),
            "CG": dsn("CG", utab),
            "RS": dsn("RS", ctab),
            "PG": {
                "fwd": lambda c: ntt_pallas._transform(c, mi, ftab, False, False),
                "inv": lambda c: ntt_pallas._transform(c, mi, ftab, True, False),
            },
            "PT": {
                "fwd": lambda c: ntt_pallas._transform_tiled(c, ftab, False, False),
                "inv": lambda c: ntt_pallas._transform_tiled(c, ftab, True, False),
            },
        }
        designs = {k: v for k, v in designs.items() if k in sel}

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
