"""Same-process A/B: fusion="op" vs fusion="stage" BFV per-op latency on
the real TPU (VERDICT round-2 items 1-2).

Usage: python scratch/fused_ab.py [set ...]   (default: 16k_5q 32k_9q)

Methodology: one process, chained fori_loop slopes, min over epochs
(NOTES_NEXT_ROUND.md) — cross-session numbers are NOT comparable.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.setrecursionlimit(20000)  # op-fused jaxprs overflow the 1000 default

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

from ntt_cuda_tpu.models import bfv
from ntt_cuda_tpu.params import get_bfv_params
from ntt_cuda_tpu.utils import profiling


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_ctx(ctx, p, tag):
    n, r = p.n, p.r
    m = jnp.asarray(np.arange(n, dtype=np.uint64) % p.t)
    q0 = jnp.uint64(p.q[0])
    t0 = time.perf_counter()
    sk, pk = ctx.keygen()
    ct = ctx.encrypt(pk, m)

    @jax.jit
    def kg_step(seed, k):
        def body(_, s):
            skk, pkk = ctx.keygen(nonce=s)
            return skk[0, 0] + pkk[0, 0, 0] + pkk[1, 0, 0]
        return jax.lax.fori_loop(0, k, body, seed)

    @jax.jit
    def enc_step(c, k):
        def body(_, cc):
            return ctx.encrypt(pk, m, nonce=cc[0, 0, 0])
        return jax.lax.fori_loop(0, k, body, c)

    @jax.jit
    def dec_step(c, k):
        def body(_, cc):
            out = ctx.decrypt(sk, cc)
            return cc.at[0, 0, 0].set((cc[0, 0, 0] + out[0]) % q0)
        return jax.lax.fori_loop(0, k, body, c)

    hi = max(64, (1 << 24) // (n * r))
    kw = dict(inner_lo=hi // 8, inner_hi=hi, reps=3, epochs=3)
    t_kg = profiling.time_chained_dynamic(kg_step, jnp.uint64(1), **kw)
    t_enc = profiling.time_chained_dynamic(enc_step, ct, **kw)
    t_dec = profiling.time_chained_dynamic(dec_step, ct, **kw)
    log(f"  [{tag}] kg {t_kg*1e6:.1f} enc {t_enc*1e6:.1f} "
        f"dec {t_dec*1e6:.1f} us ({time.perf_counter()-t0:.0f}s w/compile)")
    return t_kg, t_enc, t_dec, sk, pk, ct, m


def main():
    sets = sys.argv[1:] or ["16k_5q", "32k_9q"]
    log(f"backend={jax.default_backend()}")
    for name in sets:
        try:
            run_set(name)
        except Exception as exc:
            import traceback
            tb = traceback.format_exc().splitlines()
            log("\n".join(tb[:15] + ["..."] + tb[-25:]))
            log(f"=== {name} FAILED: {exc!r:.400}")


def run_set(name):
        p = get_bfv_params(name)
        log(f"=== {name} (n={p.n}, r={p.r}) ===")
        ctx_op = bfv.BFVContext.build(p, fusion="op")
        ctx_st = bfv.BFVContext.build(p, fusion="stage")
        r_op = bench_ctx(ctx_op, p, "op")
        r_st = bench_ctx(ctx_st, p, "stage")
        # on-device bit-equality of the two schedules
        sk_o, pk_o = r_op[3], r_op[4]
        sk_s, pk_s = r_st[3], r_st[4]
        assert np.array_equal(np.asarray(sk_o), np.asarray(sk_s))
        assert np.array_equal(np.asarray(pk_o), np.asarray(pk_s))
        ct_o = np.asarray(ctx_op.encrypt(pk_o, r_op[6], nonce=5))
        ct_s = np.asarray(ctx_st.encrypt(pk_s, r_st[6], nonce=5))
        assert np.array_equal(ct_o, ct_s)
        out = np.asarray(ctx_op.decrypt(sk_o, jnp.asarray(ct_o)))
        assert np.array_equal(out, np.asarray(r_op[6]))
        log(f"  bit-equality op==stage + roundtrip: OK")
        from bench import BASELINE_BFV_US
        b = BASELINE_BFV_US[name]
        for i, opn in enumerate(("kg", "enc", "dec")):
            sp = r_st[i] / r_op[i]
            log(f"  {opn}: op {r_op[i]*1e6:.1f} vs stage {r_st[i]*1e6:.1f} "
                f"us ({sp:.2f}x) | vs V100 {b[i]/(r_op[i]*1e6):.2f}x")


if __name__ == "__main__":
    main()
