"""Benchmark: the reference's headline metrics on one TPU chip.

Prints ONE COMPACT JSON line (the FINAL stdout line — the driver's tail
capture must never truncate its head, which is what nulled round 2's
BENCH_r02.json):
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...,
   "intt_us": ..., "intt_vs_baseline": ...}

value / vs_baseline carry the headline forward-NTT throughput (N=2^15,
55-bit family, Article.pdf Table 6: 39 us on V100 => 25,641 NTT/s).
Every other published anchor — inverse NTT (Table 6: 23 us), the full
Table 6 sweeps (55-bit + 30-bit families), and BFV keygen / encrypt /
decrypt per-op latency for all five Table 7 parameter sets
(BASELINE.md:37-45), each with its own vs_baseline (>1 = faster than the
V100 number) — is written ONLY to bench_detail.json.

Methodology (NOTES_NEXT_ROUND.md): the measurement environment dispatches
through a network relay with O(10 ms) per-dispatch overhead and
heavy-tailed jitter, so per-op time is the SLOPE between two chained
iteration counts inside one jit (lax.fori_loop with a *dynamic* trip
count — one compile per op), min over epochs, every output consumed (XLA
DCE silently drops dead pipelines).  Set BENCH_SETS=32k_9q (comma list)
to restrict the BFV sweep, BENCH_NTT_ONLY=1 to skip it.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

BASELINE_NTT_US = 39.0      # V100, Table 6, n=2^15, 55-bit
BASELINE_INTT_US = 23.0     # V100, Table 6
BASELINE_NTT30_US = 27.7    # V100, Table 6, n=2^15, 30-bit family
BASELINE_INTT30_US = 18.3
# V100 Table 6, 55-bit family, (ntt_us, intt_us) per size
BASELINE_TABLE6_US = {
    2048: (12.5, 12.5), 4096: (22.5, 15.5), 8192: (27.0, 18.0),
    16384: (29.0, 21.0), 32768: (39.0, 23.0),
}
# V100 Table 6, 30-bit family (the only family published at n=65536)
BASELINE_TABLE6_30_US = {
    2048: (7.0, 7.5), 4096: (11.5, 13.0), 8192: (22.5, 14.5),
    16384: (25.5, 16.3), 32768: (27.7, 18.3), 65536: (39.0, 20.7),
}
# V100 Table 7 (us): keygen, encrypt, decrypt per parameter set
BASELINE_BFV_US = {
    "4k_3q": (123.86, 85.82, 79.46),
    "8k_4q": (135.81, 99.93, 87.46),
    "16k_5q": (176.64, 119.26, 104.13),
    "32k_9q": (273.73, 276.10, 160.05),
    "32k_16q": (427.81, 514.73, 246.48),
}
# MEASURED single-v5e VPU speed-of-light floors (us): (keygen, encrypt,
# decrypt) = transform count x measured zero-IO per-transform floor
# (benchmarks/floor_probe.py, round 5: 13.81 us at n=2^15, 5.72 at
# 2^14 — dependent-chain butterfly-mix kernels on VMEM-resident tiles,
# no table/HBM traffic) + measured draw/tail allowance.  At 16k the
# floor sits BELOW the V100 on all three ops; at 32k even
# speed-of-light cannot beat the V100 single-chip (the framework's
# answer is the rns mesh axis — README roofline section).
ROOFLINE_FLOOR_US = {
    "16k_5q": (98.0, 101.0, 56.0),
    "32k_9q": (413.0, 408.0, 236.0),
    "32k_16q": (733.0, 708.0, 434.0),
}
# Measured per-transform floor at n=2^15 behind ROOFLINE_FLOOR_US.  The
# drift guard scales the floors by the SAME-RUN NTT slope over this to
# get a chip-epoch-corrected expectation.
NOMINAL_FLOOR_NTT_US = 13.81
# Re-measure any Table-7 op slower than this multiple of its
# NTT-slope-scaled floor before publishing (BENCH_r04 published 32k
# keygen/encrypt 2.7x off the same-run NTT-implied expectation — one
# relay-drift epoch, never re-measured).  Healthy ops run <= ~1.35x
# this expectation (2.03x raw floor at nominal NTT speed).
DRIFT_GUARD_X = float(os.environ.get("BENCH_DRIFT_GUARD_X", "1.8"))


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


_T0 = time.time()
# soft wall-clock budget: cold first compiles through the TPU tunnel run
# 20-170 s per shape, and the full sweep has ~30 of them — never let the
# harness die without printing the headline JSON line.  2400 s leaves
# ~500 s of compile headroom under the hard deadline for a section
# already in flight (the round-3 artifact died because a 32k compile
# sweep in progress could not be cut by the *future*-section-only check).
DEADLINE_SEC = float(os.environ.get("BENCH_DEADLINE_SEC", "2400"))


def _over_budget(reserve_sec: float = 0.0) -> bool:
    """True once the soft budget (minus a reservation for the section's
    own expected compile cost) is spent."""
    return time.time() - _T0 > DEADLINE_SEC - reserve_sec


def bench_transforms():
    """Forward + inverse NTT us/transform over the 16-modulus RNS batch of
    the 32k/16q set (the reference's largest constant-bank configuration),
    via the fused Pallas kernels."""
    import jax
    import jax.numpy as jnp
    from ntt_cuda_tpu.ops import ntt_pallas
    from ntt_cuda_tpu.params import get_bfv_params
    from ntt_cuda_tpu.utils import profiling

    p = get_bfv_params("32k_16q")
    n, r = p.n, p.r
    ftab = ntt_pallas.tables_for(p)
    rng = np.random.default_rng(0)
    x = np.stack([rng.integers(0, p.q[i], n, dtype=np.uint64)
                  for i in range(r)])
    xj = jnp.asarray(x)

    def make(inverse):
        @jax.jit
        def step(y, k):
            def body(_, z):
                if inverse:
                    return ntt_pallas.ntt_inverse(z, ftab)
                return ntt_pallas.ntt_forward(z, ftab)
            return jax.lax.fori_loop(0, k, body, y)
        return step

    out = {}
    for name, inverse in (("ntt", False), ("intt", True)):
        t0 = time.perf_counter()
        step = make(inverse)
        # three independent epochs recorded individually (the shared
        # chip's throughput drifts between epochs; the JSON carries the
        # spread, the headline uses the min — the relay's noise is
        # additive-positive)
        epochs = sorted(
            profiling.time_chained_dynamic(step, xj, inner_lo=32,
                                           inner_hi=128, reps=3, epochs=1)
            / r * 1e6
            for _ in range(3))
        us = epochs[0]
        _log(f"[bench] {name}: {us:.2f} us/transform "
             f"(epochs {['%.1f' % e for e in epochs]}, "
             f"measured in {time.perf_counter()-t0:.0f}s)")
        out[name] = us
        out[name + "_epochs"] = [round(e, 2) for e in epochs]
    return out


def bench_table6():
    """Forward/inverse us per size across the 55-bit family (Table 6)."""
    import jax
    import jax.numpy as jnp
    from ntt_cuda_tpu.ops import ntt_pallas
    from ntt_cuda_tpu.params import get_params
    from ntt_cuda_tpu.utils import profiling

    out = {}
    rng = np.random.default_rng(0)
    for n, (b_f, b_i) in BASELINE_TABLE6_US.items():
        if n == 32768:
            continue   # covered by the headline 16-modulus measurement
        if _over_budget():
            _log(f"[bench] over time budget, skipping table6 n={n}")
            continue
        q, psi, _, _, _ = get_params(n)
        ftab = ntt_pallas.FourStepTables.build([q], [psi], n)
        B = 16
        xj = jnp.asarray(rng.integers(0, q, (B, n), dtype=np.uint64))

        def make(inverse):
            @jax.jit
            def step(y, k):
                def body(_, z):
                    if inverse:
                        return ntt_pallas.ntt_inverse(z, ftab)
                    return ntt_pallas.ntt_forward(z, ftab)
                return jax.lax.fori_loop(0, k, body, y)
            return step

        hi = max(128, (1 << 22) // n)
        row = {}
        for name, inverse, base in (("ntt", False, b_f), ("intt", True, b_i)):
            per = profiling.time_chained_dynamic(
                make(inverse), xj, inner_lo=hi // 4, inner_hi=hi,
                reps=3, epochs=3)
            us = per / B * 1e6
            if us > 0:
                row[f"{name}_us"] = round(us, 2)
                row[f"{name}_vs_baseline"] = round(base / us, 3)
        out[str(n)] = row
        _log(f"[bench] table6 n={n}: {row}")
    return out


def _bench_one_30bit(n: int):
    """(ntt_us, intt_us) for the 30-bit family at size n (single-limb
    kernel, 16-poly batch)."""
    import jax
    import jax.numpy as jnp
    from ntt_cuda_tpu.ops import ntt_pallas30
    from ntt_cuda_tpu.params import get_params
    from ntt_cuda_tpu.utils import profiling

    q, psi, _, _, _ = get_params(n, family="30bit")
    t30 = ntt_pallas30.FourStepTables30.build([q], [psi], n)
    rng = np.random.default_rng(0)
    B = 16
    xj = jnp.asarray(rng.integers(0, q, (B, n), dtype=np.uint64)
                     .astype(np.uint32))

    def make(inverse):
        @jax.jit
        def step(y, k):
            def body(_, z):
                if inverse:
                    return ntt_pallas30.ntt_inverse(z, t30)
                return ntt_pallas30.ntt_forward(z, t30)
            return jax.lax.fori_loop(0, k, body, y)
        return step

    out = []
    for inverse in (False, True):
        # long chains: at a few us/transform the slope must dwarf jitter
        hi = max(256, (1 << 23) // n)
        per = profiling.time_chained_dynamic(
            make(inverse), xj, inner_lo=hi // 8, inner_hi=hi,
            reps=3, epochs=3)
        out.append(per / B * 1e6)
    return out


def bench_transforms30():
    """30-bit family headline at n=2^15."""
    ntt_us, intt_us = _bench_one_30bit(32768)
    _log(f"[bench] ntt30: {ntt_us:.2f} us/transform")
    _log(f"[bench] intt30: {intt_us:.2f} us/transform")
    return {"ntt30": ntt_us, "intt30": intt_us}


def bench_table6_30bit():
    """The rest of the 30-bit Table 6 column, incl. n=65536."""
    out = {}
    for n, (b_f, b_i) in BASELINE_TABLE6_30_US.items():
        if n == 32768:
            continue
        if _over_budget():
            _log(f"[bench] over time budget, skipping 30-bit n={n}")
            continue
        f_us, i_us = _bench_one_30bit(n)
        row = {}
        if f_us > 0:
            row["ntt_us"] = round(f_us, 2)
            row["ntt_vs_baseline"] = round(b_f / f_us, 3)
        if i_us > 0:
            row["intt_us"] = round(i_us, 2)
            row["intt_vs_baseline"] = round(b_i / i_us, 3)
        out[str(n)] = row
        _log(f"[bench] table6-30bit n={n}: {row}")
    return out


def bench_bfv(set_names):
    """Table 7 per-op latency: keygen / encrypt / decrypt us for each
    parameter set, chained-slope methodology (nonce / data threading
    defeats loop-invariant hoisting; all outputs consumed)."""
    import jax
    import jax.numpy as jnp
    from ntt_cuda_tpu.models import bfv
    from ntt_cuda_tpu.params import get_bfv_params
    from ntt_cuda_tpu.utils import profiling

    results = {}
    for name in set_names:
        # reserve the section's own worst-case compile sweep: a 32k set
        # admitted at the budget edge would blow through the hard
        # deadline mid-compile (the round-3 artifact killer)
        if _over_budget(reserve_sec=500.0 if name.startswith("32k") else 120.0):
            _log(f"[bench] over time budget, skipping {name}")
            continue
        try:
            results[name] = _bench_bfv_one(bfv, get_bfv_params, profiling,
                                           jax, jnp, name)
        except Exception as exc:   # never let one set kill the artifact
            _log(f"[bench] {name}: failed ({exc!r:.300}); skipping set")
    return results


def _bench_bfv_one(bfv, get_bfv_params, profiling, jax, jnp, name):
    p = get_bfv_params(name)
    n, r = p.n, p.r
    m = jnp.asarray(np.arange(n, dtype=np.uint64) % p.t)
    q0 = jnp.uint64(p.q[0])
    t0 = time.perf_counter()
    try:
        ctx = bfv.BFVContext.build(p)
        sk, pk = ctx.keygen()
        ct = ctx.encrypt(pk, m)
        jax.block_until_ready(ctx.decrypt(sk, ct))  # probe ALL op kernels
    except Exception as exc:   # op-schedule compile failure: fall back
        _log(f"[bench] {name}: op schedule failed ({exc!r:.200}); "
             "falling back to fusion='stage'")
        ctx = bfv.BFVContext.build(p, fusion="stage")
        sk, pk = ctx.keygen()
        ct = ctx.encrypt(pk, m)
        jax.block_until_ready(ct)

    # thread the table bundles as runtime buffers (op_programs): a 32k
    # module with inlined tables costs minutes of remote-compile upload
    # through the relay
    kg_fn, enc_fn, dec_fn, _, _, bz = ctx.op_programs()

    @jax.jit
    def kg_step(seed, k, pkx, mx, bzz):
        def body(_, s):
            skk, pkk = kg_fn(s, bzz)
            # consume sk AND pk: XLA DCEs 2 of keygen's 3 NTT batches
            # otherwise
            return skk[0, 0] + pkk[0, 0, 0] + pkk[1, 0, 0]
        return jax.lax.fori_loop(0, k, body, seed)

    @jax.jit
    def enc_step(c, k, pkx, mx, bzz):
        def body(_, cc):
            return enc_fn(cc[0, 0, 0], pkx, mx, bzz)
        return jax.lax.fori_loop(0, k, body, c)

    @jax.jit
    def dec_step(c, k, skx, mx, bzz):
        def body(_, cc):
            out = dec_fn(skx, cc, bzz)
            return cc.at[0, 0, 0].set((cc[0, 0, 0] + out[0]) % q0)
        return jax.lax.fori_loop(0, k, body, c)

    hi = max(64, (1 << 24) // (n * r))
    lo = hi // 8
    kw = dict(inner_lo=lo, inner_hi=hi, reps=3, epochs=3)
    fl = ROOFLINE_FLOOR_US.get(name)
    remeasured = []

    def measure(label, idx, thunk):
        """One op measurement, defended against relay drift: if the
        result exceeds DRIFT_GUARD_X times the same-run-NTT-scaled
        floor, re-measure once and take the min (the relay's noise is
        additive-positive, so min is the honest statistic)."""
        t = thunk()
        ntt_us = _HEADLINE_STATE.get("ntt_slope_us")
        if fl is not None and ntt_us and t > 0:
            expected = fl[idx] * max(1.0, ntt_us / NOMINAL_FLOOR_NTT_US)
            if t * 1e6 > DRIFT_GUARD_X * expected:
                _log(f"[bench] {name} {label}: {t*1e6:.1f} us is "
                     f">{DRIFT_GUARD_X}x the NTT-implied {expected:.0f} "
                     f"us — re-measuring (drift guard)")
                t = min(t, thunk())
                remeasured.append(label)
        return t

    t_kg = measure("keygen", 0, lambda: profiling.time_chained_dynamic(
        kg_step, jnp.uint64(1), pk, m, bz, **kw))
    t_enc = measure("encrypt", 1, lambda: profiling.time_chained_dynamic(
        enc_step, ct, pk, m, bz, **kw))
    t_dec = measure("decrypt", 2, lambda: profiling.time_chained_dynamic(
        dec_step, ct, sk, m, bz, **kw))
    b_kg, b_enc, b_dec = BASELINE_BFV_US[name]
    if min(t_kg, t_enc, t_dec) <= 0:
        raise RuntimeError("degenerate slope")
    row = {
        "fusion": ctx.fusion,
        "keygen_us": round(t_kg * 1e6, 2),
        "encrypt_us": round(t_enc * 1e6, 2),
        "decrypt_us": round(t_dec * 1e6, 2),
        "keygen_vs_baseline": round(b_kg / (t_kg * 1e6), 3),
        "encrypt_vs_baseline": round(b_enc / (t_enc * 1e6), 3),
        "decrypt_vs_baseline": round(b_dec / (t_dec * 1e6), 3),
    }
    if name in ROOFLINE_FLOOR_US:
        # arithmetic-derived single-chip floors (README "Why the 32k
        # gap is architectural"): measured/floor <= ~1.2 supports the
        # architectural claim; the batched ops/s sections carry the
        # throughput-parity story
        fl = ROOFLINE_FLOOR_US[name]
        row["roofline_floor_us"] = fl
        row["keygen_vs_floor"] = round(t_kg * 1e6 / fl[0], 2)
        row["encrypt_vs_floor"] = round(t_enc * 1e6 / fl[1], 2)
        row["decrypt_vs_floor"] = round(t_dec * 1e6 / fl[2], 2)
    if remeasured:
        row["drift_remeasured"] = remeasured
    _log(f"[bench] {name}: kg {t_kg*1e6:.1f} enc {t_enc*1e6:.1f} "
         f"dec {t_dec*1e6:.1f} us "
         f"({time.perf_counter()-t0:.0f}s incl. compiles)")
    return row


def bench_bfv_batched(set_names, J=16):
    """Throughput mode: J messages per kernel sweep via encrypt_batch /
    decrypt_batch (one modulus-major grid, twiddles fetched once per
    modulus for all J messages).  The V100's Table 7 latencies are
    themselves 18-36-transform batches (BASELINE.md:14-15), so ops/s
    here vs 1e6/latency there is the apples-to-apples economics."""
    import jax
    import jax.numpy as jnp
    from ntt_cuda_tpu.models import bfv
    from ntt_cuda_tpu.params import get_bfv_params
    from ntt_cuda_tpu.utils import profiling

    results = {}
    for name in set_names:
        if _over_budget(reserve_sec=300.0 if name.startswith("32k")
                        else 120.0):
            _log(f"[bench] over time budget, skipping batched {name}")
            continue
        try:
            results[name] = _bench_bfv_batched_one(
                bfv, get_bfv_params, profiling, jax, jnp, name, J)
        except Exception as exc:
            _log(f"[bench] batched {name}: failed ({exc!r:.300}); "
                 "skipping set")
    return results


def _bench_bfv_batched_one(bfv, get_bfv_params, profiling, jax, jnp,
                           name, J):
    p = get_bfv_params(name)
    n, r = p.n, p.r
    t0 = time.perf_counter()
    m_batch = jnp.asarray(
        np.arange(J * n, dtype=np.uint64).reshape(J, n) % p.t)
    nonces0 = jnp.arange(1, J + 1, dtype=jnp.uint64)
    q0 = jnp.uint64(p.q[0])
    try:
        ctx = bfv.BFVContext.build(p)
        sk, pk = ctx.keygen()
        cts = ctx.encrypt_batch(pk, m_batch, nonces0)
        jax.block_until_ready(ctx.decrypt_batch(sk, cts))
    except Exception as exc:
        _log(f"[bench] batched {name}: op schedule failed "
             f"({exc!r:.200}); falling back to fusion='stage'")
        ctx = bfv.BFVContext.build(p, fusion="stage")
        sk, pk = ctx.keygen()
        cts = ctx.encrypt_batch(pk, m_batch, nonces0)

    _, _, _, enc_batch_fn, dec_batch_fn, bz = ctx.op_programs()

    @jax.jit
    def enc_step(c, k, pkx, mb, bzz):
        def body(_, cc):
            return enc_batch_fn(nonces0 + cc[0, 0, 0, 0], pkx, mb, bzz)
        return jax.lax.fori_loop(0, k, body, c)

    @jax.jit
    def dec_step(c, k, skx, mb, bzz):
        def body(_, cc):
            out = dec_batch_fn(skx, cc, bzz)
            return cc.at[0, 0, 0, 0].set((cc[0, 0, 0, 0] + out[0, 0])
                                         % q0)
        return jax.lax.fori_loop(0, k, body, c)

    hi = max(16, (1 << 24) // (n * r * J))
    kw = dict(inner_lo=max(2, hi // 8), inner_hi=hi, reps=3, epochs=3)
    t_enc = profiling.time_chained_dynamic(enc_step, cts, pk, m_batch, bz,
                                           **kw)
    t_dec = profiling.time_chained_dynamic(dec_step, cts, sk, m_batch, bz,
                                           **kw)
    if min(t_enc, t_dec) <= 0:
        raise RuntimeError("degenerate slope")
    _, b_enc, b_dec = BASELINE_BFV_US[name]
    enc_ops = J / t_enc
    dec_ops = J / t_dec
    row = {
        "J": J,
        "encrypt_us_per_msg": round(t_enc / J * 1e6, 2),
        "decrypt_us_per_msg": round(t_dec / J * 1e6, 2),
        "encrypt_ops_per_s": round(enc_ops, 1),
        "decrypt_ops_per_s": round(dec_ops, 1),
        "encrypt_vs_baseline": round(enc_ops / (1e6 / b_enc), 3),
        "decrypt_vs_baseline": round(dec_ops / (1e6 / b_dec), 3),
    }
    _log(f"[bench] batched {name}: enc {enc_ops:.0f} dec {dec_ops:.0f} "
         f"ops/s ({time.perf_counter()-t0:.0f}s incl. compiles)")
    return row


def bench_bfv_mult(set_names):
    """EvalMult / EvalSquare latency (BEHZ pipeline + relinearization).
    No reference baseline exists (the CUDA repo stops at encrypt/decrypt),
    so raw us only; the chained loop feeds each product back in as the
    next multiplicand (all outputs consumed)."""
    import jax
    import jax.numpy as jnp
    from ntt_cuda_tpu.models import bfv
    from ntt_cuda_tpu.params import get_bfv_params
    from ntt_cuda_tpu.utils import profiling

    results = {}
    for name in set_names:
        if _over_budget(reserve_sec=400.0 if name.startswith("32k")
                        else 150.0):
            _log(f"[bench] over time budget, skipping mult {name}")
            continue
        try:
            results[name] = _bench_bfv_mult_one(
                bfv, get_bfv_params, profiling, jax, jnp, name)
        except Exception as exc:
            _log(f"[bench] mult {name}: failed ({exc!r:.300}); "
                 "skipping set")
    return results


def _bench_bfv_mult_one(bfv, get_bfv_params, profiling, jax, jnp, name):
    p = get_bfv_params(name)
    n, r = p.n, p.r
    t0 = time.perf_counter()
    m = jnp.asarray(np.arange(n, dtype=np.uint64) % p.t)
    ctx = bfv.BFVContext.build(p)
    sk, pk = ctx.keygen()
    rlk = ctx.relin_keygen(sk)
    ct1 = ctx.encrypt(pk, m, nonce=1)
    ct2 = ctx.encrypt(pk, m, nonce=2)
    jax.block_until_ready(ctx.mul(ct1, ct2, rlk=rlk))  # probe kernels

    # thread the table bundles as runtime buffers: baked-in 32k q+Bsk
    # tables blow the relay's remote-compile upload limit (HTTP 413)
    mul_fn, sq_fn, bundles = ctx.mult_program()

    # ct2 / gk ride as runtime buffers, NOT closure constants: a (2, r-1,
    # n) literal at 32k inflates each module by ~4.7 MB of constants,
    # which the relay re-uploads per compile/load — the mult section
    # measured ~900 s wall with them inlined even against a warm
    # compile cache
    @jax.jit
    def mul_step(c, k, ct2x, rl, bz):
        def body(_, cc):
            return mul_fn(cc, ct2x, rl, bz)
        return jax.lax.fori_loop(0, k, body, c)

    @jax.jit
    def sq_step(c, k, rl, bz):
        def body(_, cc):
            return sq_fn(cc, rl, bz)
        return jax.lax.fori_loop(0, k, body, c)

    J = int(os.environ.get("BENCH_MULT_J", "4"))
    ct1b = jnp.broadcast_to(ct1, (J,) + ct1.shape)
    ct2b = jnp.broadcast_to(ct2, (J,) + ct2.shape)

    @jax.jit
    def mul_batch_step(c, k, ct2bx, rl, bz):
        def body(_, cc):
            return mul_fn(cc, ct2bx, rl, bz)
        return jax.lax.fori_loop(0, k, body, c)

    # Galois rotation (rotate_rows by 1): the batching workload's hot op
    from ntt_cuda_tpu.models import encoder as encoder_mod
    from ntt_cuda_tpu.ops import poly as poly_mod
    g = encoder_mod.rotation_element(n, 1)
    gk = ctx.galois_keygen(sk, [g], nonce=9)[g]
    perm, neg = poly_mod.galois_maps(n, g)
    perm_j = jnp.asarray(perm)
    neg_j = jnp.asarray(neg)

    @jax.jit
    def rot_step(c, k, gkk, bz):
        def body(_, cc):
            return bfv._apply_galois_jit(
                cc, perm_j, neg_j, gkk, bz["msf"], bz["msd"], bz["msl"],
                bz["tf"], bz["ff"], bz["dr"], bz["tc"], bz["nub"],
                ctx.backend, ctx.fusion)
        return jax.lax.fori_loop(0, k, body, c)

    hi = max(16, (1 << 22) // (n * r))
    kw = dict(inner_lo=max(2, hi // 8), inner_hi=hi, reps=3, epochs=3)
    t_mul = profiling.time_chained_dynamic(mul_step, ct1, ct2, rlk,
                                           bundles, **kw)
    t_sq = profiling.time_chained_dynamic(sq_step, ct1, rlk, bundles,
                                          **kw)
    t_rot = profiling.time_chained_dynamic(rot_step, ct1, gk, bundles,
                                           **kw)
    hij = max(4, hi // J)
    t_mb = profiling.time_chained_dynamic(
        mul_batch_step, ct1b, ct2b, rlk, bundles,
        inner_lo=max(2, hij // 8), inner_hi=hij, reps=3, epochs=3)
    if min(t_mul, t_sq, t_rot, t_mb) <= 0:
        raise RuntimeError("degenerate slope")
    row = {
        "fusion": ctx.fusion,
        "mul_relin_us": round(t_mul * 1e6, 2),
        "square_relin_us": round(t_sq * 1e6, 2),
        "rotate_us": round(t_rot * 1e6, 2),
        "J": J,
        "mul_relin_us_per_msg_batched": round(t_mb / J * 1e6, 2),
        "mul_relin_ops_per_s_batched": round(J / t_mb, 1),
    }
    _log(f"[bench] mult {name}: mul {t_mul*1e6:.1f} sq {t_sq*1e6:.1f} "
         f"rot {t_rot*1e6:.1f} batched {t_mb/J*1e6:.1f} us/msg "
         f"({time.perf_counter()-t0:.0f}s incl. compiles)")
    return row


def bench_floor_probe():
    """Measured zero-IO VPU floor for the butterfly mix at n=2^15
    (benchmarks/floor_probe.py): dependent-chain Pallas kernels on
    VMEM-resident tiles, no table/HBM traffic.  The ROOFLINE_FLOOR_US
    table is derived from these; recording them per run keeps the
    floors honest against chip-epoch drift."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "floor_probe", os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "benchmarks", "floor_probe.py"))
    fp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fp)
    n = 32768
    n1 = n // 128
    from ntt_cuda_tpu.params import get_params
    q, psi, _, _, _ = get_params(n)
    out = {}
    # two probe rounds per kind, min per component: a single round's two
    # epochs can both land in a slow relay window (observed: mul 4.75 us
    # vs its true ~1.2 — which pushed the "floor" ABOVE the same-run
    # measured NTT, an impossibility)
    for kind in ("mul", "stageA", "stageB"):
        v = fp.probe(kind, n1, q, psi, epochs=2)
        if not _over_budget(reserve_sec=60.0):
            v = min(v, fp.probe(kind, n1, q, psi, epochs=2))
        out[kind + "_us"] = round(v * 1e6, 4)
    out["floor_us_per_transform"] = round(
        8 * out["stageA_us"] + 7 * out["stageB_us"] + out["mul_us"], 3)
    ntt_us = _HEADLINE_STATE.get("ntt_slope_us")
    if ntt_us and out["floor_us_per_transform"] > ntt_us:
        out["note"] = ("floor probe exceeded the same-run measured NTT "
                       "— a drifted probe window; see "
                       "benchmarks/floor_probe.py for the settled "
                       "cross-session value (~13.8 us)")
    _log(f"[bench] floor_probe 2^15: {out}")
    return out


def _arm_backend_watchdog() -> "threading.Event":
    """The relay-backed TPU backend can hang at init (observed: a
    jax.devices() that never returns).  If the first backend touch hasn't
    completed within BENCH_INIT_TIMEOUT_SEC (default 600), print a
    parseable error headline so the driver artifact is never empty, then
    hard-exit (the init hang is not recoverable in-process)."""
    import threading

    ok = threading.Event()

    def watchdog():
        limit = float(os.environ.get("BENCH_INIT_TIMEOUT_SEC", "600"))
        if not ok.wait(limit):
            print(json.dumps({
                "metric": "NTT/s/chip @ N=2^15, 55-bit q (fused pallas, "
                          "16-modulus batch)",
                "value": None, "unit": "transforms/sec",
                "vs_baseline": None,
                "error": f"TPU backend init hung > {limit:.0f}s "
                         "(relay tunnel unresponsive)",
            }), flush=True)
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()
    return ok


_HEADLINE_STATE: dict = {}


def _arm_hard_deadline() -> None:
    """Second safety net: if the whole run exceeds BENCH_HARD_DEADLINE_SEC
    (default 5400 — covers a worst-case compile sweep through the relay),
    print the best-so-far headline (the NTT section completes first) or an
    error record, flush bench_detail.json, and exit.  A hang inside one
    blocked device call would otherwise leave the driver with NO final
    stdout line."""
    import threading

    def watchdog():
        # Default BELOW the driver's observed ~3600 s external kill (the
        # round-3 run died rc=124 with the 5400 s default armed — a
        # safety net that fires after death catches nothing).
        limit = float(os.environ.get("BENCH_HARD_DEADLINE_SEC", "2950"))
        time.sleep(max(0.0, _T0 + limit - time.time()))
        h = _HEADLINE_STATE.get("headline")
        if h is None:
            h = {"metric": "NTT/s/chip @ N=2^15, 55-bit q (fused pallas, "
                           "16-modulus batch)",
                 "value": None, "unit": "transforms/sec",
                 "vs_baseline": None,
                 "error": f"bench exceeded hard deadline {limit:.0f}s "
                          "before the NTT section completed"}
        else:
            h = dict(h)
            h["error"] = (f"bench exceeded hard deadline {limit:.0f}s; "
                          "later sections truncated")
        print(json.dumps(h), flush=True)
        os._exit(4)

    threading.Thread(target=watchdog, daemon=True).start()


def _flush_artifact():
    """Write bench_detail.json AND print the best-so-far headline line to
    stdout.  Called after EVERY section: an external kill mid-section
    leaves the last complete headline as the final stdout JSON line, so
    the driver artifact can never be parsed=null again (round-3 failure
    mode: the only print lived in a finally the external SIGKILL never
    reached)."""
    h = _HEADLINE_STATE.get("headline")
    d = _HEADLINE_STATE.get("detail")
    if h is None:
        return
    record = dict(h)
    record["detail"] = d if d is not None else {}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_detail.json"), "w") as f:
            json.dump(record, f, indent=1)
    except Exception as exc:
        _log(f"[bench] could not write bench_detail.json: {exc!r}")
    print(json.dumps(h), flush=True)


def _section(label, detail, key, fn, *a):
    """Run one bench section; a failure (e.g. a Mosaic compile error on one
    kernel family) must never kill the artifact — log, record, continue.
    Every section exit (success or failure) re-emits the artifact."""
    try:
        out = fn(*a)
        if key is not None:
            if key in detail and isinstance(detail[key], dict) \
                    and isinstance(out, dict):
                detail[key].update(out)   # merged multi-call sections
            else:
                detail[key] = out
        return out
    except Exception as exc:
        _log(f"[bench] section {label} failed: {exc!r:.300}")
        detail.setdefault("sections_failed", []).append(label)
        return None
    finally:
        _flush_artifact()


def main() -> None:
    init_ok = _arm_backend_watchdog()
    _arm_hard_deadline()

    # ONE headline dict, shared with the hard-deadline watchdog and
    # mutated in place as sections land — the watchdog can never print a
    # record that drifted from the final one.  Created BEFORE the first
    # backend touch: a fast-raising backend init (tunnel down) must still
    # reach the finally-printed headline.
    headline = {
        "metric": "NTT/s/chip @ N=2^15, 55-bit q (fused pallas, "
                  "16-modulus batch)",
        "value": None,
        "unit": "transforms/sec",
        "vs_baseline": None,
    }
    _HEADLINE_STATE["headline"] = headline
    detail = {}
    _HEADLINE_STATE["detail"] = detail
    try:
        try:
            import jax
            _log(f"[bench] backend={jax.default_backend()}")
        except Exception as exc:
            headline["error"] = f"backend init failed: {exc!r:.300}"
            return
        finally:
            init_ok.set()
        tf = _section("transforms", detail, None, bench_transforms)
        if tf and tf["ntt"] > 0 and tf["intt"] > 0:
            # same-run chip-speed anchor for the Table-7 drift guard
            _HEADLINE_STATE["ntt_slope_us"] = tf["ntt"]
            headline.update({
                "value": round(1e6 / tf["ntt"], 1),
                "vs_baseline": round(BASELINE_NTT_US / tf["ntt"], 3),
                "ntt_us": round(tf["ntt"], 2),
                "intt_us": round(tf["intt"], 2),
                "intt_vs_baseline": round(BASELINE_INTT_US / tf["intt"], 3),
            })
            detail.update({
                "ntt_us": round(tf["ntt"], 2),
                "ntt_vs_baseline": round(BASELINE_NTT_US / tf["ntt"], 3),
                "ntt_epochs_us": tf["ntt_epochs"],
                "intt_us": round(tf["intt"], 2),
                "intt_vs_baseline": round(BASELINE_INTT_US / tf["intt"], 3),
                "intt_epochs_us": tf["intt_epochs"],
            })
        # Section order is priority order under the kill window: the
        # never-yet-captured numbers run FIRST after the headline
        # (round 3 buried bfv_mult behind ~1000 s of 32k compiles and
        # the external kill took exactly the numbers that had never
        # been measured).  NTT sweeps that have been captured in two
        # prior rounds run last.
        if os.environ.get("BENCH_NTT_ONLY", "") != "1":
            sets = os.environ.get("BENCH_SETS", "")
            msets = os.environ.get("BENCH_MULT_SETS", "32k_9q,16k_5q")
            bsets = os.environ.get("BENCH_BATCH_SETS", "32k_9q,16k_5q")
            if sets:
                # restricted run: the named sets, then the (independently
                # restrictable) mult/batched sections
                _section("bfv_table7", detail, "bfv_table7",
                         bench_bfv, [s for s in sets.split(",") if s])
                _section("bfv_mult", detail, "bfv_mult",
                         bench_bfv_mult, [s for s in msets.split(",") if s])
                _section("bfv_batched", detail, "bfv_batched",
                         bench_bfv_batched,
                         [s for s in bsets.split(",") if s])
            else:
                _section("bfv_table7:32k_9q", detail, "bfv_table7",
                         bench_bfv, ["32k_9q"])
                _section("bfv_mult", detail, "bfv_mult",
                         bench_bfv_mult, [s for s in msets.split(",") if s])
                _section("bfv_table7:32k_16q", detail, "bfv_table7",
                         bench_bfv, ["32k_16q"])
                _section("bfv_batched", detail, "bfv_batched",
                         bench_bfv_batched,
                         [s for s in bsets.split(",") if s])
                _section("bfv_table7:small", detail, "bfv_table7",
                         bench_bfv, ["16k_5q", "4k_3q", "8k_4q"])
        t30 = _section("transforms30", detail, None, bench_transforms30)
        if t30 and t30["ntt30"] > 0 and t30["intt30"] > 0:
            detail.update({
                "ntt30_us": round(t30["ntt30"], 2),
                "ntt30_vs_baseline":
                    round(BASELINE_NTT30_US / t30["ntt30"], 3),
                "intt30_us": round(t30["intt30"], 2),
                "intt30_vs_baseline":
                    round(BASELINE_INTT30_US / t30["intt30"], 3),
            })
        _section("table6_55bit", detail, "table6_55bit", bench_table6)
        _section("table6_30bit", detail, "table6_30bit", bench_table6_30bit)
        if not _over_budget(reserve_sec=250.0):
            _section("floor_probe", detail, "floor_probe",
                     bench_floor_probe)
    finally:
        if "sections_failed" in detail:
            headline["sections_failed"] = detail["sections_failed"]
        # The compact headline is the FINAL stdout line (round 2's
        # full-record print overflowed the driver's tail capture; detail
        # lives only in bench_detail.json).
        _flush_artifact()


if __name__ == "__main__":
    main()
