"""Whole-op fused kernels (ops/fused_ops.py) vs the per-stage pipelines.

Every kernel must be bit-identical to the round-2 per-stage kernel
composition (which is itself golden-tested): same lazy-Shoup stage math,
same strict-`>` quirks.  Runs in Pallas interpret mode on the CPU suite.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ntt_cuda_tpu.models import bfv
from ntt_cuda_tpu.ops import bfv_tail, fused_ops, modmath, ntt_pallas, \
    sampling
from ntt_cuda_tpu.params import get_bfv_params


@pytest.fixture(scope="module")
def p4k():
    return get_bfv_params("4k_3q")


@pytest.fixture(scope="module")
def ftab4k(p4k):
    return ntt_pallas.tables_for(p4k)


def _rand_res(rng, qs, n):
    return jnp.asarray(np.stack(
        [rng.integers(0, q, n, dtype=np.uint64) for q in qs]))


def test_keygen_fused_bitexact(p4k, ftab4k, rng):
    p = p4k
    n, r = p.n, p.r
    ms = modmath.modulus_set(p)
    s, a, e = sampling.keygen_draws(n, r, ms, nonce=0, ks_impl="xla")
    s_b, a_c, e_d = sampling.keygen_draws_compact(n, r, ms, nonce=0,
                                                  ks_impl="xla")
    np.testing.assert_array_equal(np.asarray(a_c), np.asarray(a))

    sk_ref = ntt_pallas.ntt_forward(s, ftab4k, interpret=True)
    pk0_ref = ntt_pallas.ntt_inverse_mul(a, sk_ref, ftab4k, interpret=True)
    pk0_ref = ntt_pallas.ntt_forward_addneg(pk0_ref, e, ftab4k,
                                            interpret=True)
    sk, pk0 = fused_ops.keygen_fused(s_b, a, e_d, ftab4k, interpret=True)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(sk_ref))
    np.testing.assert_array_equal(np.asarray(pk0), np.asarray(pk0_ref))


def test_half_polymul_bitexact(p4k, ftab4k, rng):
    p = p4k
    n, r = p.n, p.r
    x = _rand_res(rng, p.q, n)
    y = _rand_res(rng, p.q, n)
    ref = ntt_pallas.ntt_inverse_mul(
        ntt_pallas.ntt_forward(x, ftab4k, interpret=True), y, ftab4k,
        interpret=True)
    got = fused_ops.half_polymul(x, y, ftab4k, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_half_polymul_batched(p4k, ftab4k, rng):
    p = p4k
    n = p.n
    xs = jnp.stack([_rand_res(rng, p.q, n) for _ in range(2)])
    y = _rand_res(rng, p.q, n)
    got = fused_ops.half_polymul(xs, y, ftab4k, interpret=True)
    for j in range(2):
        ref = fused_ops.half_polymul(xs[j], y, ftab4k, interpret=True)
        np.testing.assert_array_equal(np.asarray(got[j]), np.asarray(ref))


def test_encrypt_front_bitexact(p4k, ftab4k, rng):
    """encrypt_front == NTT(u) broadcast + ntt_inverse_mul per half."""
    p = p4k
    n = p.n
    ms = modmath.modulus_set(p)
    u, _, _ = sampling.encrypt_draws(n, p.r, ms, nonce=3, ks_impl="xla")
    u_b, _ = sampling.encrypt_draws_compact(n, nonce=3, ks_impl="xla")
    pk = jnp.stack([_rand_res(rng, p.q, n), _rand_res(rng, p.q, n)])
    un = ntt_pallas.ntt_forward(u, ftab4k, interpret=True)
    ref = ntt_pallas.ntt_inverse_mul(
        jnp.broadcast_to(un, (2,) + un.shape), pk, ftab4k, interpret=True)
    got = fused_ops.encrypt_front(u_b, pk, ftab4k, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_encrypt_fused_bitexact(p4k, ftab4k, rng):
    p = p4k
    n, r = p.n, p.r
    ms = modmath.modulus_set(p)
    tc = bfv_tail.TailConsts.build(p)
    u, e0, e1 = sampling.encrypt_draws(n, r, ms, nonce=0, ks_impl="xla")
    u_b, e_d = sampling.encrypt_draws_compact(n, nonce=0, ks_impl="xla")
    e = jnp.stack([e0, e1])
    pk = jnp.stack([_rand_res(rng, p.q, n), _rand_res(rng, p.q, n)])
    m = jnp.asarray(rng.integers(0, p.t, n, dtype=np.uint64))

    u_ntt = ntt_pallas.ntt_forward(u, ftab4k, interpret=True)
    ref = bfv_tail.encrypt_fused(u_ntt, pk, e, m, ftab4k, tc,
                                 interpret=True)
    got = fused_ops.encrypt_fused(u_b, pk, e_d, m, ftab4k, tc,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.slow
def test_encrypt_fused_batched(p4k, ftab4k, rng):
    p = p4k
    n, r = p.n, p.r
    ms = modmath.modulus_set(p)
    tc = bfv_tail.TailConsts.build(p)
    pk = jnp.stack([_rand_res(rng, p.q, n), _rand_res(rng, p.q, n)])
    us, es, msgs = [], [], []
    for nonce in (1, 2):
        u_b, e_d = sampling.encrypt_draws_compact(n, nonce=nonce,
                                                  ks_impl="xla")
        us.append(u_b)
        es.append(e_d)
        msgs.append(jnp.asarray(rng.integers(0, p.t, n, dtype=np.uint64)))
    got = fused_ops.encrypt_fused(jnp.stack(us), pk, jnp.stack(es),
                                  jnp.stack(msgs), ftab4k, tc,
                                  interpret=True)
    ub_b, ed_b = sampling.encrypt_draws_compact_batch(
        n, jnp.asarray([1, 2], jnp.uint64), ks_impl="xla")
    np.testing.assert_array_equal(np.asarray(ub_b), np.asarray(jnp.stack(us)))
    np.testing.assert_array_equal(np.asarray(ed_b), np.asarray(jnp.stack(es)))
    for j in range(2):
        ref = fused_ops.encrypt_fused(us[j], pk, es[j], msgs[j], ftab4k,
                                      tc, interpret=True)
        np.testing.assert_array_equal(np.asarray(got[j]), np.asarray(ref))


@pytest.mark.slow
def test_encrypt_fused_chunked(p4k, ftab4k, rng, monkeypatch):
    """Batches above max_encrypt_batch(n) split into multiple kernel
    launches (the (J, 2, n) ra scratch would blow the VMEM budget in one)
    and stay bit-identical to the unchunked result."""
    p = p4k
    n = p.n
    tc = bfv_tail.TailConsts.build(p)
    pk = jnp.stack([_rand_res(rng, p.q, n), _rand_res(rng, p.q, n)])
    J = 3
    nonces = jnp.asarray([1, 2, 3], jnp.uint64)
    u_b, e_d = sampling.encrypt_draws_compact_batch(n, nonces, ks_impl="xla")
    msgs = jnp.asarray(rng.integers(0, p.t, (J, n), dtype=np.uint64))
    ref = fused_ops.encrypt_fused(u_b, pk, e_d, msgs, ftab4k, tc,
                                  interpret=True)
    monkeypatch.setattr(fused_ops, "_ENC_SCRATCH_BUDGET_BYTES", 32 * n)
    assert fused_ops.max_encrypt_batch(n) == 2   # forces a 2 + 1 split
    # the undecorated function: the jit cache must not replay the
    # unchunked J=3 trace recorded above
    got = fused_ops.encrypt_fused.__wrapped__(u_b, pk, e_d, msgs, ftab4k,
                                              tc, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_decrypt_tail_batched(p4k, rng):
    p = p4k
    n, rk = p.n, p.r - 1
    dt = bfv_tail.DecTailConsts.build(p)
    xs = jnp.stack([_rand_res(rng, p.q[:rk], n) for _ in range(2)])
    cs = jnp.stack([_rand_res(rng, p.q[:rk], n) for _ in range(2)])
    got = bfv_tail.decrypt_tail(xs, cs, dt, interpret=True)
    assert got.shape == (2, n)
    for j in range(2):
        ref = bfv_tail.decrypt_tail(xs[j], cs[j], dt, interpret=True)
        np.testing.assert_array_equal(np.asarray(got[j]), np.asarray(ref))


@pytest.mark.slow
def test_context_op_vs_stage_fusion(p4k):
    """The "op" and "stage" schedules are bit-identical end-to-end."""
    m = jnp.asarray(np.arange(p4k.n, dtype=np.uint64) % p4k.t)
    ctx_op = bfv.BFVContext.build(p4k, backend="pallas-interpret",
                                  fusion="op")
    ctx_st = bfv.BFVContext.build(p4k, backend="pallas-interpret",
                                  fusion="stage")
    sk_o, pk_o = ctx_op.keygen()
    sk_s, pk_s = ctx_st.keygen()
    np.testing.assert_array_equal(np.asarray(sk_o), np.asarray(sk_s))
    np.testing.assert_array_equal(np.asarray(pk_o), np.asarray(pk_s))
    ct_o = ctx_op.encrypt(pk_o, m, nonce=1)
    ct_s = ctx_st.encrypt(pk_s, m, nonce=1)
    np.testing.assert_array_equal(np.asarray(ct_o), np.asarray(ct_s))
    m_o = ctx_op.decrypt(sk_o, ct_o)
    m_s = ctx_st.decrypt(sk_s, ct_s)
    np.testing.assert_array_equal(np.asarray(m_o), np.asarray(m_s))
    np.testing.assert_array_equal(np.asarray(m_o), np.asarray(m))


@pytest.mark.slow
def test_context_batched_matches_single(p4k):
    """encrypt_batch / decrypt_batch == per-message encrypt / decrypt."""
    n = p4k.n
    rng = np.random.default_rng(7)
    ctx = bfv.BFVContext.build(p4k, backend="pallas-interpret")
    sk, pk = ctx.keygen()
    msgs = jnp.asarray(rng.integers(0, p4k.t, (2, n), dtype=np.uint64))
    nonces = jnp.asarray([1, 2], jnp.uint64)
    cts = ctx.encrypt_batch(pk, msgs, nonces)
    for j in range(2):
        ref = ctx.encrypt(pk, msgs[j], nonce=int(nonces[j]))
        np.testing.assert_array_equal(np.asarray(cts[j]), np.asarray(ref))
    dec = ctx.decrypt_batch(sk, cts)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(msgs))


def test_nonce_domain_separation(p4k):
    """Keygen and encryption keystreams are disjoint for every nonzero
    nonce pair: equal raw nonces no longer yield u == s (VERDICT round-2
    weak #7), while nonce 0 keeps the reference's shared-stream
    byte-compat pipeline."""
    p = p4k
    ms = modmath.modulus_set(p)
    s0, _, _ = sampling.keygen_draws(p.n, p.r, ms, nonce=0, ks_impl="xla")
    u0, _, _ = sampling.encrypt_draws(p.n, p.r, ms, nonce=0, ks_impl="xla")
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(u0))  # compat
    for nonce in (1, 7, 2**62):
        s, _, _ = sampling.keygen_draws(p.n, p.r, ms, nonce=nonce,
                                        ks_impl="xla")
        u, _, _ = sampling.encrypt_draws(p.n, p.r, ms, nonce=nonce,
                                         ks_impl="xla")
        assert not np.array_equal(np.asarray(s), np.asarray(u))
    # the effective nonce spaces are provably disjoint
    kn = sampling.keygen_nonce(jnp.uint64(2**63 + 5))
    en = sampling.encrypt_nonce(jnp.uint64(5))
    assert int(kn) >> 63 == 0 and int(en) >> 63 == 1


def test_reserved_nonce_bit_rejected(p4k):
    """Concrete user nonces with bit 63 set are rejected at the public API
    (they would alias another nonce's stream — e.g. keygen(2**63) would
    silently reproduce the nonce-0 secret key).  The internal mapping
    functions stay permissive (they re-apply idempotently to
    already-mapped values inside the pipelines)."""
    for bad in (2**63, np.uint64(2**63 + 7), [1, 2**63 + 1]):
        with pytest.raises(ValueError, match="bit 63"):
            sampling.check_user_nonce(bad)
    sampling.check_user_nonce(0)
    sampling.check_user_nonce(jnp.asarray([1, 2**62], jnp.uint64))
    ctx = bfv.BFVContext.build(p4k)
    with pytest.raises(ValueError, match="bit 63"):
        ctx.keygen(nonce=2**63)
    m = jnp.zeros((p4k.n,), jnp.uint64)
    pk_shape = jnp.zeros((2, p4k.r, p4k.n), jnp.uint64)
    with pytest.raises(ValueError, match="bit 63"):
        ctx.encrypt(pk_shape, m, nonce=2**63 + 1)
    with pytest.raises(ValueError, match="bit 63"):
        ctx.encrypt_batch(pk_shape, m[None, :], [2**63 + 1])


def test_keyswitch_front_fused_bitexact(p4k, ftab4k, rng):
    """keyswitch_front_fused on a row band == the unfused fwd +
    dyadic-accumulate + inverse composition on the same rows (the
    sharded key switch's per-shard front)."""
    import jax
    p = p4k
    k, n, r = p.r - 1, p.n, p.r
    ms = modmath.ModulusSet.from_moduli(p.q)
    c2 = _rand_res(rng, p.q[:-1], n)                      # (k, n)
    ksk = jnp.asarray(np.stack([
        np.stack([np.stack([rng.integers(0, q, n, dtype=np.uint64)
                            for q in p.q]) for _ in range(k)])
        for _ in range(2)]))                              # (2, k, r, n)

    from ntt_cuda_tpu.ops import ntt
    for row0, rl in [(0, r), (0, 2), (r - 1, 1)]:
        band = slice(row0, row0 + rl)
        ftab_b = jax.tree.map(lambda x: x[band], ftab4k)
        nub_b = jnp.asarray(np.array(
            [((1 << 64) // int(q) & 0xFFFFFFFF,
              ((1 << 64) // int(q)) >> 32) for q in p.q[band]],
            dtype=np.uint32))
        ms_b = modmath.ModulusSet.from_moduli(p.q[band])
        got = fused_ops.keyswitch_front_fused(
            c2, ksk[:, :, band], ftab_b, nub_b, interpret=True)

        d = jnp.stack([modmath.mod_u64(c2[j][None, :], ms_b.q, ms_b.nu)
                       for j in range(k)])                # (k, rl, n)
        dhat = ntt_pallas.ntt_forward(d, ftab_b, interpret=True)
        acc0 = acc1 = None
        for j in range(k):
            t0 = ntt.dyadic_mul(dhat[j], ksk[0, j, band], ms_b)
            t1 = ntt.dyadic_mul(dhat[j], ksk[1, j, band], ms_b)
            acc0 = t0 if acc0 is None else modmath.add_mod(acc0, t0,
                                                           ms_b.q)
            acc1 = t1 if acc1 is None else modmath.add_mod(acc1, t1,
                                                           ms_b.q)
        ref = ntt_pallas.ntt_inverse(jnp.stack([acc0, acc1]), ftab_b,
                                     interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
