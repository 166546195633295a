"""Fused encrypt/decrypt tail kernels vs the ops/poly.py XLA chains.

Both kernels must be bit-identical to the unfused reference semantics
(including the strict-`>` add quirks) — the BFV golden-vector tests then
cover them end-to-end through the pallas-interpret backend.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ntt_cuda_tpu.ops import bfv_tail, modmath, poly
from ntt_cuda_tpu.params import get_bfv_params


@pytest.fixture(scope="module")
def p4k():
    return get_bfv_params("4k_3q")


def _rand_res(rng, qs, n):
    return jnp.asarray(np.stack(
        [rng.integers(0, q, n, dtype=np.uint64) for q in qs]))


def test_encrypt_tail_bitexact(p4k, rng):
    p = p4k
    n, r = p.n, p.r
    ms_full = modmath.modulus_set(p)
    ms_drop = modmath.modulus_set(p, r - 1)
    ms_last = modmath.ModulusSet.from_moduli([p.q[-1]])
    dr = poly.DivideRoundConsts.build(p)
    mc = poly.MessageConsts.build(p)
    tc = bfv_tail.TailConsts.build(p)
    c = jnp.stack([_rand_res(rng, p.q, n), _rand_res(rng, p.q, n)])
    e = jnp.stack([_rand_res(rng, p.q, n), _rand_res(rng, p.q, n)])
    m = jnp.asarray(rng.integers(0, p.t, n, dtype=np.uint64))

    ref = poly.poly_add(c, e, ms_full)
    ref = poly.divide_and_round_q_last(ref, dr, ms_drop, ms_last)
    ref = jnp.stack([poly.add_message(ref[0], m, mc), ref[1]])
    got = bfv_tail.encrypt_tail(c, e, m, tc, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_decrypt_tail_bitexact(p4k, rng):
    p = p4k
    n, rk = p.n, p.r - 1
    ms = modmath.modulus_set(p, rk)
    dc = poly.DecryptConsts.build(p)
    dt = bfv_tail.DecTailConsts.build(p)
    x = _rand_res(rng, p.q[:rk], n)
    c0 = _rand_res(rng, p.q[:rk], n)

    ref = poly.poly_add(x, c0, ms)
    ref = poly.poly_mul_scalar_mont(ref, dc.prod_t_gamma_mont, ms)
    ref = poly.poly_mul_scalar_mont(ref, dc.inv_punctured_mont, ms)
    ref = np.asarray(poly.fast_convert_and_round(ref, dc))
    got = np.asarray(bfv_tail.decrypt_tail(x, c0, dt, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_combine_gamma_halves_beyond_8_shards(p4k, rng):
    """The split-halves BEHZ psum recombination is exact for shard counts
    where a direct u64 psum of gamma-row partials would silently wrap
    (R * gamma >= 2^64, i.e. R > 8 for the published gamma)."""
    p = p4k
    g = p.gamma
    for R in (8, 9, 16, 64):
        parts = rng.integers(0, g, (R, 257), dtype=np.uint64)
        # boundary rows: every shard contributes the maximum partial
        parts[:, 0] = g - 1
        total = parts.astype(object).sum(axis=0)
        if R > 8:
            assert (total >= (1 << 64)).any(), "case must exercise overflow"
        lo = jnp.asarray(
            (parts & np.uint64(0xFFFFFFFF)).sum(axis=0, dtype=np.uint64))
        hi = jnp.asarray(
            (parts >> np.uint64(32)).sum(axis=0, dtype=np.uint64))
        got = np.asarray(bfv_tail.combine_gamma_halves(lo, hi, p))
        expect = np.array([int(t) % g for t in total], dtype=np.uint64)
        np.testing.assert_array_equal(got % np.uint64(g), expect)
        assert (got < np.uint64(2) * np.uint64(g)).all()


def test_dec_round_from_sums_matches_fused_tail(p4k, rng):
    """psum_behz_partials' recombination feeding dec_round_from_sums is
    bit-identical to the single-chip fused decrypt tail."""
    p = p4k
    n, rk = p.n, p.r - 1
    dt = bfv_tail.DecTailConsts.build(p)
    x = _rand_res(rng, p.q[:rk], n)
    c0 = _rand_res(rng, p.q[:rk], n)
    ref = np.asarray(bfv_tail.decrypt_tail(x, c0, dt, interpret=True))

    # emulate per-residue shards (R = rk "shards" of 1 residue each)
    los, his, ts = [], [], []
    for i in range(rk):
        dci = bfv_tail.build_dec_tail_consts_padded(p, i, i + 1)
        xt, xg = bfv_tail.decrypt_tail_partial(
            x[i:i + 1], c0[i:i + 1], dci, interpret=True)
        ts.append(np.asarray(xt, dtype=np.uint64))
        los.append(np.asarray(xg & jnp.uint64(0xFFFFFFFF)))
        his.append(np.asarray(xg >> jnp.uint64(32)))
    xt_sum = jnp.asarray(np.sum(ts, axis=0, dtype=np.uint64))
    xg = bfv_tail.combine_gamma_halves(
        jnp.asarray(np.sum(los, axis=0, dtype=np.uint64)),
        jnp.asarray(np.sum(his, axis=0, dtype=np.uint64)), p)
    got = np.asarray(bfv_tail.dec_round_from_sums(xt_sum, xg, p))
    np.testing.assert_array_equal(got, ref)
