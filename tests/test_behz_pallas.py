"""Pallas BEHZ conversion kernels vs the XLA chains: bit-exact.

The three conversions (rns_to_bsk / fast_floor / bsk_to_q) are exact
modular arithmetic with canonical [0, q) values at every interface, so
the single-pass VMEM kernels must reproduce ops/behz.py to the bit.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ntt_cuda_tpu.ops import behz, behz_pallas
from ntt_cuda_tpu.params import get_bfv_params
from ntt_cuda_tpu.utils import primegen


@pytest.fixture(scope="module", params=["4k_3q", "gen_2048_r5"])
def setup(request):
    if request.param == "4k_3q":
        p = get_bfv_params("4k_3q")
    else:
        p = primegen.make_bfv_params(2048, 50, 5)
    mc = behz.MultConsts.build(p)
    mpc = behz_pallas.MultPallasConsts.build(p)
    return p, mc, mpc


def _rand_residues(rng, qs, lead, n):
    out = np.empty(lead + (len(qs), n), dtype=np.uint64)
    for i, q in enumerate(qs):
        out[..., i, :] = rng.integers(0, q, lead + (n,), dtype=np.uint64)
    return jnp.asarray(out)


def test_rns_to_bsk_bitexact(setup, rng):
    p, mc, mpc = setup
    x = _rand_residues(rng, p.q[:-1], (2,), p.n)
    ref = np.asarray(behz.rns_to_bsk(x, mc))
    got = np.asarray(behz_pallas.rns_to_bsk(x, mpc, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_fast_floor_bitexact(setup, rng):
    p, mc, mpc = setup
    k = p.r - 1
    aux = behz.AuxBase.build(p)
    xq = _rand_residues(rng, p.q[:-1], (3,), p.n)
    xb = _rand_residues(rng, aux.bsk, (3,), p.n)
    ref = np.asarray(behz.fast_floor(xq, xb, mc))
    got = np.asarray(behz_pallas.fast_floor(xq, xb, mpc, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_bsk_to_q_bitexact(setup, rng):
    p, mc, mpc = setup
    aux = behz.AuxBase.build(p)
    # bsk_to_q assumes centered magnitude < prod(B)/2 — feed it values
    # that came THROUGH the pipeline (a fast_floor output), as mul does
    xq = _rand_residues(rng, p.q[:-1], (1,), p.n)
    xb = _rand_residues(rng, aux.bsk, (1,), p.n)
    y = behz.fast_floor(xq, xb, mc)
    ref = np.asarray(behz.bsk_to_q(y, mc))
    got = np.asarray(behz_pallas.bsk_to_q(y, mpc, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_scale_and_round_bitexact(setup, rng):
    p, mc, mpc = setup
    aux = behz.AuxBase.build(p)
    xq = _rand_residues(rng, p.q[:-1], (3,), p.n)
    xb = _rand_residues(rng, aux.bsk, (3,), p.n)
    ref = np.asarray(behz.scale_and_round(xq, xb, mc))
    got = np.asarray(behz_pallas.scale_and_round(xq, xb, mpc,
                                                 interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_row_sliced_variants_match_full(setup, rng):
    """The shard-band wrappers (rows [row0, row0+rl)) reproduce the full
    kernels row-for-row, incl. bsk_to_q_rows' zero pad row."""
    p, mc, mpc = setup
    k = p.r - 1
    aux = behz.AuxBase.build(p)
    xq = _rand_residues(rng, p.q[:-1], (2,), p.n)
    xb = _rand_residues(rng, aux.bsk, (2,), p.n)

    full_a = np.asarray(behz_pallas.rns_to_bsk(xq, mpc, interpret=True))
    full_f = np.asarray(behz_pallas.fast_floor(xq, xb, mpc, interpret=True))
    y = behz_pallas.fast_floor(xq, xb, mpc, interpret=True)
    full_b = np.asarray(behz_pallas.bsk_to_q(y, mpc, interpret=True))

    for row0, rl in [(0, 1), (k, 1), (0, k + 1)]:
        got = np.asarray(behz_pallas.rns_to_bsk_rows(
            xq, mpc, jnp.int32(row0), rl, interpret=True))
        np.testing.assert_array_equal(got, full_a[..., row0:row0 + rl, :])
        got = np.asarray(behz_pallas.fast_floor_rows(
            xq, xb[..., row0:row0 + rl, :], mpc, jnp.int32(row0), rl,
            interpret=True))
        np.testing.assert_array_equal(got, full_f[..., row0:row0 + rl, :])
        got = np.asarray(behz_pallas.bsk_to_q_rows(
            y, mpc, jnp.int32(row0), rl, interpret=True))
        want = np.zeros(got.shape, dtype=np.uint64)
        lo = min(row0 + rl, k) - row0          # real rows in the band
        if lo > 0:
            want[..., :lo, :] = full_b[..., row0:row0 + lo, :]
        np.testing.assert_array_equal(got, want)
