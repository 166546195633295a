"""SPMD EvalMult/relinearization vs the single-chip pipelines.

Bit-exactness for every shard count that divides r: the shard-level
conversion bodies mirror ops/behz.py term-for-term, so padded real rows
must equal the single-chip results exactly.  The inner transforms run
the portable xla stage-loop (the pallas kernels' bit-exactness is
covered by their own suites)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ntt_cuda_tpu.models import bfv
from ntt_cuda_tpu.parallel import spmd, spmd_mult
from ntt_cuda_tpu.utils import golden, primegen, serialize

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs >= 4 devices")


@pytest.fixture(scope="module")
def setup():
    params = primegen.make_bfv_params(2048, 40, 4)
    ref = bfv.BFVContext.build(params, backend="xla")
    sk, pk = ref.keygen()
    rlk = ref.relin_keygen(sk)
    m1 = np.arange(params.n, dtype=np.uint64) % params.t
    m2 = (np.arange(params.n, dtype=np.uint64) * 7 + 3) % params.t
    ct1 = np.asarray(ref.encrypt(pk, m1, nonce=1))
    ct2 = np.asarray(ref.encrypt(pk, m2, nonce=2))
    return params, ref, sk, rlk, m1, m2, ct1, ct2


def _mctx(params, R):
    base = spmd.SpmdBFVContext.build(params, devices=jax.devices()[:R],
                                     interpret=True)
    return spmd_mult.SpmdMultContext.build(base, ntt_impl="xla")


@pytest.mark.parametrize(
    "R", [2, pytest.param(4, marks=pytest.mark.slow)])
def test_spmd_mul_bitexact(setup, R):
    params, ref, sk, rlk, m1, m2, ct1, ct2 = setup
    mctx = _mctx(params, R)
    p1 = serialize.pad_ciphertext(ct1, params)
    p2 = serialize.pad_ciphertext(ct2, params)
    ct3_ref = np.asarray(ref.mul(ct1, ct2))
    ct3_s = np.asarray(mctx.mul(p1, p2))
    assert ct3_s.shape == (3, params.r, params.n)
    np.testing.assert_array_equal(ct3_s[:, : params.r - 1], ct3_ref)


@pytest.mark.parametrize(
    "R", [2, pytest.param(4, marks=pytest.mark.slow)])
def test_spmd_relin_keygen_bitexact(setup, R):
    params, ref, sk, rlk, *_ = setup
    mctx = _mctx(params, R)
    rlk_s = np.asarray(mctx.relin_keygen(sk))
    np.testing.assert_array_equal(rlk_s, np.asarray(rlk))


@pytest.mark.slow
def test_spmd_relinearize_and_decrypt(setup):
    """Full sharded pipeline: mul -> relinearize (sharded keys) ->
    2-component spmd decrypt == plaintext product; 3-component
    decrypt3 agrees."""
    params, ref, sk, rlk, m1, m2, ct1, ct2 = setup
    mctx = _mctx(params, 4)
    p1 = serialize.pad_ciphertext(ct1, params)
    p2 = serialize.pad_ciphertext(ct2, params)
    ct3 = mctx.mul(p1, p2)
    exp = golden.schoolbook_negacyclic(m1.tolist(), m2.tolist(),
                                       params.t, params.n)

    out3 = np.asarray(mctx.decrypt3(sk, ct3))
    assert out3.tolist() == exp

    rlk_s = mctx.relin_keygen(sk)
    ct2c = np.asarray(mctx.relinearize(ct3, rlk_s))
    # bit-identical to the single-chip relinearize on real rows
    ref2 = np.asarray(ref.relinearize(
        np.asarray(ct3)[:, : params.r - 1], rlk))
    np.testing.assert_array_equal(ct2c[:, : params.r - 1], ref2)
    out2 = np.asarray(mctx.base.decrypt(sk, jnp.asarray(ct2c)))
    assert out2.tolist() == exp


def test_spmd_mul_collective_structure(setup):
    """The designed communication: 4 all_gathers in mul, 1 all_gather +
    1 psum (all-reduce) in relinearize, nothing else."""
    params, ref, sk, rlk, m1, m2, ct1, ct2 = setup
    mctx = _mctx(params, 2)
    p1 = serialize.pad_ciphertext(ct1, params)
    txt = mctx.lowered_mul(jnp.asarray(p1), jnp.asarray(p1)) \
        .compile().as_text()
    n_gather = txt.count("all-gather(") + txt.count("all-gather-start(")
    assert n_gather == 4, txt[:0] or n_gather
    assert "all-reduce(" not in txt or txt.count("all-reduce(") == 0


def test_spmd_galois_bitexact(setup):
    """Sharded galois keys bit-match single-chip; apply_galois is
    bit-identical on real rows."""
    params, ref, sk, rlk, m1, m2, ct1, ct2 = setup
    mctx = _mctx(params, 2)
    g = 3
    gks_ref = ref.galois_keygen(sk, [g], nonce=7)
    gks_s = mctx.galois_keygen(sk, [g], nonce=7)
    np.testing.assert_array_equal(np.asarray(gks_s[g]),
                                  np.asarray(gks_ref[g]))
    p1 = serialize.pad_ciphertext(ct1, params)
    out_s = np.asarray(mctx.apply_galois(p1, g, gks_s[g]))
    out_ref = np.asarray(ref.apply_galois(ct1, g, gks_ref[g]))
    np.testing.assert_array_equal(out_s[:, : params.r - 1], out_ref)


def test_spmd_add_sub(setup):
    """Padded elementwise EvalAdd/EvalSub match the single-chip ops on
    real rows (zero collectives)."""
    params, ref, sk, rlk, m1, m2, ct1, ct2 = setup
    base = spmd.SpmdBFVContext.build(params, devices=jax.devices()[:2],
                                     interpret=True)
    p1 = serialize.pad_ciphertext(ct1, params)
    p2 = serialize.pad_ciphertext(ct2, params)
    s = np.asarray(base.add(p1, p2))
    np.testing.assert_array_equal(s[:, : params.r - 1],
                                  np.asarray(ref.add(ct1, ct2)))
    d = np.asarray(base.sub(p1, p2))
    np.testing.assert_array_equal(d[:, : params.r - 1],
                                  np.asarray(ref.sub(ct1, ct2)))


def test_spmd_mul_pallas_conversions_bitexact(setup):
    """The single-pass Pallas conversion kernels (behz_pallas *_rows
    variants) on the sharded path: bit-identical to the single-chip mul
    and to the XLA shard chains, same 4-all_gather structure."""
    params, ref, sk, rlk, m1, m2, ct1, ct2 = setup
    base = spmd.SpmdBFVContext.build(params, devices=jax.devices()[:2],
                                     interpret=True)
    mctx = spmd_mult.SpmdMultContext.build(base,
                                           ntt_impl="pallas-interpret")
    p1 = serialize.pad_ciphertext(ct1, params)
    p2 = serialize.pad_ciphertext(ct2, params)
    ct3_ref = np.asarray(ref.mul(ct1, ct2))
    ct3_s = np.asarray(mctx.mul(p1, p2))
    np.testing.assert_array_equal(ct3_s[:, : params.r - 1], ct3_ref)
    txt = mctx.lowered_mul(jnp.asarray(p1), jnp.asarray(p2)) \
        .compile().as_text()
    n_gather = txt.count("all-gather(") + txt.count("all-gather-start(")
    assert n_gather == 4, n_gather
    # relinearize through the fused key-switch front
    # (fused_ops.keyswitch_front_fused per shard)
    rel_ref = np.asarray(ref.relinearize(jnp.asarray(ct3_ref),
                                         jnp.asarray(rlk)))
    rel_s = np.asarray(mctx.relinearize(jnp.asarray(ct3_s),
                                        jnp.asarray(rlk)))
    np.testing.assert_array_equal(rel_s[:, : params.r - 1], rel_ref)
