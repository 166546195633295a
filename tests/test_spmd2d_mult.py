"""2-D (rns x coef) SPMD EvalMult vs the single-chip pipelines.

All interpret-mode (the 2-D path runs the fused pallas kernels per
shard); slow-marked like the rest of the spmd2d suite."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ntt_cuda_tpu.models import bfv
from ntt_cuda_tpu.parallel import mesh as mesh_mod, spmd2d, spmd2d_mult
from ntt_cuda_tpu.utils import golden, primegen, serialize

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(len(jax.devices()) < 4,
                                 reason="needs >= 4 devices")]


@pytest.fixture(scope="module")
def setup():
    params = primegen.make_bfv_params(1024, 28, 4)
    ref = bfv.BFVContext.build(params, backend="xla")
    sk, pk = ref.keygen()
    rlk = ref.relin_keygen(sk)
    m1 = np.arange(params.n, dtype=np.uint64) % params.t
    m2 = (np.arange(params.n, dtype=np.uint64) * 5 + 1) % params.t
    ct1 = np.asarray(ref.encrypt(pk, m1, nonce=1))
    ct2 = np.asarray(ref.encrypt(pk, m2, nonce=2))
    mesh = mesh_mod.make_mesh(rns=2, coef=2, devices=jax.devices()[:4])
    base = spmd2d.Spmd2DBFVContext.build(params, mesh, interpret=True)
    mctx = spmd2d_mult.Spmd2DMultContext.build(base)
    return params, ref, sk, rlk, m1, m2, ct1, ct2, mctx


def test_2d_mul_bitexact(setup):
    params, ref, sk, rlk, m1, m2, ct1, ct2, mctx = setup
    p1 = serialize.pad_ciphertext(ct1, params)
    p2 = serialize.pad_ciphertext(ct2, params)
    ct3_s = np.asarray(mctx.mul(p1, p2))
    ct3_ref = np.asarray(ref.mul(ct1, ct2))
    np.testing.assert_array_equal(ct3_s[:, : params.r - 1], ct3_ref)
    exp = golden.schoolbook_negacyclic(m1.tolist(), m2.tolist(),
                                       params.t, params.n)
    out3 = np.asarray(mctx.decrypt3(sk, jnp.asarray(ct3_s)))
    assert out3.tolist() == exp


def test_2d_relin_bitexact(setup):
    params, ref, sk, rlk, m1, m2, ct1, ct2, mctx = setup
    rlk_s = np.asarray(mctx.relin_keygen(sk))
    np.testing.assert_array_equal(rlk_s, np.asarray(rlk))

    p1 = serialize.pad_ciphertext(ct1, params)
    p2 = serialize.pad_ciphertext(ct2, params)
    ct3 = mctx.mul(p1, p2)
    ct2c = np.asarray(mctx.relinearize(ct3, jnp.asarray(rlk_s)))
    ref2 = np.asarray(ref.relinearize(
        np.asarray(ct3)[:, : params.r - 1], rlk))
    np.testing.assert_array_equal(ct2c[:, : params.r - 1], ref2)
    out = np.asarray(mctx.base.decrypt(sk, jnp.asarray(ct2c)))
    exp = golden.schoolbook_negacyclic(m1.tolist(), m2.tolist(),
                                       params.t, params.n)
    assert out.tolist() == exp


def test_2d_galois_bitexact(setup):
    """2-D sharded galois keys + apply bit-match single-chip (the global
    coefficient permutation gathers once over 'coef')."""
    params, ref, sk, rlk, m1, m2, ct1, ct2, mctx = setup
    g = 3
    gks_ref = ref.galois_keygen(sk, [g], nonce=8)
    gks_s = mctx.galois_keygen(sk, [g], nonce=8)
    np.testing.assert_array_equal(np.asarray(gks_s[g]),
                                  np.asarray(gks_ref[g]))
    p1 = serialize.pad_ciphertext(ct1, params)
    out_s = np.asarray(mctx.apply_galois(p1, g, gks_s[g]))
    out_ref = np.asarray(ref.apply_galois(ct1, g, gks_ref[g]))
    np.testing.assert_array_equal(out_s[:, : params.r - 1], out_ref)


def test_2d_mul_pallas_conversions_bitexact(setup):
    """conv_impl="pallas-interpret": the row-sliced conversion kernels
    on the 2-D mesh (coefficient-elementwise, so the coef axis adds no
    conversion traffic) — bit-identical to the single-chip mul."""
    params, ref, sk, rlk, m1, m2, ct1, ct2, mctx = setup
    mctx_pl = spmd2d_mult.Spmd2DMultContext.build(
        mctx.base, conv_impl="pallas-interpret")
    p1 = serialize.pad_ciphertext(ct1, params)
    p2 = serialize.pad_ciphertext(ct2, params)
    ct3_s = np.asarray(mctx_pl.mul(p1, p2))
    ct3_ref = np.asarray(ref.mul(ct1, ct2))
    np.testing.assert_array_equal(ct3_s[:, : params.r - 1], ct3_ref)
