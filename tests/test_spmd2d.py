"""2-D (rns x coef) SPMD BFV vs the single-device reference path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ntt_cuda_tpu.models import bfv
from ntt_cuda_tpu.parallel import mesh as mesh_mod, spmd2d
from ntt_cuda_tpu.utils import primegen

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs >= 4 devices")


@pytest.fixture(scope="module")
def setup():
    params = primegen.make_bfv_params(2048, 40, 4)
    ref = bfv.BFVContext.build(params, backend="xla")
    mesh = mesh_mod.make_mesh(rns=2, coef=2)
    ctx = spmd2d.Spmd2DBFVContext.build(params, mesh, interpret=True)
    return params, ref, ctx


@pytest.mark.slow
@pytest.mark.parametrize("rns,coef", [(1, 4), (4, 1), (4, 2)])
def test_spmd2d_mesh_matrix(rns, coef):
    """Functional keygen/encrypt/decrypt on degenerate and rectangular
    meshes — (1, coef) pure coefficient sharding, (rns, 1) pure modulus
    sharding, (4, 2) both — each with a nonzero-nonce roundtrip (VERDICT
    round-2 item 8; the module fixture covers only (2, 2))."""
    params = primegen.make_bfv_params(2048, 40, 4)
    ref = bfv.BFVContext.build(params, backend="xla")
    mesh = mesh_mod.make_mesh(rns=rns, coef=coef)
    ctx = spmd2d.Spmd2DBFVContext.build(params, mesh, interpret=True)
    sk_r, pk_r = ref.keygen()
    sk_s, pk_s = ctx.keygen()
    np.testing.assert_array_equal(np.asarray(sk_s), np.asarray(sk_r))
    np.testing.assert_array_equal(np.asarray(pk_s), np.asarray(pk_r))
    m = jnp.asarray(np.arange(params.n, dtype=np.uint64) % params.t)
    ct_ref = ref.encrypt(pk_r, m)
    ct_s = ctx.encrypt(pk_s, m)
    np.testing.assert_array_equal(
        np.asarray(ct_s)[:, : params.r - 1], np.asarray(ct_ref))
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk_s, ct_s)),
                                  np.asarray(m))
    sk2, pk2 = ctx.keygen(nonce=7)
    ct2 = ctx.encrypt(pk2, m, nonce=8)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk2, ct2)),
                                  np.asarray(m))


@pytest.mark.slow
def test_spmd2d_keygen_bitexact(setup):
    params, ref, ctx = setup
    sk_r, pk_r = ref.keygen()
    sk_s, pk_s = ctx.keygen()
    np.testing.assert_array_equal(np.asarray(sk_s), np.asarray(sk_r))
    np.testing.assert_array_equal(np.asarray(pk_s), np.asarray(pk_r))


@pytest.mark.slow
def test_spmd2d_encrypt_decrypt_bitexact(setup):
    params, ref, ctx = setup
    sk, pk = ref.keygen()
    m = jnp.asarray(np.arange(params.n, dtype=np.uint64) % params.t)
    ct_ref = ref.encrypt(pk, m)
    ct_s = ctx.encrypt(pk, m)
    np.testing.assert_array_equal(
        np.asarray(ct_s)[:, : params.r - 1], np.asarray(ct_ref))
    out = np.asarray(ctx.decrypt(sk, ct_s))
    np.testing.assert_array_equal(out, np.asarray(m))
    # nonce'd end-to-end through the 2-D path
    sk2, pk2 = ctx.keygen(nonce=5)
    ct2 = ctx.encrypt(pk2, m, nonce=6)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk2, ct2)),
                                  np.asarray(m))
