"""Explicit shard_map BFV pipelines vs the single-device reference path.

The SPMD program (parallel/spmd.py) must be bit-identical to the
single-chip pipelines: same Salsa20 slices (counter mode), same kernels
per shard, collectives only where the math demands them.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ntt_cuda_tpu.models import bfv
from ntt_cuda_tpu.parallel import spmd
from ntt_cuda_tpu.utils import primegen

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs >= 2 devices")


@pytest.fixture(scope="module")
def setup():
    params = primegen.make_bfv_params(2048, 40, 4)
    ref = bfv.BFVContext.build(params, backend="xla")
    ctx = spmd.SpmdBFVContext.build(params, devices=jax.devices()[:2],
                                    interpret=True)
    return params, ref, ctx


@pytest.mark.slow
def test_spmd_keygen_bitexact(setup):
    params, ref, ctx = setup
    sk_r, pk_r = ref.keygen()
    sk_s, pk_s = ctx.keygen()
    np.testing.assert_array_equal(np.asarray(sk_s), np.asarray(sk_r))
    np.testing.assert_array_equal(np.asarray(pk_s), np.asarray(pk_r))


@pytest.mark.slow
def test_spmd_encrypt_decrypt_bitexact(setup):
    params, ref, ctx = setup
    sk, pk = ref.keygen()
    m = jnp.asarray(np.arange(params.n, dtype=np.uint64) % params.t)
    ct_ref = ref.encrypt(pk, m)                       # (2, r-1, n)
    ct_s = ctx.encrypt(pk, m)                         # (2, r, n) padded
    np.testing.assert_array_equal(
        np.asarray(ct_s)[:, : params.r - 1], np.asarray(ct_ref))
    out = np.asarray(ctx.decrypt(sk, ct_s))
    np.testing.assert_array_equal(out, np.asarray(m))
    # fresh nonce roundtrip through the spmd path end-to-end
    sk2, pk2 = ctx.keygen(nonce=3)
    ct2 = ctx.encrypt(pk2, m, nonce=4)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk2, ct2)),
                                  np.asarray(m))


@pytest.mark.slow
def test_spmd_nonce_matches_single_chip(setup):
    """Counter-mode keystream slicing must give the same draws as the
    single-chip path for ANY nonce, not just the deterministic default."""
    params, ref, ctx = setup
    sk_r, pk_r = ref.keygen(nonce=3)
    sk_s, pk_s = ctx.keygen(nonce=3)
    np.testing.assert_array_equal(np.asarray(sk_s), np.asarray(sk_r))
    np.testing.assert_array_equal(np.asarray(pk_s), np.asarray(pk_r))
    m = jnp.asarray(np.arange(params.n, dtype=np.uint64) % params.t)
    ct_r = ref.encrypt(pk_r, m, nonce=9)
    ct_s = ctx.encrypt(pk_s, m, nonce=9)
    np.testing.assert_array_equal(
        np.asarray(ct_s)[:, : params.r - 1], np.asarray(ct_r))


@pytest.mark.slow
def test_spmd_behz_boundary_pipeline_r16_shards8():
    """End-to-end decrypt at rns=8 shards, r=16 — drives the split-halves
    BEHZ psum (bfv_tail.psum_behz_partials) through the REAL pipeline
    wiring at a shard count where a naive u64 gamma-partial sum could
    wrap (the unit test proves the math; this proves the wiring —
    VERDICT round-2 item 7).  Bit-identical to the single-chip path."""
    params = primegen.make_bfv_params(2048, 40, 16)
    ref = bfv.BFVContext.build(params, backend="xla")
    ctx = spmd.SpmdBFVContext.build(params, devices=jax.devices()[:8],
                                    interpret=True)
    sk, pk = ref.keygen()
    m = jnp.asarray(np.arange(params.n, dtype=np.uint64) % params.t)
    ct_ref = ref.encrypt(pk, m)
    ct_s = ctx.encrypt(pk, m)
    np.testing.assert_array_equal(
        np.asarray(ct_s)[:, : params.r - 1], np.asarray(ct_ref))
    out = np.asarray(ctx.decrypt(sk, ct_s))
    np.testing.assert_array_equal(out, np.asarray(m))


@pytest.mark.slow
def test_spmd_mod_switch_bitexact(setup, rng):
    """Shard-geometry-preserving modulus switch: live rows bit-identical
    to the single-chip mod_switch_to_next, then level-aware decrypt
    (VERDICT r3 item 7)."""
    params, ref, ctx = setup
    sk, pk = ref.keygen()
    m = jnp.asarray(rng.integers(0, params.t, params.n, dtype=np.uint64))
    ct_ref = ref.encrypt(pk, m, nonce=7)              # (2, r-1, n)
    ct_s = ctx.encrypt(pk, m, nonce=7)                # (2, r, n) padded
    sw_ref = ref.mod_switch_to_next(ct_ref)           # (2, r-2, n)
    sw_s = ctx.mod_switch_to_next(ct_s)               # (2, r, n) padded
    np.testing.assert_array_equal(
        np.asarray(sw_s)[:, : params.r - 2], np.asarray(sw_ref))
    # level-1 decrypt matches the single-chip next-context decrypt
    out = np.asarray(ctx.decrypt(sk, sw_s, level=1))
    np.testing.assert_array_equal(
        out, np.asarray(ref.next_context().decrypt(sk, sw_ref)))
    np.testing.assert_array_equal(out, np.asarray(m))


@pytest.mark.slow
def test_spmd_mod_switch_r4_mesh4(rng):
    """Same bit-exactness on a 4-way mesh (one modulus per shard; the
    dropped row's owner broadcasts via the psum)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    params = primegen.make_bfv_params(2048, 40, 4)
    ref = bfv.BFVContext.build(params, backend="xla")
    ctx = spmd.SpmdBFVContext.build(params, devices=jax.devices()[:4],
                                    interpret=True)
    sk, pk = ref.keygen()
    m = jnp.asarray(rng.integers(0, params.t, params.n, dtype=np.uint64))
    ct_ref = ref.encrypt(pk, m, nonce=9)
    ct_s = ctx.encrypt(pk, m, nonce=9)
    sw_ref = ref.mod_switch_to_next(ct_ref)
    sw_s = ctx.mod_switch_to_next(ct_s)
    np.testing.assert_array_equal(
        np.asarray(sw_s)[:, : params.r - 2], np.asarray(sw_ref))
    np.testing.assert_array_equal(
        np.asarray(ctx.decrypt(sk, sw_s, level=1)), np.asarray(m))


@pytest.mark.slow
def test_spmd_prime_t_encoder_roundtrip(rng):
    """CRT batching encoder through the SPMD path: encode (replicated
    mod-t transform) -> sharded encrypt -> sharded decrypt -> decode.
    The Barrett-by-t pallas tails make odd batching primes first-class
    on the mesh (VERDICT r3 item 7)."""
    from ntt_cuda_tpu.models import encoder
    n = 2048
    t = primegen.find_plain_modulus(n, 17)
    params = primegen.make_bfv_params(n, 40, 4, t=t)
    ref = bfv.BFVContext.build(params, backend="xla")
    ctx = spmd.SpmdBFVContext.build(params, devices=jax.devices()[:2],
                                    interpret=True)
    enc = encoder.BatchEncoder(params)
    sk, pk = ref.keygen()
    v = rng.integers(0, t, n, dtype=np.uint64)
    m = enc.encode(v)
    ct_ref = ref.encrypt(pk, m, nonce=11)
    ct_s = ctx.encrypt(pk, m, nonce=11)
    np.testing.assert_array_equal(
        np.asarray(ct_s)[:, : params.r - 1], np.asarray(ct_ref))
    out = np.asarray(enc.decode(ctx.decrypt(sk, ct_s)))
    np.testing.assert_array_equal(out, v)
