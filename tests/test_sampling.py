"""Salsa20 keystream + sampler tests.

Keystream is asserted byte-exact against the integer golden (itself
validated against the published ECRYPT vector); ternary/uniform samplers
are exact-integer; the Gaussian sampler gets the reference's statistical
treatment (keygen_test.cu histogram) plus clamp/truncation checks.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from ntt_cuda_tpu.ops import modmath, salsa20, sampling
from ntt_cuda_tpu.params import get_bfv_params
from ntt_cuda_tpu.utils import golden


def _ks_bytes(ks_words: np.ndarray) -> np.ndarray:
    w = np.asarray(ks_words, dtype=np.uint32)
    return np.stack([(w >> (8 * k)) & 0xFF for k in range(4)], axis=1).astype(np.uint8).reshape(-1)


def test_keystream_matches_golden():
    nbytes = 64 * 37
    got = _ks_bytes(salsa20.keystream_for_bytes(nbytes))
    exp = golden.salsa20_keystream(nbytes)
    np.testing.assert_array_equal(got, exp)


def test_keystream_ecrypt_vector():
    """Salsa20/20 256-bit ECRYPT Set-1 vector #0, via the device path."""
    # key = 0x80 00...00 can't be expressed as a repeated byte; check the
    # repeated-byte path against golden instead, and the golden core holds
    # the ECRYPT identity (validated in its own right).
    got = _ks_bytes(salsa20.keystream_words(2, key_byte=0x4D))
    exp = golden.salsa20_keystream(128, key=b"\x4d" * 32)
    np.testing.assert_array_equal(got, exp)


def test_lane_extraction():
    ks = salsa20.keystream_for_bytes(4096)
    raw = _ks_bytes(ks)
    u8 = np.asarray(salsa20.bytes_u8(ks, 64, 256))
    np.testing.assert_array_equal(u8, raw[64:320])
    u32 = np.asarray(salsa20.bytes_u32(ks, 128, 16))
    np.testing.assert_array_equal(u32, raw[128:128 + 64].view(np.uint32))
    u64 = np.asarray(salsa20.bytes_u64(ks, 256, 8))
    np.testing.assert_array_equal(u64, raw[256:256 + 64].view(np.uint64))


def test_ternary_exact():
    p = get_bfv_params("4k_3q")
    ms = modmath.modulus_set(p)
    b = np.arange(256, dtype=np.uint8)
    got = np.asarray(sampling.ternary(jnp.asarray(b), ms))
    for i, q in enumerate(p.q):
        exp = golden.ternary_from_bytes(b, q)
        np.testing.assert_array_equal(got[i], np.array(exp, dtype=np.uint64))
    # quirk: byte 255 -> 2
    assert got[0][255] == 2
    assert got[0][0] == p.q[0] - 1
    assert got[0][85] == 0
    assert got[0][170] == 1


def test_uniform_exact(rng):
    p = get_bfv_params("4k_3q")
    ms = modmath.modulus_set(p)
    u = rng.integers(0, 1 << 64, (p.r, 64), dtype=np.uint64)
    got = np.asarray(sampling.uniform(jnp.asarray(u), ms))
    for i, q in enumerate(p.q):
        exp = golden.uniform_from_u64(u[i], q)
        np.testing.assert_array_equal(got[i], np.array(exp, dtype=np.uint64))
        assert got[i].max() < q


def test_gaussian_stats(rng):
    """Statistical check in the spirit of keygen_test.cu: sigma=3.2 discrete
    Gaussian, clamped +-19.2, centered."""
    p = get_bfv_params("4k_3q")
    ms = modmath.modulus_set(p)
    u = rng.integers(0, 1 << 32, 1 << 16, dtype=np.uint32)
    got = np.asarray(sampling.gaussian(jnp.asarray(u), ms))
    q0 = p.q[0]
    signed = np.where(got[0] > q0 // 2, got[0].astype(np.int64) - q0, got[0].astype(np.int64))
    assert abs(signed.mean()) < 0.1
    # continuous sigma is 3.2 but the reference's int() truncation toward
    # zero shrinks the discrete std to ~2.8
    assert 2.6 < signed.std() < 3.2
    assert signed.min() >= -19 and signed.max() <= 19
    # same draw broadcast across moduli
    for i in range(1, p.r):
        signed_i = np.where(got[i] > p.q[i] // 2, got[i].astype(np.int64) - p.q[i],
                            got[i].astype(np.int64))
        np.testing.assert_array_equal(signed, signed_i)


def test_gauss_bounds_frozen():
    """The pinned Gaussian spec IS the 38 frozen thresholds: the
    documented generator (exact double-precision Phi + the reference's
    u32->f32 RNE quantization) reproduces them bit-for-bit."""
    assert sampling.gen_gauss_icdf_bounds() == sampling.GAUSS_ICDF_BOUNDS
    assert len(sampling.GAUSS_ICDF_BOUNDS) == 38
    assert list(sampling.GAUSS_ICDF_BOUNDS) == \
        sorted(sampling.GAUSS_ICDF_BOUNDS)


def test_gaussian_pinned_special_cases():
    """eps-nudge branches and monotone step behavior at the edges."""
    u = jnp.asarray(np.array(
        [0, 1, 6, 7, 2**31, 2**32 - 129, 2**32 - 128, 2**32 - 1],
        dtype=np.uint32))
    d = np.asarray(sampling.gaussian_int(u))
    assert d[0] == -16            # p == 0 -> +eps branch
    assert d[1] == -19            # smallest nonzero p, clamped
    assert d[2] == -19 and d[3] == -18   # first threshold at u=7
    assert d[4] == 0
    assert d[5] == 16             # largest quantized p below 1.0f
    assert d[6] == 16 and d[7] == 16     # f32(u) RNE-ties to 2^32 -> 1-eps
    # monotone in u over the non-nudged domain
    rng = np.random.default_rng(11)
    us = np.sort(rng.integers(1, 2**32 - 128, 1 << 16).astype(np.uint32))
    ds = np.asarray(sampling.gaussian_int(jnp.asarray(us)))
    assert (np.diff(ds) >= 0).all()


def test_gaussian_pinned_vs_f32_pipeline():
    """Deviation count vs the independent f32 ndtri pipeline (VERDICT
    round-2 item 4): every disagreement is +-1 and adjacent to a pinned
    threshold; exhaustive +-4096 windows contain exactly 720 of them
    (1.7e-7 of the u32 space) and a 2e5 random sample away from the
    windows contains none."""
    bounds = sorted(set(sampling.GAUSS_ICDF_BOUNDS))
    wins = [np.arange(max(0, b - 4096), min(2**32, b + 4096),
                      dtype=np.uint64) for b in bounds]
    u_win = np.unique(np.concatenate(wins)).astype(np.uint32)
    a = np.asarray(sampling.gaussian_int(jnp.asarray(u_win)))
    c = np.asarray(sampling._gaussian_f32_pipeline(jnp.asarray(u_win)))
    mism = np.flatnonzero(a != c)
    assert len(mism) == 720
    assert np.abs(a[mism].astype(int) - c[mism].astype(int)).max() == 1
    rng = np.random.default_rng(12)
    u_rand = rng.integers(0, 2**32, 200_000, dtype=np.uint32)
    u_rand = np.setdiff1d(u_rand, u_win)
    a2 = np.asarray(sampling.gaussian_int(jnp.asarray(u_rand)))
    c2 = np.asarray(sampling._gaussian_f32_pipeline(jnp.asarray(u_rand)))
    np.testing.assert_array_equal(a2, c2)


def test_keystream_batch_matches_single():
    """Each row of the batched keystream equals the single-nonce stream
    (xla impl; the pallas grid is covered by the interpret variant)."""
    nonces = jnp.asarray([0, 1, 2**40 + 7], jnp.uint64)
    got = np.asarray(salsa20.keystream_block_words_batch(
        70, nonces, impl="xla"))
    for j, nn in enumerate([0, 1, 2**40 + 7]):
        exp = np.asarray(salsa20.keystream_block_words(70, nonce=nn,
                                                       impl="xla"))
        np.testing.assert_array_equal(got[j], exp)


def test_keystream_batch_pallas_interpret():
    nonces = jnp.asarray([3, 5], jnp.uint64)
    got = np.asarray(salsa20.keystream_block_words_batch(
        64, nonces, impl="pallas-interpret"))
    exp = np.asarray(salsa20.keystream_block_words_batch(
        64, nonces, impl="xla"))
    np.testing.assert_array_equal(got, exp)


def test_encrypt_draws_batch_matches_single():
    """Row j of encrypt_draws_batch == encrypt_draws(nonce=nonces[j])."""
    p = get_bfv_params("4k_3q")
    ms = modmath.modulus_set(p)
    nonces = [1, 2, 2**50 + 3]
    u_b, e_b = sampling.encrypt_draws_batch(
        p.n, p.r, ms, jnp.asarray(nonces, jnp.uint64), ks_impl="xla")
    assert u_b.shape == (3, p.r, p.n) and e_b.shape == (3, 2, p.r, p.n)
    for j, nn in enumerate(nonces):
        u, e0, e1 = sampling.encrypt_draws(p.n, p.r, ms, nonce=nn,
                                           ks_impl="xla")
        np.testing.assert_array_equal(np.asarray(u_b[j]), np.asarray(u))
        np.testing.assert_array_equal(np.asarray(e_b[j, 0]), np.asarray(e0))
        np.testing.assert_array_equal(np.asarray(e_b[j, 1]), np.asarray(e1))


def test_keygen_draw_layout():
    """Byte-consumption layout equals the reference's offsets
    (bfv_keygen.cuh:120-122)."""
    p = get_bfv_params("4k_3q")
    n, r = p.n, p.r
    ms = modmath.modulus_set(p)
    s, a, e = sampling.keygen_draws(n, r, ms)
    assert s.shape == (r, n) and a.shape == (r, n) and e.shape == (r, n)
    ks = golden.salsa20_keystream(sampling.keygen_entropy_bytes(n, r))
    exp_s = golden.ternary_from_bytes(ks[:n], p.q[0])
    np.testing.assert_array_equal(np.asarray(s[0]), np.array(exp_s, dtype=np.uint64))
    u64s = ks[n : n + 8 * r * n].view(np.uint64).reshape(r, n)
    for i in range(r):
        exp_a = golden.uniform_from_u64(u64s[i], p.q[i])
        np.testing.assert_array_equal(np.asarray(a[i]), np.array(exp_a, dtype=np.uint64))


@pytest.mark.slow
def test_uniform_ref_matches_ieee_double(rng):
    """uniform_ref reproduces the reference's exact fp64 semantics
    ((double)u / UINT64_MAX * (q-1) truncated, bfv_keygen.cuh:33-45) —
    validated element-wise against IEEE numpy float64 (numpy's f64 mul/
    div are correctly-rounded IEEE ops, identical to CUDA doubles here),
    over random draws plus rounding-boundary values."""
    for pname in ("4k_3q", "32k_16q"):
        p = get_bfv_params(pname)
        ms = modmath.ModulusSet.from_moduli(p.q)
        n = 2048
        u = rng.integers(0, 1 << 64, (ms.r, n), dtype=np.uint64)
        edge = np.array(
            [0, 1, 2, (1 << 53) - 1, 1 << 53, (1 << 53) + 1,
             (1 << 64) - 1, (1 << 64) - 512, (1 << 64) - 1024,
             (1 << 64) - 2048, 1 << 63, (1 << 63) + 1, (1 << 63) - 1,
             3 << 62, (1 << 54) + 2, (1 << 54) + 3], dtype=np.uint64)
        u[:, :edge.size] = edge
        got = np.asarray(sampling.uniform_ref(jnp.asarray(u), ms))
        for i, q in enumerate(p.q):
            d = u[i].astype(np.float64)
            d = d / np.float64(np.uint64(0xFFFFFFFFFFFFFFFF))
            d = d * np.float64(np.uint64(q - 1))
            np.testing.assert_array_equal(got[i], d.astype(np.uint64))
            exp_g = golden.uniform_ref_double(u[i][:64].tolist(), int(q))
            assert [int(v) for v in got[i][:64]] == exp_g


@pytest.mark.slow
def test_keygen_fp64_uniform_spec():
    """BFVContext(uniform_spec="fp64"): keygen's `a` draw follows the
    reference's double-precision spec byte-for-byte (making keygen output
    comparable to a real CUDA run), and the pipeline still round-trips."""
    from ntt_cuda_tpu.models import bfv
    p = get_bfv_params("4k_3q")
    ms = modmath.ModulusSet.from_moduli(p.q)
    ctx = bfv.BFVContext.build(p, uniform_spec="fp64")
    n, r = p.n, p.r
    bw = salsa20.keystream_block_words(
        (sampling.keygen_entropy_bytes(n, r) + 63) // 64)
    u = np.asarray(salsa20.block_words_u64(bw, n, r * n)).reshape(r, n)
    a_exp = np.stack([
        np.asarray(golden.uniform_ref_double(u[i].tolist(), int(q)),
                   dtype=np.uint64) for i, q in enumerate(p.q)])
    _, pk = ctx.keygen()
    np.testing.assert_array_equal(np.asarray(pk[1]), a_exp)
    m = jnp.asarray(np.arange(n, dtype=np.uint64) % p.t)
    out = np.asarray(ctx.roundtrip_check(m))
    np.testing.assert_array_equal(out, np.asarray(m))


@pytest.mark.slow
def test_keystream_pallas_matches_xla():
    """The Pallas keystream generator (used on TPU) is bit-identical to
    the XLA path for every layout case: partial chunks, nonzero nonces,
    counter offsets, both fixed keys."""
    for nb, nonce, c0 in ((7, 0, 0), (1024, 0, 0), (2050, 12345, 77),
                          (64, (1 << 63) + 5, (1 << 40) + 3)):
        for kb in (salsa20.DEFAULT_KEY_BYTE, salsa20.STREAM_KEY_BYTE):
            ref = np.asarray(salsa20.keystream_block_words(
                nb, key_byte=kb, nonce=nonce, counter0=c0, impl="xla"))
            got = np.asarray(salsa20.keystream_block_words(
                nb, key_byte=kb, nonce=nonce, counter0=c0,
                impl="pallas-interpret"))
            np.testing.assert_array_equal(got, ref)
