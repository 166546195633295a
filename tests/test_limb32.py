"""u32-limb arithmetic vs Python ints (the Pallas kernel dialect)."""

import numpy as np
import jax.numpy as jnp

from ntt_cuda_tpu.ops import limb32


def _pairs(rng, k, lim=1 << 64):
    v = rng.integers(0, lim, k, dtype=np.uint64)
    return v, limb32.to_pair(jnp.asarray(v))


def test_mul32_wide(rng):
    a = rng.integers(0, 1 << 32, 4096, dtype=np.uint32)
    b = rng.integers(0, 1 << 32, 4096, dtype=np.uint32)
    lo, hi = limb32.mul32_wide(jnp.asarray(a), jnp.asarray(b))
    prod = a.astype(np.uint64) * b.astype(np.uint64)
    np.testing.assert_array_equal(np.asarray(lo), (prod & 0xFFFFFFFF).astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(hi), (prod >> 32).astype(np.uint32))


def test_mul64_lo_hi(rng):
    av, ap = _pairs(rng, 4096)
    bv, bp = _pairs(rng, 4096)
    lo = limb32.from_pair(limb32.mullo64(ap, bp))
    hi = limb32.from_pair(limb32.mulhi64(ap, bp))
    exp_lo = np.array([(int(x) * int(y)) & ((1 << 64) - 1) for x, y in zip(av, bv)], dtype=np.uint64)
    exp_hi = np.array([(int(x) * int(y)) >> 64 for x, y in zip(av, bv)], dtype=np.uint64)
    np.testing.assert_array_equal(np.asarray(lo), exp_lo)
    np.testing.assert_array_equal(np.asarray(hi), exp_hi)


def test_add_sub_cmp(rng):
    av, ap = _pairs(rng, 4096)
    bv, bp = _pairs(rng, 4096)
    m = (1 << 64) - 1
    np.testing.assert_array_equal(
        np.asarray(limb32.from_pair(limb32.add64(ap, bp))),
        np.array([(int(x) + int(y)) & m for x, y in zip(av, bv)], dtype=np.uint64))
    np.testing.assert_array_equal(
        np.asarray(limb32.from_pair(limb32.sub64(ap, bp))),
        np.array([(int(x) - int(y)) & m for x, y in zip(av, bv)], dtype=np.uint64))
    np.testing.assert_array_equal(
        np.asarray(limb32.geq64(ap, bp)), av >= bv)


def test_shoup_mulmod_lazy(rng):
    for q in (68719403009, 36028797017456641, 2305843009213683713):
        w = rng.integers(0, q, 2048, dtype=np.uint64)
        v = rng.integers(0, 2 * q, 2048, dtype=np.uint64)  # lazy-domain inputs
        wp = np.array([(int(x) << 64) // q for x in w], dtype=np.uint64)
        t = limb32.from_pair(limb32.shoup_mulmod_lazy(
            limb32.to_pair(jnp.asarray(v)), limb32.to_pair(jnp.asarray(w)),
            limb32.to_pair(jnp.asarray(wp)), limb32.to_pair(jnp.uint64(q))))
        t = np.asarray(t)
        exp = np.array([(int(x) * int(y)) % q for x, y in zip(v, w)], dtype=np.uint64)
        assert (t < 2 * q).all()
        np.testing.assert_array_equal(t % q, exp)


def test_halve_lazy(rng):
    q = 36028797017456641
    q2 = (q + 1) >> 1
    x = rng.integers(0, 2 * q, 2048, dtype=np.uint64)
    h = np.asarray(limb32.from_pair(limb32.halve_mod64(
        limb32.to_pair(jnp.asarray(x)), limb32.to_pair(jnp.uint64(q2)))))
    inv2 = pow(2, q - 2, q)
    exp = np.array([(int(v) * inv2) % q for v in x], dtype=np.uint64)
    assert (h < 2 * q).all()
    np.testing.assert_array_equal(h % q, exp)


def test_reduce_once(rng):
    q = 68719403009
    x = rng.integers(0, 2 * q, 2048, dtype=np.uint64)
    r = np.asarray(limb32.from_pair(limb32.reduce_once(
        limb32.to_pair(jnp.asarray(x)), limb32.to_pair(jnp.uint64(q)))))
    np.testing.assert_array_equal(r, x % q)


def test_shoup_mulmod_lazy4(rng):
    """Loose-mulhi Shoup: result ≡ v*w (mod q), < 3q (documented < 4q),
    and mulhi64_loose underestimates the exact high half by at most 1."""
    q = (1 << 60) - 93  # close to the largest supported modulus size
    for _ in range(5):
        v = rng.integers(0, 1 << 64, 4096, dtype=np.uint64)
        w_s = int(rng.integers(0, q, dtype=np.uint64))
        wp_s = (w_s << 64) // q
        w = limb32.to_pair(jnp.full(v.shape, np.uint64(w_s)))
        wp = limb32.to_pair(jnp.full(v.shape, np.uint64(wp_s)))
        qp = limb32.to_pair(jnp.full(v.shape, np.uint64(q)))
        vv = limb32.to_pair(jnp.asarray(v))
        t = np.asarray(limb32.from_pair(
            limb32.shoup_mulmod_lazy4(vv, w, wp, qp)))
        for ti, vi in zip(t[:512], v[:512]):
            assert int(ti) % q == (int(vi) * w_s) % q
            assert int(ti) < 3 * q
        h_exact = np.asarray(limb32.from_pair(limb32.mulhi64(vv, wp)))
        h_loose = np.asarray(limb32.from_pair(limb32.mulhi64_loose(vv, wp)))
        d = h_exact - h_loose
        assert (d <= 1).all() and (d >= 0).all()
