"""Native C++ host-math runtime vs the pure-Python reference implementations.

The native layer (ntt_cuda_tpu/native/ntt_host.cpp) is the TPU-native
equivalent of the reference's host-side C++ (uint128.h, helper.h,
parameter.h precompute, distributions.cuh Salsa20); every entry point must
be bit-identical to the exact-integer Python versions it accelerates.
"""

import numpy as np
import pytest

from ntt_cuda_tpu import native
from ntt_cuda_tpu.params import get_params
from ntt_cuda_tpu.utils import golden, hostmath as hm

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_scalar_ops(rng):
    lib = native.load()
    q = get_params(4096)[0]
    for _ in range(200):
        a = int(rng.integers(0, q))
        b = int(rng.integers(0, q))
        e = int(rng.integers(0, 1 << 62))
        assert lib.nh_mulmod(a, b, q) == (a * b) % q
        assert lib.nh_modpow(a, e, q) == pow(a, e, q)
        assert lib.nh_shoup(a, q) == (a << 64) // q
    a = int(rng.integers(1, q))
    assert lib.nh_modinv(a, q) == hm.modinv(a, q)
    assert lib.nh_bitrev(0b1011, 4) == hm.bit_reverse(0b1011, 4)
    qbit = hm.q_bit_length(q)
    assert lib.nh_barrett_mu(q, qbit) == hm.mu_barrett(q, qbit)


def test_fill_bitrev_powers_matches_psi_tables():
    n = 2048
    q, psi, psiinv, _, _ = get_params(n)
    logn = n.bit_length() - 1
    expect = [pow(psi, hm.bit_reverse(i, logn), q) for i in range(n)]
    got = native.fill_bitrev_powers(psi, q, n)
    assert [int(x) for x in got] == expect


def test_geometric_row():
    q = get_params(2048)[0]
    g = 123456789
    got = native.geometric_row(g, q, 64)
    v = 1
    for i in range(64):
        assert int(got[i]) == v
        v = (v * g) % q


def test_shoup_planes(rng):
    q = get_params(4096)[0]
    vals = rng.integers(0, q, (5, 128), dtype=np.uint64)
    planes = native.shoup_planes(vals, q)
    assert planes.shape == (4, 5, 128)
    w = planes[0].astype(np.uint64) | (planes[1].astype(np.uint64) << 32)
    wp = planes[2].astype(np.uint64) | (planes[3].astype(np.uint64) << 32)
    np.testing.assert_array_equal(w, vals)
    for i in range(5):
        for j in range(0, 128, 17):
            assert int(wp[i, j]) == (int(vals[i, j]) << 64) // q


def test_schoolbook_negacyclic_matches_python(rng):
    n = 256
    q = get_params(2048)[0]
    a = rng.integers(0, q, n, dtype=np.uint64)
    b = rng.integers(0, q, n, dtype=np.uint64)
    got = native.schoolbook_negacyclic(a, b, q)
    # bypass the native fast path inside golden by computing inline
    c = [0] * (2 * n)
    for i in range(n):
        for j in range(n):
            c[i + j] = (c[i + j] + int(a[i]) * int(b[j])) % q
    expect = [(c[i] - c[i + n]) % q for i in range(n)]
    assert [int(x) for x in got] == expect


def test_salsa20_keystream_matches_golden():
    # reference fixed key: 32 bytes of 0x01, zero nonce
    # (distributions.cuh:261-262)
    nbytes = 64 * 7 + 16
    expect = golden.salsa20_keystream(nbytes).tobytes()[:nbytes]
    got = native.salsa20_keystream(b"\x01" * 32, b"\x00" * 8, nbytes)
    assert got == expect
