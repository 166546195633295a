"""64-bit modular arithmetic as u32 limb pairs — the Pallas-kernel dialect.

Mosaic (the Pallas TPU compiler) vectorizes 32-bit lanes natively; these
helpers express the 60-bit arithmetic as pairs of u32 arrays with explicit
carries, the role the reference's inline PTX plays (mul64/sub128,
uint128.h:343-373).  All functions are pure jnp on u32 operands so they
work identically inside Pallas kernels, in interpret mode, and in plain
XLA (which is how they are unit-tested against Python ints).

Multiplication strategy: Shoup's precomputed-quotient multiply
(w' = floor(w * 2^64 / q) stored per twiddle) with Harvey-style lazy
[0, 2q) representatives between butterfly stages — 28 lane-multiplies per
modular multiply vs ~52 for limb Montgomery.  Final results are
normalized to [0, q), making every output bit-identical to the
reference's Barrett pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32
def mul32_wide(a, b):
    """(lo, hi) of the 32x32->64 product, via 16-bit half products."""
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    mid = (ll >> 16) + (lh & 0xFFFF) + (hl & 0xFFFF)  # < 3*2^16: no overflow
    lo = (ll & 0xFFFF) | (mid << 16)
    hi = a1 * b1 + (lh >> 16) + (hl >> 16) + (mid >> 16)
    return lo, hi


def mullo64(a, b):
    """Low 64 bits of a*b; a = (a0, a1), b = (b0, b1) u32 limb pairs."""
    a0, a1 = a
    b0, b1 = b
    lo, hi = mul32_wide(a0, b0)
    hi = hi + a0 * b1 + a1 * b0  # wrapping mod 2^32 is correct here
    return lo, hi


def mulhi64(a, b):
    """High 64 bits of the 128-bit product a*b."""
    a0, a1 = a
    b0, b1 = b
    p00l, p00h = mul32_wide(a0, b0)
    p01l, p01h = mul32_wide(a0, b1)
    p10l, p10h = mul32_wide(a1, b0)
    p11l, p11h = mul32_wide(a1, b1)
    # bits 32..63 with carries out
    s1 = p00h + p01l
    c1 = (s1 < p01l).astype(U32)
    s2 = s1 + p10l
    c2 = (s2 < p10l).astype(U32)
    # bits 64..95
    h0 = p11l + p01h
    c3 = (h0 < p01h).astype(U32)
    h0b = h0 + p10h
    c4 = (h0b < p10h).astype(U32)
    h0c = h0b + c1 + c2
    c5 = (h0c < h0b).astype(U32)  # c1+c2 <= 2: single carry possible
    # bits 96..127
    h1 = p11h + c3 + c4 + c5
    return h0c, h1


def add64(a, b):
    a0, a1 = a
    b0, b1 = b
    r0 = a0 + b0
    c = (r0 < b0).astype(U32)
    return r0, a1 + b1 + c


def sub64(a, b):
    a0, a1 = a
    b0, b1 = b
    r0 = a0 - b0
    brw = (a0 < b0).astype(U32)
    return r0, a1 - b1 - brw


def geq64(a, b):
    a0, a1 = a
    b0, b1 = b
    return (a1 > b1) | ((a1 == b1) & (a0 >= b0))


def gt64(a, b):
    a0, a1 = a
    b0, b1 = b
    return (a1 > b1) | ((a1 == b1) & (a0 > b0))


def lt64(a, b):
    return ~geq64(a, b)


def select64(pred, a, b):
    return (jnp.where(pred, a[0], b[0]), jnp.where(pred, a[1], b[1]))


def cond_sub64(a, m, pred):
    """a - m where pred else a."""
    d = sub64(a, m)
    return select64(pred, d, a)


def reduce_once(a, m):
    """a mod-ish: subtract m if a >= m (single conditional correction)."""
    return cond_sub64(a, m, geq64(a, m))


def halve_mod64(x, q2):
    """x * 2^-1 mod q for x in [0, 2q): (x >> 1) + q2 * (x & 1) with
    q2 = (q+1)/2 (the reference's GS lazy halving, ntt_60bit.cuh:166)."""
    x0, x1 = x
    odd = x0 & 1
    r0 = (x0 >> 1) | (x1 << 31)
    r1 = x1 >> 1
    return select64(odd == 1, add64((r0, r1), q2), (r0, r1))


def mont_mul_lazy(a, b, q, qinv_neg):
    """a * b * 2^-64 mod q in [0, 2q), Montgomery (REDC) on limb pairs.

    a < 2q, b < q, q < 2^62; qinv_neg = -q^-1 mod 2^64.  Used for dyadic
    (data x data) products where neither operand has a precomputed Shoup
    quotient; the 2^-64 skew is folded into the consumer's twiddle tables
    (see ntt_pallas tcir).  t = (a*b + m*q) / 2^64, m = (a*b mod 2^64) *
    qinv_neg mod 2^64; the discarded low half is 0 or exactly 2^64, so the
    carry into the high half is (lo(a*b) != 0)."""
    lo_ab = mullo64(a, b)
    hi_ab = mulhi64(a, b)
    m = mullo64(lo_ab, qinv_neg)
    hi_mq = mulhi64(m, q)
    carry = ((lo_ab[0] | lo_ab[1]) != 0).astype(U32)
    return add64(add64(hi_ab, hi_mq), (carry, jnp.zeros_like(carry)))


def mulhi64_loose(a, b):
    """floor(a*b / 2^64) - {0 or 1}: the a0*b0 partial product dropped.

    a0*b0 only reaches bit 64 through the carry of the bits-32..63 sum,
    and contributes at most +1 there — so this underestimates the exact
    high half by at most 1, using 12 of mulhi64's 16 lane-multiplies.
    Exclusively for shoup_mulmod_lazy4's widened-domain reduction."""
    a0, a1 = a
    b0, b1 = b
    p01l, p01h = mul32_wide(a0, b1)
    p10l, p10h = mul32_wide(a1, b0)
    p11l, p11h = mul32_wide(a1, b1)
    s = p01l + p10l
    c = (s < p10l).astype(U32)
    h0 = p11l + p01h
    c3 = (h0 < p01h).astype(U32)
    h0b = h0 + p10h
    c4 = (h0b < p10h).astype(U32)
    h0c = h0b + c
    c5 = (h0c < h0b).astype(U32)
    return h0c, p11h + c3 + c4 + c5


def shoup_mulmod_lazy4(v, w, wp, q):
    """v * w mod q in [0, 4q) — Shoup with the approximate (loose) mulhi.

    Exact Shoup gives t = v*w - floor(v*wp/2^64)*q in [0, 2q) for any
    u64 v; the loose mulhi underestimates the quotient by <= 1, adding
    at most one more q: t in [0, 3q) ⊂ [0, 4q).  Kernels using this keep
    lazy representatives in [0, 4q) (all butterflies < 8q < 2^64 for
    q < 2^61 — every supported family) and normalize with two conditional
    subtracts at the end.  24 lane-multiplies vs 28 for the exact form."""
    h = mulhi64_loose(v, wp)
    return sub64(mullo64(v, w), mullo64(h, q))


def shoup_mulmod_lazy(v, w, wp, q):
    """v * w mod q in [0, 2q), Shoup/Harvey: w < q fixed,
    wp = floor(w * 2^64 / q), v any u64.

    t = (w*v mod 2^64) - (floor(wp*v / 2^64) * q mod 2^64), computed mod
    2^64; the true value lies in [0, 2q) so the wrapped subtraction is
    exact."""
    h = mulhi64(v, wp)
    return sub64(mullo64(v, w), mullo64(h, q))


def to_pair(x64):
    """Split a (..., ) u64 array into (lo, hi) u32 arrays."""
    m = jnp.uint64(0xFFFFFFFF)
    return ((x64 & m).astype(U32), (x64 >> jnp.uint64(32)).astype(U32))


def from_pair(p):
    lo, hi = p
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))
