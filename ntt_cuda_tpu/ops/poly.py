"""Polynomial / RNS arithmetic layer (the reference's poly_arithmetic.cuh).

Elementwise ops over (..., r, n) residue tensors plus the two genuinely
cross-residue steps of BFV — the last-modulus divide-and-round (needs the
last residue broadcast to all others) and the BEHZ fast base conversion
(a reduction over the RNS axis).  On a sharded mesh those two become a
broadcast and a psum over the 'rns' axis (see parallel/sharded.py); here
they are plain indexing/reductions inside one jit.

All per-modulus constants arrive Montgomery-scaled where they multiply
residues, so each scalar multiply is one REDC (exact mod q).  The
reference's representative-value quirks (`>` instead of `>=` in adds) are
preserved bit-for-bit — the embedded golden ciphertext exercises them.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import hostmath as hm
from . import modmath
from .modmath import ModulusSet

U64 = jnp.uint64


def poly_add(a, b, ms: ModulusSet):
    """c = a + b mod q with the reference's `>` quirk (poly_add_xq,
    bfv_encryption.cuh:180-191)."""
    return modmath.add_mod_lazy_gt(a, b, ms.q)


def poly_add_negate(a, b, ms: ModulusSet):
    """c = -(a + b) mod q (poly_add_negate_xq, bfv_keygen.cuh:81-93)."""
    return modmath.add_negate_mod(a, b, ms.q)


def poly_negate(a, ms: ModulusSet):
    return modmath.negate_mod(a, ms.q)


def poly_add_scalar(a, c, ms: ModulusSet):
    """a + c mod q for a scalar (or (r, 1) per-modulus) addend in [0, q)
    (poly_add_integer, poly_arithmetic.cuh:155-165; the +floor(q_last/2)
    step of the modulus drop uses this shape)."""
    c = jnp.asarray(c, U64)
    s = a + c
    return s - ms.q * (s >= ms.q).astype(U64)


def poly_sub(a, b, ms: ModulusSet):
    """c = a - b mod q.

    The reference's poly_sub kernel is buggy (it never subtracts b, only
    conditionally adds q; poly_arithmetic.cuh:167-178) and is unused by
    its active pipeline.  This is the *correct* subtraction the API
    implies, not a replication of the bug."""
    d = a - b
    return jnp.where(a >= b, d, d + ms.q)


def poly_mul_scalar_mont(a, c_mont, ms: ModulusSet):
    """a * c mod q with Montgomery-scaled per-modulus scalar c (r, 1)
    (poly_mul_int_xq_*, bfv_decryption.cuh:25-57)."""
    return modmath.mont_mul(a, c_mont, ms.q, ms.qinv_neg)


def poly_mul_scalar_mod_t(a, c: int, t: int):
    """(a * c) & (t-1): mod_t kernel (poly_arithmetic.cuh:128-141),
    t a power of two, low-64 product."""
    return (a * U64(c)) & U64(t - 1)


# ---------------------------------------------------------------------------
# Last-modulus divide-and-round (SEAL-style modulus drop).
# ---------------------------------------------------------------------------

@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["half", "half_mod", "inv_q_last_mont"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class DivideRoundConsts:
    half: jax.Array            # () floor(q_last/2)
    half_mod: jax.Array        # (r-1, 1) half mod q_i
    inv_q_last_mont: jax.Array  # (r-1, 1) (q_last mod q_i)^-1 * R mod q_i

    @staticmethod
    def build(params) -> "DivideRoundConsts":
        col = lambda v: np.array(v, dtype=np.uint64).reshape(-1, 1)
        inv_m = [hm.to_mont(x, qi) for x, qi in zip(params.inv_q_last_mod_q, params.q[:-1])]
        return DivideRoundConsts(
            half=jnp.uint64(params.half_last_modulus),
            half_mod=jnp.asarray(col(params.half_mod_q)),
            inv_q_last_mont=jnp.asarray(col(inv_m)),
        )


def divide_and_round_q_last(c, params_c: DivideRoundConsts, ms: ModulusSet,
                            ms_last: ModulusSet):
    """Drop the last RNS modulus of a (..., r, n) tensor -> (..., r-1, n).

    Exact semantics of divide_and_round_q_last_inplace_add_x2 +
    _loop_xq (bfv_encryption.cuh:111-178):
      last += half (mod q_last);
      for i < r-1: tmp = (last mod q_i) -_safe half_mod_i;
                   c_i = (c_i -_safe tmp) * inv_q_last_mod_q_i  mod q_i.

    `ms` covers the first r-1 moduli; `ms_last` the dropped one.
    """
    last = c[..., -1:, :]
    qlast = ms_last.q  # (1, 1)
    ra = last + params_c.half
    ra = ra - qlast * (ra >= qlast).astype(U64)
    rest = c[..., :-1, :]
    tmp = modmath.mod_u64(ra, ms.q, ms.nu)  # broadcast (.., 1, n) vs (r-1, 1)
    tmp = tmp + ms.q * (tmp < params_c.half_mod).astype(U64) - params_c.half_mod
    v = rest + ms.q * (rest < tmp).astype(U64) - tmp
    return modmath.mont_mul(v, params_c.inv_q_last_mont, ms.q, ms.qinv_neg)


# ---------------------------------------------------------------------------
# Delta*m + fix message embedding ("weird_m_stuff").
# ---------------------------------------------------------------------------

@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["qi_div_t", "nu", "q"],
    meta_fields=["t"],
)
@dataclasses.dataclass(frozen=True)
class MessageConsts:
    qi_div_t: jax.Array  # (r-1, 1)
    nu: jax.Array        # (r-1, 1) floor(2^64/q_i) for the runtime mod
    q: jax.Array         # (r-1, 1)
    t: int

    @staticmethod
    def build(params) -> "MessageConsts":
        col = lambda v: np.array(v, dtype=np.uint64).reshape(-1, 1)
        qs = params.q[:-1]
        return MessageConsts(
            qi_div_t=jnp.asarray(col(params.qi_div_t[: params.r - 1])),
            nu=jnp.asarray(col([(1 << 64) // qi for qi in qs])),
            q=jnp.asarray(col(qs)),
            t=params.t,
        )


def add_message(c0, m_poly, mc: MessageConsts):
    """c0_i += Delta_i * m + fix, mod q_i (weird_m_stuff,
    bfv_encryption.cuh:193-213; assumes q === 1 mod t, t power of two).

    c0: (r-1, n); m_poly: (n,) in [0, t).  The u64 sum stays < 2^62, and
    the reference's `% q` is a full reduction (sum < 2q, but we use the
    general mulhi reduction for exactness)."""
    t = mc.t
    m = m_poly.astype(U64)
    fix = (m + U64((t + 1) >> 1)) // U64(t)
    v = c0 + m * mc.qi_div_t + fix
    return modmath.mod_u64(v, mc.q, mc.nu)


def sub_message(c0, m_poly, mc: MessageConsts):
    """c0_i -= Delta_i * m + fix, mod q_i — the exact inverse of
    add_message (SEAL's sub_plain; no reference counterpart)."""
    t = mc.t
    m = m_poly.astype(U64)
    fix = (m + U64((t + 1) >> 1)) // U64(t)
    d = modmath.mod_u64(m * mc.qi_div_t + fix, mc.q, mc.nu)
    return modmath.sub_mod(c0, d, mc.q)


# ---------------------------------------------------------------------------
# BEHZ fast base conversion {q_i} -> {t, gamma} + decryption rounding.
# ---------------------------------------------------------------------------

@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["prod_t_gamma_mont", "inv_punctured_mont", "bcm_t", "bcm_g_mont",
                 "gamma", "gamma_qinv_neg", "gamma_div_2", "neg_g_mont",
                 "bcm_t_mont", "t_qinv_neg", "neg_t_mont", "nu_t",
                 "inv_gamma_t_mont"],
    meta_fields=["t", "neg_t"],
)
@dataclasses.dataclass(frozen=True)
class DecryptConsts:
    prod_t_gamma_mont: jax.Array   # (r-1, 1) t*gamma mod q_i, Mont
    inv_punctured_mont: jax.Array  # (r-1, 1) (prod_{j!=i} q_j)^-1 mod q_i, Mont
    bcm_t: jax.Array               # (r-1, 1) prod_{k!=j} q_k mod t (plain)
    bcm_g_mont: jax.Array          # (r-1, 1) prod_{k!=j} q_k mod gamma, Mont(gamma)
    gamma: jax.Array               # () u64
    gamma_qinv_neg: jax.Array      # () -gamma^-1 mod 2^64
    gamma_div_2: jax.Array         # ()
    neg_g_mont: jax.Array          # () (-1/prod q)^-1... neg_inv_q mod gamma, Mont(gamma)
    # general-t (odd plaintext modulus) channel: Montgomery mod-t
    # arithmetic replaces the reference's power-of-two mask tricks;
    # zeros when t is even (the masked path is used instead)
    bcm_t_mont: jax.Array          # (r-1, 1) bcm_t * R mod t
    t_qinv_neg: jax.Array          # () -t^-1 mod 2^64 (t odd only)
    neg_t_mont: jax.Array          # () neg_t * R mod t
    nu_t: jax.Array                # () floor(2^64 / t)
    inv_gamma_t_mont: jax.Array    # () (gamma mod t)^-1 * R mod t — the
    # final gamma-undo; the reference skips it because its gamma === 1
    # mod its power-of-two t (2^61 - 10239 === 1 mod 1024)
    t: int
    neg_t: int                     # neg_inv_q mod t (plain, multiplies under mask)

    @staticmethod
    def build(params) -> "DecryptConsts":
        col = lambda v: np.array(v, dtype=np.uint64).reshape(-1, 1)
        qs = params.q[:-1]
        g = params.gamma
        t = params.t
        bcm_t, bcm_g = params.base_change_matrix
        neg_t, neg_g = params.neg_inv_q_mod_t_gamma
        odd = t % 2 == 1
        return DecryptConsts(
            bcm_t_mont=jnp.asarray(col(
                [hm.to_mont(x, t) for x in bcm_t] if odd
                else [0] * len(qs))),
            t_qinv_neg=jnp.uint64(hm.mont_qinv_neg(t) if odd else 0),
            neg_t_mont=jnp.uint64(hm.to_mont(neg_t, t) if odd else 0),
            nu_t=jnp.uint64((1 << 64) // t),
            inv_gamma_t_mont=jnp.uint64(
                hm.to_mont(pow(g % t, -1, t), t) if odd else 0),
            prod_t_gamma_mont=jnp.asarray(col(
                [hm.to_mont(x, qi) for x, qi in zip(params.prod_t_gamma_mod_q, qs)])),
            inv_punctured_mont=jnp.asarray(col(
                [hm.to_mont(x, qi) for x, qi in zip(params.inv_punctured_q, qs)])),
            bcm_t=jnp.asarray(col(bcm_t)),
            bcm_g_mont=jnp.asarray(col([hm.to_mont(x, g) for x in bcm_g])),
            gamma=jnp.uint64(g),
            gamma_qinv_neg=jnp.uint64(hm.mont_qinv_neg(g)),
            gamma_div_2=jnp.uint64(params.gamma_div_2),
            neg_g_mont=jnp.uint64(hm.to_mont(neg_g, g)),
            t=params.t,
            neg_t=neg_t,
        )


def fast_convert_and_round(c1, dc: DecryptConsts):
    """(r-1, n) residues (already * prod_t_gamma * inv_punctured) ->
    (n,) plaintext in [0, t).

    fast_convert_array_kernel_t / _gamma (poly_arithmetic.cuh:217-251):
      x_t = (sum_i (c1_i * bcm_t_i mod 2^64) & (t-1)) & (t-1)
      x_g = sum_i (c1_i * bcm_g_i mod gamma)  mod gamma
    then poly_mul_int_t / poly_mul_int and dec_round (:253-263).

    The t-row masked partials are < t each, so their plain sum fits u64 for
    any r (matches the reference's unmasked running sum).  The gamma-row
    partials are < gamma < 2^61; we reduce pairwise with add_mod, which
    equals the reference's per-step `% gamma` chain exactly.
    """
    pow2_t = dc.t & (dc.t - 1) == 0
    if pow2_t:
        mask = U64(dc.t - 1)
        part_t = (c1 * dc.bcm_t) & mask
        x_t = jnp.sum(part_t, axis=-2) & mask
        x_t = (x_t * U64(dc.neg_t)) & mask
    else:
        # odd t (batching prime): exact Montgomery mod-t arithmetic in
        # place of the reference's power-of-two masks (same math — for
        # t | 2^64 the masked forms ARE mod t)
        tt, tqi = U64(dc.t), dc.t_qinv_neg
        part_t = modmath.mont_mul(c1, dc.bcm_t_mont, tt, tqi)
        x_t = part_t[..., 0, :]
        for i in range(1, part_t.shape[-2]):
            x_t = modmath.add_mod(x_t, part_t[..., i, :], tt)
        x_t = modmath.mont_mul(x_t, dc.neg_t_mont, tt, tqi)

    part_g = modmath.mont_mul(c1, dc.bcm_g_mont, dc.gamma, dc.gamma_qinv_neg)

    def _acc(carry, row):
        return modmath.add_mod(carry, row, dc.gamma), None

    # exact modular sum over the RNS axis (values < gamma < 2^61: no overflow)
    x_g = part_g[..., 0, :]
    for i in range(1, part_g.shape[-2]):
        x_g = modmath.add_mod(x_g, part_g[..., i, :], dc.gamma)
    x_g = modmath.mont_mul(x_g, dc.neg_g_mont, dc.gamma, dc.gamma_qinv_neg)

    # dec_round_kernel: `> gamma/2` (strict) branch
    if pow2_t:
        corr = jnp.where(x_g > dc.gamma_div_2,
                         x_t + (dc.gamma - x_g), x_t - x_g)
        return corr & mask
    tt = U64(dc.t)
    plus = modmath.add_mod(
        x_t, modmath.mod_u64(dc.gamma - x_g, tt, dc.nu_t), tt)
    minus = modmath.sub_mod(x_t, modmath.mod_u64(x_g, tt, dc.nu_t), tt)
    corr = jnp.where(x_g > dc.gamma_div_2, plus, minus)
    # the rounded value is gamma*m mod t: undo gamma (trivial for the
    # reference's gamma === 1 mod t; required for batching primes)
    return modmath.mont_mul(corr, dc.inv_gamma_t_mont, tt, dc.t_qinv_neg)


# ---------------------------------------------------------------------------
# Galois automorphisms a(x) -> a(x^g) mod x^n + 1 (beyond the reference:
# the SEAL evaluator's apply_galois, needed for rotation-style homomorphic
# computation; the reference stops at encrypt/decrypt).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def galois_maps(n: int, g: int) -> tuple[np.ndarray, np.ndarray]:
    """(perm, neg) for the automorphism tau_g: out[j] = ±a[perm[j]].

    For output index j the unique source i in [0, n) with i*g === j or
    j + n (mod 2n) is i0 mod n where i0 = j * g^-1 mod 2n; the negacyclic
    wraparound sign is negative iff i0 >= n.  g must be odd (the Galois
    group of the 2n-th cyclotomic field), 0 < g < 2n."""
    if not (0 < g < 2 * n) or g % 2 == 0:
        raise ValueError(f"galois element must be odd in (0, {2 * n}), "
                         f"got {g}")
    ginv = pow(g, -1, 2 * n)
    i0 = (np.arange(n, dtype=np.int64) * ginv) % (2 * n)
    return (i0 % n).astype(np.int32), i0 >= n


def galois_apply(x, perm, neg, ms: ModulusSet):
    """Apply tau_g to (..., r, n) residue tensors: one gather on the
    coefficient axis plus a conditional modular negate."""
    y = x[..., perm]
    return jnp.where(neg, modmath.negate_mod(y, ms.q), y)
