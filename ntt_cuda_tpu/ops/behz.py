"""BEHZ RNS machinery for homomorphic multiplication (EvalMult).

The reference stops at keygen/encrypt/decrypt; its only base-conversion
code is decryption's q -> {t, gamma} step (fast_convert_array_kernels,
poly_arithmetic.cuh:217-251).  This module generalizes that same
fast-base-conversion primitive into the full BEHZ multiplication pipeline
(Bajard-Eynard-Hasan-Zucca 2016, the RNS variant Microsoft SEAL 3.5 ships
as its BFV evaluator) so ciphertext-by-ciphertext multiplication works
without ever leaving RNS form:

  1. `rns_to_bsk`  — extend each ciphertext component from base q to the
     auxiliary base Bsk = B ∪ {m_sk}, exactly (no q-overflows), via the
     m_tilde Montgomery trick (multiply by m_tilde mod q, fast-convert,
     then a small Montgomery reduction `sm_mrq` removes the conversion
     overflow).
  2. tensor product in NTT form over BOTH bases (q and Bsk) — the
     combined modulus q*prod(Bsk) is large enough to hold the integer
     product coefficients.
  3. `fast_floor`  — scale by t/q: multiply by t in both bases, then
     floor-divide by q (subtract the q-residues' fast conversion and
     multiply by q^-1 in Bsk; error <= k absorbed by noise).
  4. `bsk_to_q`    — Shenoy-Kumaresan exact conversion back to base q,
     using m_sk to recover (and sign-correct) the B-overflow.

All arithmetic is the exact mod-q Montgomery arithmetic of ops/modmath.py;
per-modulus constants are Montgomery-scaled once at build time, so every
scalar multiply on device is a single REDC.  Base-conversion inner
products unroll over the (<= 16) source moduli with `mont_mul` terms and
exact modular accumulation.

Shapes: base-q tensors are (..., k, n) with k = r-1 (ciphertexts live in
the dropped base); Bsk tensors are (..., k+1, n).  Leading batch dims
broadcast through every function.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import hostmath as hm
from ..utils import primegen
from . import modmath
from .modmath import ModulusSet

U64 = jnp.uint64
_M32 = (1 << 32) - 1
M_TILDE = 1 << 32  # power of two: mod-m_tilde arithmetic is a mask


# ---------------------------------------------------------------------------
# Auxiliary base construction (host, exact ints).
# ---------------------------------------------------------------------------

AUX_BITS = 60  # < 2^61: satisfies every device-kernel headroom bound


@dataclasses.dataclass(frozen=True)
class AuxBase:
    """The auxiliary RNS base for one BFV parameter set: k 60-bit primes
    B = {b_0..b_{k-1}} plus one more (m_sk), all NTT-friendly for ring
    degree n, all distinct from the ciphertext moduli.  Deterministic:
    scanned downward from 2^AUX_BITS (like SEAL's internal prime pool)."""

    b: tuple[int, ...]        # k primes
    b_psi: tuple[int, ...]
    m_sk: int
    m_sk_psi: int
    m_tilde: int = M_TILDE

    @property
    def bsk(self) -> tuple[int, ...]:
        return self.b + (self.m_sk,)

    @property
    def bsk_psi(self) -> tuple[int, ...]:
        return self.b_psi + (self.m_sk_psi,)

    @staticmethod
    def build(params) -> "AuxBase":
        k = params.r - 1
        primes = primegen.generate_moduli(
            params.n, AUX_BITS, k + 1,
            exclude=set(params.q) | {params.gamma})
        psis = [primegen.find_primitive_2n_root(p, params.n) for p in primes]
        aux = AuxBase(b=tuple(primes[:k]), b_psi=tuple(psis[:k]),
                      m_sk=primes[k], m_sk_psi=psis[k])
        aux.validate(params)
        return aux

    def validate(self, params) -> None:
        """Correctness bounds of the BEHZ pipeline (asserted, not assumed):

        * tensor-product coefficients |c| < 4*n*q^2 (operands in [0, 2q)
          after sm_mrq) must fit the combined base:
          q * prod(Bsk) > 2 * t * 4*n*q^2;
        * the fast_floor output |t*c/q| + k must stay below prod(B)/2 for
          the Shenoy-Kumaresan conversion to be exact;
        * m_tilde must dominate the conversion overflow (< k) by a wide
          margin for sm_mrq's centered correction to be exact.
        """
        k = params.r - 1
        q_prod = 1
        for qi in params.q[:-1]:
            q_prod *= qi
        b_prod = 1
        for bi in self.b:
            b_prod *= bi
        n, t = params.n, params.t
        if b_prod <= 2 * (4 * n * t * q_prod + k + 1):
            raise ValueError("aux base too small for Shenoy-Kumaresan bound")
        if q_prod * b_prod * self.m_sk <= 8 * n * t * q_prod * q_prod:
            raise ValueError("combined base too small for tensor product")
        if self.m_tilde < 4 * (k + 1):
            raise ValueError("m_tilde too small for sm_mrq")


# ---------------------------------------------------------------------------
# Device constant bundle.
# ---------------------------------------------------------------------------


def _col(vals) -> jax.Array:
    return jnp.asarray(np.array([int(v) for v in vals],
                                dtype=np.uint64).reshape(-1, 1))


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["ms_q", "ms_bsk", "ms_b",
                 "mt_mont_q", "inv_punct_q_mont", "bcm_q_bsk_mont",
                 "bcm_q_mt", "neg_inv_q_mt", "prodq_mont_bsk",
                 "inv_mt_mont_bsk", "t_mont_q", "t_mont_bsk",
                 "inv_prodq_mont_bsk", "inv_punct_b_mont", "bcm_b_q_mont",
                 "bcm_b_msk_mont", "inv_prodb_mont_msk", "prodb_mont_q",
                 "msk", "msk_qinv_neg", "msk_half"],
    meta_fields=["k"],
)
@dataclasses.dataclass(frozen=True)
class MultConsts:
    """Montgomery-scaled per-modulus constants for the BEHZ pipeline over
    one (params, aux-base) pair.  The multiplication analog of the
    reference's decrypt-side constant banks (inv_punctured_q_cons /
    base-change matrix, demo.cu:228-264), extended to the q <-> Bsk
    directions."""

    ms_q: ModulusSet          # base q (k moduli — ciphertext base)
    ms_bsk: ModulusSet        # Bsk = B ∪ {m_sk} (k+1)
    ms_b: ModulusSet          # B only (k)

    # --- q -> Bsk ∪ {m_tilde} extension ---
    mt_mont_q: jax.Array        # (k, 1) m_tilde * R mod q_j
    inv_punct_q_mont: jax.Array  # (k, 1) (q/q_j)^-1 * R mod q_j
    bcm_q_bsk_mont: jax.Array   # (k+1, k) (q/q_j mod m) * R mod m
    bcm_q_mt: jax.Array         # (k,) (q/q_j) mod m_tilde (plain)
    neg_inv_q_mt: jax.Array     # () -(prod q)^-1 mod m_tilde (plain)
    prodq_mont_bsk: jax.Array   # (k+1, 1) prod(q) * R mod m
    inv_mt_mont_bsk: jax.Array  # (k+1, 1) m_tilde^-1 * R mod m

    # --- fast_floor (t/q scaling) ---
    t_mont_q: jax.Array         # (k, 1) t * R mod q_j
    t_mont_bsk: jax.Array       # (k+1, 1) t * R mod m
    inv_prodq_mont_bsk: jax.Array  # (k+1, 1) prod(q)^-1 * R mod m

    # --- Shenoy-Kumaresan B -> q ---
    inv_punct_b_mont: jax.Array  # (k, 1) (B/b_j)^-1 * R mod b_j
    bcm_b_q_mont: jax.Array      # (k, k) (B/b_j mod q_i) * R mod q_i
    bcm_b_msk_mont: jax.Array    # (k, 1) (B/b_j mod m_sk) * R mod m_sk
    inv_prodb_mont_msk: jax.Array  # () prod(B)^-1 * R mod m_sk
    prodb_mont_q: jax.Array      # (k, 1) prod(B) * R mod q_i
    msk: jax.Array               # () m_sk
    msk_qinv_neg: jax.Array      # () -m_sk^-1 mod 2^64
    msk_half: jax.Array          # () m_sk >> 1

    k: int

    @staticmethod
    def build(params, aux: AuxBase | None = None) -> "MultConsts":
        aux = aux or AuxBase.build(params)
        k = params.r - 1
        qs = params.q[:-1]
        bsk = aux.bsk
        msk = aux.m_sk
        mt = aux.m_tilde

        q_prod = 1
        for qi in qs:
            q_prod *= qi
        b_prod = 1
        for bi in aux.b:
            b_prod *= bi

        punct_q = [q_prod // qj for qj in qs]          # q/q_j (exact ints)
        punct_b = [b_prod // bj for bj in aux.b]

        bcm_q_bsk = np.array(
            [[hm.to_mont(pj % m, m) for pj in punct_q] for m in bsk],
            dtype=np.uint64)
        bcm_b_q = np.array(
            [[hm.to_mont(pj % qi, qi) for pj in punct_b] for qi in qs],
            dtype=np.uint64)

        return MultConsts(
            ms_q=ModulusSet.from_moduli(qs),
            ms_bsk=ModulusSet.from_moduli(bsk),
            ms_b=ModulusSet.from_moduli(aux.b),
            mt_mont_q=_col([hm.to_mont(mt % qj, qj) for qj in qs]),
            inv_punct_q_mont=_col([hm.to_mont(hm.modinv(pj % qj, qj), qj)
                                   for pj, qj in zip(punct_q, qs)]),
            bcm_q_bsk_mont=jnp.asarray(bcm_q_bsk),
            bcm_q_mt=jnp.asarray(np.array([pj % mt for pj in punct_q],
                                          dtype=np.uint64)),
            neg_inv_q_mt=jnp.uint64((-pow(q_prod, -1, mt)) % mt),
            prodq_mont_bsk=_col([hm.to_mont(q_prod % m, m) for m in bsk]),
            inv_mt_mont_bsk=_col([hm.to_mont(hm.modinv(mt % m, m), m)
                                  for m in bsk]),
            t_mont_q=_col([hm.to_mont(params.t % qj, qj) for qj in qs]),
            t_mont_bsk=_col([hm.to_mont(params.t % m, m) for m in bsk]),
            inv_prodq_mont_bsk=_col([hm.to_mont(hm.modinv(q_prod % m, m), m)
                                     for m in bsk]),
            inv_punct_b_mont=_col([hm.to_mont(hm.modinv(pj % bj, bj), bj)
                                   for pj, bj in zip(punct_b, aux.b)]),
            bcm_b_q_mont=jnp.asarray(bcm_b_q),
            bcm_b_msk_mont=_col([hm.to_mont(pj % msk, msk)
                                 for pj in punct_b]),
            inv_prodb_mont_msk=jnp.uint64(
                hm.to_mont(hm.modinv(b_prod % msk, msk), msk)),
            prodb_mont_q=_col([hm.to_mont(b_prod % qi, qi) for qi in qs]),
            msk=jnp.uint64(msk),
            msk_qinv_neg=jnp.uint64(hm.mont_qinv_neg(msk)),
            msk_half=jnp.uint64(msk >> 1),
            k=k,
        )


# ---------------------------------------------------------------------------
# Base-conversion primitives (device).
# ---------------------------------------------------------------------------


def _conv(xp: jax.Array, bcm_mont: jax.Array, ms_t: ModulusSet) -> jax.Array:
    """Fast base conversion inner product: xp (..., k, n) already scaled
    by the source base's punctured inverses -> (..., kt, n) in the target
    base.  out[m] = sum_j xp_j * (src/src_j mod m)  (mod m), the
    generalization of decryption's fast_convert_array
    (poly_arithmetic.cuh:217-251) to arbitrary target bases."""
    k = xp.shape[-2]
    out = None
    for j in range(k):
        term = modmath.mont_mul(xp[..., j:j + 1, :], bcm_mont[:, j:j + 1],
                                ms_t.q, ms_t.qinv_neg)
        out = term if out is None else modmath.add_mod(out, term, ms_t.q)
    return out


def rns_to_bsk(x: jax.Array, mc: MultConsts) -> jax.Array:
    """Extend x (..., k, n) from base q to Bsk (..., k+1, n), exactly.

    BEHZ steps 1-2: multiply by m_tilde mod q, fast-convert to
    Bsk ∪ {m_tilde}, then sm_mrq (small Montgomery reduction) removes the
    conversion's q-overflow using the m_tilde channel.  The result is
    congruent to x mod q with centered magnitude < 2q (the ±q slack is
    part of the BEHZ noise analysis).  m_tilde = 2^32 is a power of two,
    so its channel is mask arithmetic (like decryption's mod-t row)."""
    qq, qinv = mc.ms_q.q, mc.ms_q.qinv_neg
    z = modmath.mont_mul(x, mc.mt_mont_q, qq, qinv)       # x*m_tilde mod q
    zp = modmath.mont_mul(z, mc.inv_punct_q_mont, qq, qinv)
    y = _conv(zp, mc.bcm_q_bsk_mont, mc.ms_bsk)           # (..., k+1, n)

    # m_tilde channel: products and sum wrap mod 2^64; only the low 32
    # bits are the residue (2^32 | 2^64)
    ymt = jnp.zeros(zp.shape[:-2] + zp.shape[-1:], U64)
    for j in range(mc.k):
        ymt = ymt + zp[..., j, :] * mc.bcm_q_mt[j]
    ymt = ymt & U64(_M32)

    # sm_mrq: r = -Y/q mod m_tilde, centered; out = (Y + r*q) / m_tilde
    r = (ymt * mc.neg_inv_q_mt) & U64(_M32)
    rb = r[..., None, :]
    lift = jnp.where(rb >= U64(M_TILDE // 2),
                     mc.ms_bsk.q - U64(M_TILDE), U64(0))
    temp = rb + lift                                      # centered, mod m
    corr = modmath.mont_mul(temp, mc.prodq_mont_bsk,
                            mc.ms_bsk.q, mc.ms_bsk.qinv_neg)
    s = modmath.add_mod(y, corr, mc.ms_bsk.q)
    return modmath.mont_mul(s, mc.inv_mt_mont_bsk,
                            mc.ms_bsk.q, mc.ms_bsk.qinv_neg)


def fast_floor(xq: jax.Array, xbsk: jax.Array, mc: MultConsts) -> jax.Array:
    """floor(t * x / q) in base Bsk (error in [0, k], absorbed by noise).

    xq (..., k, n) and xbsk (..., k+1, n) are the same value's residues in
    both bases.  Multiplies by t in both, fast-converts the q half into
    Bsk, and divides the difference by q (exact in Bsk: q is invertible
    there)."""
    yq = modmath.mont_mul(xq, mc.t_mont_q, mc.ms_q.q, mc.ms_q.qinv_neg)
    yb = modmath.mont_mul(xbsk, mc.t_mont_bsk,
                          mc.ms_bsk.q, mc.ms_bsk.qinv_neg)
    zp = modmath.mont_mul(yq, mc.inv_punct_q_mont,
                          mc.ms_q.q, mc.ms_q.qinv_neg)
    conv = _conv(zp, mc.bcm_q_bsk_mont, mc.ms_bsk)
    diff = modmath.sub_mod(yb, conv, mc.ms_bsk.q)
    return modmath.mont_mul(diff, mc.inv_prodq_mont_bsk,
                            mc.ms_bsk.q, mc.ms_bsk.qinv_neg)


def bsk_to_q(x: jax.Array, mc: MultConsts) -> jax.Array:
    """Shenoy-Kumaresan exact conversion (..., k+1, n) in Bsk ->
    (..., k, n) in q, for values with centered magnitude < prod(B)/2
    (AuxBase.validate guarantees the pipeline's values qualify).  The
    m_sk channel recovers the B-conversion overflow exactly, including
    its sign (the centered branch on alpha)."""
    k = mc.k
    xb = x[..., :k, :]
    xm = x[..., k, :]
    xp = modmath.mont_mul(xb, mc.inv_punct_b_mont,
                          mc.ms_b.q, mc.ms_b.qinv_neg)
    cq = _conv(xp, mc.bcm_b_q_mont, mc.ms_q)

    cm = None
    for j in range(k):
        term = modmath.mont_mul(xp[..., j, :], mc.bcm_b_msk_mont[j, 0],
                                mc.msk, mc.msk_qinv_neg)
        cm = term if cm is None else modmath.add_mod(cm, term, mc.msk)
    alpha = modmath.mont_mul(modmath.sub_mod(cm, xm, mc.msk),
                             mc.inv_prodb_mont_msk, mc.msk, mc.msk_qinv_neg)

    neg = alpha > mc.msk_half                              # (..., n) bool
    mag = jnp.where(neg, mc.msk - alpha, alpha)[..., None, :]
    corr = modmath.mont_mul(mag, mc.prodb_mont_q,
                            mc.ms_q.q, mc.ms_q.qinv_neg)
    negb = neg[..., None, :]
    return jnp.where(negb, modmath.add_mod(cq, corr, mc.ms_q.q),
                     modmath.sub_mod(cq, corr, mc.ms_q.q))


def scale_and_round(xq: jax.Array, xbsk: jax.Array,
                    mc: MultConsts) -> jax.Array:
    """fast_floor + bsk_to_q: round(t * x / q) back in base q — the whole
    BEHZ tail applied to one tensor-product component."""
    return bsk_to_q(fast_floor(xq, xbsk, mc), mc)
