"""Fused encryption-tail Pallas kernel: c += e, modulus drop, Delta*m + fix.

One kernel covering the reference's poly_add_xq (bfv_encryption.cuh:180-191),
divide_and_round_q_last_inplace_add_x2 + _loop_xq (:111-178), and
weird_m_stuff (:193-213) — the ops between the inverse NTT and the finished
ciphertext.  XLA runs these as ~10 u64-emulated elementwise passes over the
(2, r, n) tensor; here they are one VMEM-resident pass.  Integer-only limb
arithmetic, bit-identical to ops/poly.py (tested), including the reference's
strict-`>` add quirk.

Grid: (r-1, 2) — kept residue x ciphertext half.  Each block reads its own
residue, the (updated-by-e) last residue, its error residue, and (for half
0) the message, and writes the finished (2, r-1, n) ciphertext block.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import hostmath as hm
from . import limb32

U32 = jnp.uint32
N2 = 128


def _limbs(v: int) -> tuple[int, int]:
    return v & 0xFFFFFFFF, (v >> 32) & 0xFFFFFFFF


def _fix_threshold(t: int) -> int:
    """weird_m_stuff's fix = floor((m + (t+1)//2) / t) for m in [0, t)
    is exactly [m >= t - (t+1)//2] — a single compare, valid for ANY t
    (for even t it equals the reference's (m + t/2) >> log2t shift
    bit-for-bit).  This is what lets the pallas encrypt tails accept
    odd batching primes (bfv_encryption.cuh:193-213 at general t)."""
    assert 1 < t < (1 << 32), f"plaintext modulus {t} must fit u32"
    return t - ((t + 1) >> 1)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["per_mod", "glob"],
    meta_fields=["fix_th"],
)
@dataclasses.dataclass(frozen=True)
class TailConsts:
    per_mod: jax.Array   # (r-1, 12) u32: q, qinv_neg, nu, half_mod,
    #                      inv_q_last (Montgomery form), qi_div_t — lo/hi pairs
    glob: jax.Array      # (4,) u32: q_last, half — lo/hi pairs
    fix_th: int          # message-fix compare threshold (_fix_threshold)

    @staticmethod
    def build(params) -> "TailConsts":
        qs = params.q[:-1]
        rows = []
        for i, q in enumerate(qs):
            row = (_limbs(q)
                   + _limbs(hm.mont_qinv_neg(q))
                   + _limbs((1 << 64) // q)
                   + _limbs(params.half_mod_q[i])
                   + _limbs(hm.to_mont(params.inv_q_last_mod_q[i], q))
                   + _limbs(params.qi_div_t[i]))
            rows.append(row)
        glob = _limbs(params.q[-1]) + _limbs(params.half_last_modulus)
        return TailConsts(
            per_mod=jnp.asarray(np.array(rows, dtype=np.uint32)),
            glob=jnp.asarray(np.array(glob, dtype=np.uint32)),
            fix_th=_fix_threshold(params.t),
        )


def _mod_u64(x, q, nu):
    """x mod q via nu = floor(2^64/q) (modmath.mod_u64 in limbs):
    est = mulhi(x, nu); r = x - est*q in [0, 2q); one corrective subtract."""
    est = limb32.mulhi64(x, nu)
    r = limb32.sub64(x, limb32.mullo64(est, q))
    return limb32.reduce_once(r, q)


def _make_kernel(fix_th: int, interpret: bool):
    def kernel(pm_ref, gl_ref, cl_ref, ch_ref, ll_ref, lh_ref, el_ref,
               eh_ref, fl_ref, fh_ref, ml_ref, mh_ref, ol_ref, oh_ref):
        mi = pl.program_id(0)
        half_idx = pl.program_id(1)
        q = (pm_ref[mi, 0], pm_ref[mi, 1])
        qinv = (pm_ref[mi, 2], pm_ref[mi, 3])
        nu = (pm_ref[mi, 4], pm_ref[mi, 5])
        half_mod = (pm_ref[mi, 6], pm_ref[mi, 7])
        invq_mont = (pm_ref[mi, 8], pm_ref[mi, 9])
        qi_div_t = (pm_ref[mi, 10], pm_ref[mi, 11])
        q_last = (gl_ref[0], gl_ref[1])
        half = (gl_ref[2], gl_ref[3])

        c = (cl_ref[0], ch_ref[0])
        e = (el_ref[0], eh_ref[0])
        c_last = (ll_ref[0], lh_ref[0])
        e_last = (fl_ref[0], fh_ref[0])

        # poly_add_xq on this residue and on the last one (strict `>`)
        s = limb32.add64(c, e)
        s = limb32.cond_sub64(s, q, limb32.gt64(s, q))
        ra = limb32.add64(c_last, e_last)
        ra = limb32.cond_sub64(ra, q_last, limb32.gt64(ra, q_last))
        # last += floor(q_last/2), mod q_last
        ra = limb32.add64(ra, half)
        ra = limb32.reduce_once(ra, q_last)
        # tmp = (last mod q_i) -_safe half_mod_i
        zero = (jnp.zeros_like(q[0]), jnp.zeros_like(q[1]))
        tmp = _mod_u64(ra, q, nu)
        tmp = limb32.add64(tmp, limb32.select64(
            limb32.lt64(tmp, half_mod), q, zero))
        tmp = limb32.sub64(tmp, half_mod)
        # c_i = (c_i -_safe tmp) * inv_q_last  mod q_i
        v = limb32.add64(s, limb32.select64(limb32.lt64(s, tmp), q, zero))
        v = limb32.sub64(v, tmp)
        out = limb32.mont_mul_lazy(v, invq_mont, q, qinv)
        out = limb32.reduce_once(out, q)

        # weird_m_stuff on half 0: c0 += Delta_i*m + fix, full mod.
        # m < t fits the low limb; fix = (m + (t+1)//2) // t as a
        # compare (_fix_threshold — exact for any t, odd or pow2)
        mw = (ml_ref[0], mh_ref[0])
        fix = ((mw[0] >= U32(fix_th)).astype(U32),
               jnp.zeros_like(mw[1]))
        dm = limb32.mullo64(mw, qi_div_t)
        withm = limb32.add64(limb32.add64(out, dm), fix)
        withm = _mod_u64(withm, q, nu)
        is_c0 = half_idx == 0
        res = limb32.select64(is_c0, withm, out)
        ol_ref[0] = res[0]
        oh_ref[0] = res[1]
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def encrypt_tail(c, e, m_poly, consts: TailConsts, interpret: bool = False):
    """(2, r, n) c after INTT, (2, r, n) e, (n,) m -> (2, r-1, n) ciphertext.
    Bit-identical to poly_add + divide_and_round_q_last + add_message."""
    _, r, n = c.shape
    n1 = n // N2
    B = 2 * r
    cl, ch = limb32.to_pair(c.reshape(B, n1, N2))
    el, eh = limb32.to_pair(e.reshape(B, n1, N2))
    ml, mh = limb32.to_pair(m_poly.reshape(1, n1, N2))

    z = np.int32(0)
    rr = np.int32(r)
    dmap = lambda mi, h, pm, gl: (h * rr + mi, z, z)          # own residue
    lmap = lambda mi, h, pm, gl: (h * rr + rr - 1, z, z)      # last residue
    mmap = lambda mi, h, pm, gl: (z, z, z)                    # message
    omap = lambda mi, h, pm, gl: (h * (rr - 1) + mi, z, z)
    bs = lambda im: pl.BlockSpec((1, n1, N2), im, memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # per_mod, glob
        grid=(r - 1, 2),
        in_specs=[bs(dmap), bs(dmap),    # c
                  bs(lmap), bs(lmap),    # c last residue
                  bs(dmap), bs(dmap),    # e
                  bs(lmap), bs(lmap),    # e last residue
                  bs(mmap), bs(mmap)],   # message
        out_specs=[bs(omap), bs(omap)],
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    ol, oh = pl.pallas_call(
        _make_kernel(consts.fix_th, interpret),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((2 * (r - 1), n1, N2), jnp.uint32)] * 2,
        interpret=interpret,
        **kwargs,
    )(consts.per_mod, consts.glob, cl, ch, cl, ch, el, eh, el, eh, ml, mh)
    if interpret:
        ol, oh = jax.lax.optimization_barrier((ol, oh))
    return limb32.from_pair((ol, oh)).reshape(2, r - 1, n)


# ---------------------------------------------------------------------------
# Fused decryption-tail kernel.
# ---------------------------------------------------------------------------

@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["per_mod", "glob"],
    meta_fields=["t", "neg_t", "nu_t", "inv_gt"],
)
@dataclasses.dataclass(frozen=True)
class DecTailConsts:
    per_mod: jax.Array   # (r-1, 12) u32: q, qinv_neg, prod_t_gamma (Mont),
    #                      inv_punctured (Mont), bcm_t, bcm_g (Mont(gamma))
    glob: jax.Array      # (8,) u32: gamma, gamma_qinv_neg, gamma_div_2,
    #                      neg_g (Mont(gamma)) — lo/hi pairs
    t: int
    neg_t: int
    nu_t: int            # floor(2^64/t), odd t only (0 for pow2)
    inv_gt: int          # (gamma mod t)^-1 mod t, odd t only (0 for pow2)

    @property
    def tmeta(self) -> tuple:
        """Static mod-t strategy parameters for the kernel factories."""
        return (self.t, self.neg_t, self.nu_t, self.inv_gt)

    @staticmethod
    def _t_fields(params) -> dict:
        t = params.t
        if t & (t - 1) == 0:
            return dict(t=t, nu_t=0, inv_gt=0)
        # odd batching prime: exact Barrett-by-t in place of the
        # reference's power-of-two masks.  t < 2^31 keeps every mod-t
        # intermediate in one u32 lane with compare-subtract headroom.
        assert t % 2 == 1 and t < (1 << 31), \
            f"pallas decrypt tail needs odd t < 2^31, got {t}"
        return dict(t=t, nu_t=(1 << 64) // t,
                    inv_gt=pow(params.gamma % t, -1, t))

    @staticmethod
    def build(params) -> "DecTailConsts":
        qs = params.q[:-1]
        g = params.gamma
        bcm_t, bcm_g = params.base_change_matrix
        neg_t, neg_g = params.neg_inv_q_mod_t_gamma
        rows = []
        for i, q in enumerate(qs):
            rows.append(_limbs(q)
                        + _limbs(hm.mont_qinv_neg(q))
                        + _limbs(hm.to_mont(params.prod_t_gamma_mod_q[i], q))
                        + _limbs(hm.to_mont(params.inv_punctured_q[i], q))
                        + _limbs(bcm_t[i])
                        + _limbs(hm.to_mont(bcm_g[i], g)))
        glob = (_limbs(g) + _limbs(hm.mont_qinv_neg(g))
                + _limbs(params.gamma_div_2) + _limbs(hm.to_mont(neg_g, g)))
        return DecTailConsts(
            per_mod=jnp.asarray(np.array(rows, dtype=np.uint32)),
            glob=jnp.asarray(np.array(glob, dtype=np.uint32)),
            neg_t=neg_t,
            **DecTailConsts._t_fields(params),
        )


def _mont_exact(a, b, q, qinv):
    return limb32.reduce_once(limb32.mont_mul_lazy(a, b, q, qinv), q)


def _t_strategy(tmeta: tuple):
    """Static mod-t arithmetic for the decrypt tails, chosen at kernel
    build from DecTailConsts.tmeta = (t, neg_t, nu_t, inv_gt).

    pow2 t — the reference's mask forms, bit-for-bit
    (poly_arithmetic.cuh:217-268: t | 2^32 makes masked wrapping sums
    exact mod t).  odd t (batching primes) — exact Barrett-by-t with
    nu_t = floor(2^64/t); every x_t-channel value is kept < t in one
    u32 lane, and the final gamma-undo multiplies by (gamma mod t)^-1
    (the reference skips it because its gamma === 1 mod 1024; see
    ops/poly.py fast_convert_and_round, whose outputs these kernels
    match bit-exactly).

    Returns (part_t, acc_t, finish):
      part_t(y, bct)        (y u64 pair < q, bct u32 pair) -> u32 plane
      acc_t(prev, part)     running x_t accumulation       -> u32 plane
      finish(xt, x_g, gam, gdiv2)  neg_t scaling + dec_round -> u32 plane
    """
    t, neg_t, nu_t, inv_gt = tmeta
    if t & (t - 1) == 0:
        mask_v = (1 << (t.bit_length() - 1)) - 1

        def part_t(y, bct):
            return limb32.mullo64(y, bct)[0] & U32(mask_v)

        def acc_t(prev, part):
            return prev + part          # wraps mod 2^32: exact under mask

        def finish(xt, x_g, gam, gdiv2):
            mask = U32(mask_v)
            x_t = ((xt & mask) * U32(neg_t)) & mask
            over = limb32.gt64(x_g, gdiv2)
            plus = x_t + (gam[0] - x_g[0])
            minus = x_t - x_g[0]
            return jnp.where(over, plus, minus) & mask
        return part_t, acc_t, finish

    # NB: every U32(...) constant is constructed INSIDE the closures —
    # the kernels trace these at pallas_call time, and values built at
    # strategy-construction time would be captured consts (rejected by
    # pallas).
    nu_lo, nu_hi = nu_t & 0xFFFFFFFF, nu_t >> 32

    def _mod_t64(x_pair):
        """u64 limb pair -> x mod t (single wide reduction), u32 < t."""
        tp = (U32(t), U32(0))
        nu = (U32(nu_lo), U32(nu_hi))
        return _mod_u64(x_pair, tp, nu)[0]

    def _mul_mod_t(a32, b_int):
        return _mod_t64(limb32.mul32_wide(a32, U32(b_int)))

    def part_t(y, bct):
        yt = _mod_t64(y)                              # y mod t, < t
        return _mod_t64(limb32.mul32_wide(yt, bct[0]))  # < t^2 < 2^62

    def acc_t(prev, part):
        s = prev + part                               # both < t < 2^31
        return jnp.where(s >= U32(t), s - U32(t), s)

    def finish(xt, x_g, gam, gdiv2):
        tv = U32(t)
        x_t = _mul_mod_t(xt, neg_t)
        over = limb32.gt64(x_g, gdiv2)
        gmx = _mod_t64(limb32.sub64(gam, x_g))
        xgt = _mod_t64(x_g)
        plus = x_t + gmx
        plus = jnp.where(plus >= tv, plus - tv, plus)
        minus = x_t + tv - xgt
        minus = jnp.where(minus >= tv, minus - tv, minus)
        corr = jnp.where(over, plus, minus)
        return _mul_mod_t(corr, inv_gt)               # undo gamma mod t
    return part_t, acc_t, finish


def _make_dec_kernel(tmeta: tuple, rk: int, interpret: bool):
    """Decryption tail (bfv_decryption.cuh:103-137 + poly_arithmetic
    fast_convert/dec_round): per kept residue i, y_i = ((x_i +> c0_i) *
    prod_t_gamma * inv_punctured) mod q_i; accumulate the BEHZ sums
    x_t += (y_i * bcm_t_i) & (t-1)  and  x_g = (x_g + y_i * bcm_g_i) mod
    gamma across the residue grid in VMEM scratch; final step applies
    neg_inv_q scaling and dec_round.  Bit-identical to the ops/poly.py
    chain (the accumulation order equals its python loop order because the
    TPU grid runs sequentially).  Grid (J, rk): message-major, residues
    fastest, so the scratch accumulators reset at each message's mi=0."""
    part_t_fn, acc_t_fn, finish_fn = _t_strategy(tmeta)

    def kernel(pm_ref, gl_ref, xl_ref, xh_ref, cl_ref, ch_ref,
               out_ref, xt_ref, xgl_ref, xgh_ref):
        mi = pl.program_id(1)
        q = (pm_ref[mi, 0], pm_ref[mi, 1])
        qinv = (pm_ref[mi, 2], pm_ref[mi, 3])
        ptg = (pm_ref[mi, 4], pm_ref[mi, 5])
        ipq = (pm_ref[mi, 6], pm_ref[mi, 7])
        bct = (pm_ref[mi, 8], pm_ref[mi, 9])
        bcg = (pm_ref[mi, 10], pm_ref[mi, 11])
        gam = (gl_ref[0], gl_ref[1])
        ginv = (gl_ref[2], gl_ref[3])
        gdiv2 = (gl_ref[4], gl_ref[5])
        negg = (gl_ref[6], gl_ref[7])

        x = (xl_ref[0], xh_ref[0])
        c0 = (cl_ref[0], ch_ref[0])
        # poly_add_xq_d strict-`>` quirk (bfv_decryption.cuh:13-23)
        s = limb32.add64(x, c0)
        s = limb32.cond_sub64(s, q, limb32.gt64(s, q))
        y = _mont_exact(s, ptg, q, qinv)       # * t*gamma mod q_i
        y = _mont_exact(y, ipq, q, qinv)       # * inv punctured q
        # BEHZ partials
        part_t = part_t_fn(y, bct)
        part_g = _mont_exact(y, bcg, gam, ginv)

        @pl.when(mi == 0)
        def _init():
            xt_ref[...] = part_t
            xgl_ref[...] = part_g[0]
            xgh_ref[...] = part_g[1]

        @pl.when(mi > 0)
        def _acc():
            xt_ref[...] = acc_t_fn(xt_ref[...], part_t)
            acc = limb32.add64((xgl_ref[...], xgh_ref[...]), part_g)
            acc = limb32.reduce_once(acc, gam)        # add_mod chain order
            xgl_ref[...] = acc[0]
            xgh_ref[...] = acc[1]

        @pl.when(mi == rk - 1)
        def _final():
            x_g = _mont_exact((xgl_ref[...], xgh_ref[...]), negg, gam, ginv)
            # neg_t scaling + dec_round (poly_arithmetic.cuh:253-268)
            out_ref[0] = finish_fn(xt_ref[...], x_g, gam, gdiv2)
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def decrypt_tail(x, ct0, consts: DecTailConsts, interpret: bool = False):
    """(r-1, n) x = INTT(NTT(c1) (.) sk), (r-1, n) c0 -> (n,) plaintext.
    Bit-identical to poly_add + scalar muls + fast_convert_and_round.
    A leading J batch dim on both operands decrypts J messages in one
    kernel ((J, r-1, n) -> (J, n))."""
    single = x.ndim == 2
    if single:
        x, ct0 = x[None], ct0[None]
    J, rk, n = x.shape
    n1 = n // N2
    xl, xh = limb32.to_pair(x.reshape(J * rk, n1, N2))
    cl, ch = limb32.to_pair(ct0.reshape(J * rk, n1, N2))

    z = np.int32(0)
    dmap = lambda j, mi, pm, gl: (j * np.int32(rk) + mi, z, z)
    omap = lambda j, mi, pm, gl: (j, z, z)
    bs = lambda im: pl.BlockSpec((1, n1, N2), im, memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(J, rk),
        in_specs=[bs(dmap), bs(dmap), bs(dmap), bs(dmap)],
        out_specs=[bs(omap)],
        scratch_shapes=[pltpu.VMEM((n1, N2), jnp.uint32)] * 3,
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        _make_dec_kernel(consts.tmeta, rk, interpret),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((J, n1, N2), jnp.uint32)],
        interpret=interpret,
        **kwargs,
    )(consts.per_mod, consts.glob, xl, xh, cl, ch)[0]
    if interpret:
        out = jax.lax.optimization_barrier(out)
    out = out.reshape(J, n).astype(jnp.uint64)
    return out[0] if single else out


# ---------------------------------------------------------------------------
# Fully fused decrypt back half: dyadic (.) sk + inverse NTT + tail.
# ---------------------------------------------------------------------------

def _make_dec_fused_kernel(tmeta: tuple, rk: int, n1: int,
                           interpret: bool):
    """One kernel for everything after decrypt's forward transform:
    per kept residue, x = INTT(x (.) sk) (the fused-dyadic inverse,
    ops/ntt_pallas.py), then the decrypt tail of _make_dec_kernel —
    saving the (r-1, n) x tensor's HBM round trip between the two
    kernels plus a dispatch.  Bit-identical to
    ntt_inverse_mul + decrypt_tail."""
    from . import ntt_pallas as ntp

    part_t_fn, acc_t_fn, finish_fn = _t_strategy(tmeta)

    def kernel(pm_ref, gl_ref, qc_ref, xl_ref, xh_ref, skl_ref, skh_ref,
               cl_ref, ch_ref, tai_ref, tcir_ref, tbi_ref,
               out_ref, xt_ref, xgl_ref, xgh_ref):
        mi = pl.program_id(0)
        # --- INTT(x (.) sk) (cf. ntt_pallas._make_kernel_inv_mul) ---
        qq = (qc_ref[mi, 0], qc_ref[mi, 1])
        two_q = (qc_ref[mi, 2], qc_ref[mi, 3])
        four_q = limb32.add64(two_q, two_q)
        qmont_inv = (qc_ref[mi, 6], qc_ref[mi, 7])
        x = (xl_ref[0], xh_ref[0])
        y = (skl_ref[0], skh_ref[0])
        x = limb32.mont_mul_lazy(x, y, qq, qmont_inv)
        lane = jax.lax.broadcasted_iota(U32, (n1, N2), 1)
        rowi = jax.lax.broadcasted_iota(U32, (n1, N2), 0)
        x = ntp._stage_b_inv(x, tbi_ref.at[0], qq, four_q, lane, interpret)
        x = ntp._elementwise_fix(x, tcir_ref.at[0], qq)
        x = ntp._stage_a_inv(x, tai_ref.at[0], qq, four_q, n1, rowi,
                             interpret)
        x = ntp._normalize(x, qq, two_q)

        # --- decrypt tail (cf. _make_dec_kernel) ---
        q = (pm_ref[mi, 0], pm_ref[mi, 1])
        qinv = (pm_ref[mi, 2], pm_ref[mi, 3])
        ptg = (pm_ref[mi, 4], pm_ref[mi, 5])
        ipq = (pm_ref[mi, 6], pm_ref[mi, 7])
        bct = (pm_ref[mi, 8], pm_ref[mi, 9])
        bcg = (pm_ref[mi, 10], pm_ref[mi, 11])
        gam = (gl_ref[0], gl_ref[1])
        ginv = (gl_ref[2], gl_ref[3])
        gdiv2 = (gl_ref[4], gl_ref[5])
        negg = (gl_ref[6], gl_ref[7])

        c0 = (cl_ref[0], ch_ref[0])
        s = limb32.add64(x, c0)
        s = limb32.cond_sub64(s, q, limb32.gt64(s, q))
        y_ = _mont_exact(s, ptg, q, qinv)
        y_ = _mont_exact(y_, ipq, q, qinv)
        part_t = part_t_fn(y_, bct)
        part_g = _mont_exact(y_, bcg, gam, ginv)

        @pl.when(mi == 0)
        def _init():
            xt_ref[...] = part_t
            xgl_ref[...] = part_g[0]
            xgh_ref[...] = part_g[1]

        @pl.when(mi > 0)
        def _acc():
            xt_ref[...] = acc_t_fn(xt_ref[...], part_t)
            acc = limb32.add64((xgl_ref[...], xgh_ref[...]), part_g)
            acc = limb32.reduce_once(acc, gam)
            xgl_ref[...] = acc[0]
            xgh_ref[...] = acc[1]

        @pl.when(mi == rk - 1)
        def _final():
            x_g = _mont_exact((xgl_ref[...], xgh_ref[...]), negg, gam, ginv)
            out_ref[0] = finish_fn(xt_ref[...], x_g, gam, gdiv2)
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def decrypt_fused(x_ntt, sk, ct0, ftab, consts: DecTailConsts,
                  interpret: bool = False):
    """(r-1, n) x = NTT(c1), (r-1, n) NTT-domain sk, (r-1, n) c0 ->
    (n,) plaintext.  Bit-identical to
    ntt_pallas.ntt_inverse_mul(x, sk) followed by decrypt_tail."""
    rk, n = x_ntt.shape
    n1 = n // N2
    LA = int(ftab.ta.shape[2])
    xl, xh = limb32.to_pair(x_ntt.reshape(rk, n1, N2))
    sl, sh = limb32.to_pair(jnp.broadcast_to(sk, x_ntt.shape)
                            .reshape(rk, n1, N2))
    cl, ch = limb32.to_pair(ct0.reshape(rk, n1, N2))

    z = np.int32(0)
    dmap = lambda mi, pm, gl, qc: (mi, z, z)
    tmap4 = lambda mi, pm, gl, qc: (mi, z, z, z)
    omap = lambda mi, pm, gl, qc: (z, z, z)
    bs = lambda im: pl.BlockSpec((1, n1, N2), im, memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,   # per_mod, glob, qconst
        grid=(rk,),
        in_specs=[bs(dmap), bs(dmap),          # x
                  bs(dmap), bs(dmap),          # sk
                  bs(dmap), bs(dmap),          # c0
                  pl.BlockSpec((1, 4, LA, N2), tmap4,
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 4, n1, N2), tmap4,
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 4, 8, N2), tmap4,
                               memory_space=pltpu.VMEM)],
        out_specs=[bs(omap)],
        scratch_shapes=[pltpu.VMEM((n1, N2), jnp.uint32)] * 3,
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        _make_dec_fused_kernel(consts.tmeta, rk, n1,
                               interpret),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, n1, N2), jnp.uint32)],
        interpret=interpret,
        **kwargs,
    )(consts.per_mod, consts.glob, ftab.qconst, xl, xh, sl, sh, cl, ch,
      ftab.tai, ftab.tcir, ftab.tbi)[0]
    if interpret:
        out = jax.lax.optimization_barrier(out)
    return out.reshape(n).astype(jnp.uint64)


# ---------------------------------------------------------------------------
# Fully fused encrypt back half: dyadic (.) pk + inverse NTT + tail.
# ---------------------------------------------------------------------------

def _make_enc_fused_kernel(fix_th: int, r: int, n1: int, interpret: bool,
                           compact_e: bool = False):
    """One kernel for everything after encrypt's forward transform of u:
    per (residue, ciphertext-half) grid step, c = INTT(u_ntt (.) pk),
    then the encrypt tail of _make_kernel.  The tail needs the adjusted
    LAST residue ((c+e) + q_last/2) broadcast to every kept residue, so
    the grid maps step m=0 to the last residue (both halves first, its
    ra kept in VMEM scratch) and steps m>=1 to kept residue m-1.
    Bit-identical to ntt_inverse_mul + encrypt_tail.

    compact_e: e arrives as ONE (2, n) i32 compact Gaussian plane pair
    and expands per residue in-kernel (ntt_pallas.gauss_res) — the
    (2, r, n) u64 error tensor never reaches HBM (stage-schedule
    compact-draw path)."""
    from . import ntt_pallas as ntp
    rr = np.int32(r)

    def kernel(pm_ref, gl_ref, qc_ref, xl_ref, xh_ref, yl_ref, yh_ref,
               *rest):
        if compact_e:
            (ed_ref, ml_ref, mh_ref, tai_ref, tcir_ref, tbi_ref,
             ol_ref, oh_ref, ra_l, ra_h) = rest
        else:
            (el_ref, eh_ref, ml_ref, mh_ref, tai_ref, tcir_ref, tbi_ref,
             ol_ref, oh_ref, ra_l, ra_h) = rest
        m_step = pl.program_id(0)
        half_idx = pl.program_id(1)
        mi = jnp.where(m_step == 0, rr - 1, m_step - 1)
        # --- INTT(u_ntt (.) pk) ---
        qq = (qc_ref[mi, 0], qc_ref[mi, 1])
        two_q = (qc_ref[mi, 2], qc_ref[mi, 3])
        four_q = limb32.add64(two_q, two_q)
        qmont_inv = (qc_ref[mi, 6], qc_ref[mi, 7])
        x = (xl_ref[0], xh_ref[0])
        y = (yl_ref[0], yh_ref[0])
        x = limb32.mont_mul_lazy(x, y, qq, qmont_inv)
        lane = jax.lax.broadcasted_iota(U32, (n1, N2), 1)
        rowi = jax.lax.broadcasted_iota(U32, (n1, N2), 0)
        x = ntp._stage_b_inv(x, tbi_ref.at[0], qq, four_q, lane, interpret)
        x = ntp._elementwise_fix(x, tcir_ref.at[0], qq)
        x = ntp._stage_a_inv(x, tai_ref.at[0], qq, four_q, n1, rowi,
                             interpret)
        x = ntp._normalize(x, qq, two_q)

        # --- c += e (strict `>` quirk), on this residue ---
        if compact_e:
            e = ntp.gauss_res(ed_ref[0], qq)
        else:
            e = (el_ref[0], eh_ref[0])
        s = limb32.add64(x, e)
        s = limb32.cond_sub64(s, qq, limb32.gt64(s, qq))

        q_last = (gl_ref[0], gl_ref[1])
        half = (gl_ref[2], gl_ref[3])

        @pl.when(m_step == 0)
        def _last():
            # adjusted last residue into scratch; the output slot is
            # garbage by design (overwritten by the m=1 step's block)
            ra = limb32.add64(s, half)
            ra = limb32.reduce_once(ra, q_last)
            ra_l[half_idx] = ra[0]
            ra_h[half_idx] = ra[1]
            ol_ref[0] = s[0]
            oh_ref[0] = s[1]

        @pl.when(m_step > 0)
        def _kept():
            ki = m_step - 1
            q = (pm_ref[ki, 0], pm_ref[ki, 1])
            qinv = (pm_ref[ki, 2], pm_ref[ki, 3])
            nu = (pm_ref[ki, 4], pm_ref[ki, 5])
            half_mod = (pm_ref[ki, 6], pm_ref[ki, 7])
            invq_mont = (pm_ref[ki, 8], pm_ref[ki, 9])
            qi_div_t = (pm_ref[ki, 10], pm_ref[ki, 11])
            ra = (ra_l[half_idx], ra_h[half_idx])
            zero = (jnp.zeros_like(q[0]), jnp.zeros_like(q[1]))
            tmp = _mod_u64(ra, q, nu)
            tmp = limb32.add64(tmp, limb32.select64(
                limb32.lt64(tmp, half_mod), q, zero))
            tmp = limb32.sub64(tmp, half_mod)
            v = limb32.add64(s, limb32.select64(limb32.lt64(s, tmp), q,
                                                zero))
            v = limb32.sub64(v, tmp)
            out = limb32.mont_mul_lazy(v, invq_mont, q, qinv)
            out = limb32.reduce_once(out, q)
            mw = (ml_ref[0], mh_ref[0])
            fix = ((mw[0] >= U32(fix_th)).astype(U32),
                   jnp.zeros_like(mw[1]))
            dm = limb32.mullo64(mw, qi_div_t)
            withm = limb32.add64(limb32.add64(out, dm), fix)
            withm = _mod_u64(withm, q, nu)
            res = limb32.select64(half_idx == 0, withm, out)
            ol_ref[0] = res[0]
            oh_ref[0] = res[1]
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def encrypt_fused(u_ntt, pk, e, m_poly, ftab, consts: TailConsts,
                  interpret: bool = False):
    """(r, n) u_ntt = NTT(u), (2, r, n) NTT-domain pk, e, (n,) m ->
    (2, r-1, n) ciphertext.  Bit-identical to
    ntt_inverse_mul(broadcast(u_ntt), pk) followed by encrypt_tail
    (which equals poly_add + divide_and_round + add_message).

    e is either the (2, r, n) u64 residue tensor or a COMPACT (2, n)
    i32 Gaussian plane pair (sampling.encrypt_draws_compact), expanded
    per residue in-kernel."""
    r, n = u_ntt.shape
    n1 = n // N2
    LA = int(ftab.ta.shape[2])
    compact_e = e.dtype == jnp.int32
    xl, xh = limb32.to_pair(u_ntt.reshape(r, n1, N2))
    yl, yh = limb32.to_pair(pk.reshape(2 * r, n1, N2))
    ml, mh = limb32.to_pair(m_poly.reshape(1, n1, N2))

    z = np.int32(0)
    rr = np.int32(r)
    res = lambda m: jnp.where(m == 0, rr - 1, m - 1)
    umap = lambda m, h, pm, gl, qc: (res(m), z, z)         # u_ntt: no half
    dmap = lambda m, h, pm, gl, qc: (h * rr + res(m), z, z)
    emap = lambda m, h, pm, gl, qc: (h, z, z)              # compact e
    mmap = lambda m, h, pm, gl, qc: (z, z, z)
    omap = lambda m, h, pm, gl, qc: (
        h * (rr - 1) + jnp.maximum(m, 1) - 1, z, z)
    tmap = lambda m, h, pm, gl, qc: (res(m), z, z, z)
    bs = lambda im: pl.BlockSpec((1, n1, N2), im, memory_space=pltpu.VMEM)
    if compact_e:
        e_specs = [bs(emap)]
        e_args = [e.reshape(2, n1, N2)]
    else:
        el, eh = limb32.to_pair(e.reshape(2 * r, n1, N2))
        e_specs = [bs(dmap), bs(dmap)]
        e_args = [el, eh]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,   # per_mod (r-1 rows), glob, qconst
        grid=(r, 2),
        in_specs=[bs(umap), bs(umap),          # u_ntt
                  bs(dmap), bs(dmap)]          # pk
                 + e_specs
                 + [bs(mmap), bs(mmap),        # message
                    pl.BlockSpec((1, 4, LA, N2), tmap,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 4, n1, N2), tmap,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 4, 8, N2), tmap,
                                 memory_space=pltpu.VMEM)],
        out_specs=[bs(omap), bs(omap)],
        scratch_shapes=[pltpu.VMEM((2, n1, N2), jnp.uint32)] * 2,
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    ol, oh = pl.pallas_call(
        _make_enc_fused_kernel(consts.fix_th, r, n1, interpret,
                               compact_e=compact_e),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((2 * (r - 1), n1, N2),
                                        jnp.uint32)] * 2,
        interpret=interpret,
        **kwargs,
    )(consts.per_mod, consts.glob, ftab.qconst, xl, xh, yl, yh, *e_args,
      ml, mh, ftab.tai, ftab.tcir, ftab.tbi)
    if interpret:
        ol, oh = jax.lax.optimization_barrier((ol, oh))
    return limb32.from_pair((ol, oh)).reshape(2, r - 1, n)


# ---------------------------------------------------------------------------
# shard_map (SPMD) variants: per-shard kernels whose cross-residue inputs /
# outputs are explicit, so the collectives live in parallel/spmd.py.
# ---------------------------------------------------------------------------

def build_tail_consts_padded(params) -> TailConsts:
    """TailConsts over ALL r moduli (padding layout: the dropped modulus
    keeps a well-defined row — its output slot is garbage by design, as in
    the reference's in-place ciphertext layout, bfv_encryption.cuh:216-222).
    glob.half is zeroed: the SPMD caller folds +half into ra itself."""
    rows = []
    for i, q in enumerate(params.q):
        half_mod = params.half_mod_q[i] if i < params.r - 1 else 0
        invq = (hm.to_mont(params.inv_q_last_mod_q[i], q)
                if i < params.r - 1 else hm.to_mont(1, q))
        qdt = params.qi_div_t[i] if i < params.r - 1 else 0
        rows.append(_limbs(q) + _limbs(hm.mont_qinv_neg(q))
                    + _limbs((1 << 64) // q) + _limbs(half_mod)
                    + _limbs(invq) + _limbs(qdt))
    glob = _limbs(params.q[-1]) + _limbs(0)
    return TailConsts(
        per_mod=jnp.asarray(np.array(rows, dtype=np.uint32)),
        glob=jnp.asarray(np.array(glob, dtype=np.uint32)),
        fix_th=_fix_threshold(params.t),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def encrypt_tail_padded(c, e, ra_ready, m_poly, consts: TailConsts,
                        interpret: bool = False):
    """Per-shard encrypt tail: (2, rl, n) c and e (local residues),
    ra_ready (2, n) = ((c_last +> e_last) + half) mod q_last (already
    psum-broadcast), (n,) m -> (2, rl, n) padded ciphertext (every local
    residue processed; the global-last slot, if local, is garbage)."""
    _, rl, n = c.shape
    n1 = n // N2
    cl, ch = limb32.to_pair(c.reshape(2 * rl, n1, N2))
    el, eh = limb32.to_pair(e.reshape(2 * rl, n1, N2))
    rl_, rh_ = limb32.to_pair(ra_ready.reshape(2, n1, N2))
    ml, mh = limb32.to_pair(m_poly.reshape(1, n1, N2))

    z = np.int32(0)
    rr = np.int32(rl)
    dmap = lambda mi, h, pm, gl: (h * rr + mi, z, z)
    lmap = lambda mi, h, pm, gl: (h, z, z)
    mmap = lambda mi, h, pm, gl: (z, z, z)
    bs = lambda im: pl.BlockSpec((1, n1, N2), im, memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(rl, 2),
        in_specs=[bs(dmap), bs(dmap),    # c
                  bs(lmap), bs(lmap),    # ra_ready (the "last residue")
                  bs(dmap), bs(dmap),    # e
                  bs(lmap), bs(lmap),    # zero e_last (identity add)
                  bs(mmap), bs(mmap)],
        out_specs=[bs(dmap), bs(dmap)],
    )
    zeros = jnp.zeros_like(rl_)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    ol, oh = pl.pallas_call(
        _make_kernel(consts.fix_th, interpret),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((2 * rl, n1, N2), jnp.uint32)] * 2,
        interpret=interpret,
        **kwargs,
    )(consts.per_mod, consts.glob, cl, ch, rl_, rh_, el, eh, zeros, zeros,
      ml, mh)
    if interpret:
        ol, oh = jax.lax.optimization_barrier((ol, oh))
    return limb32.from_pair((ol, oh)).reshape(2, rl, n)


def build_dec_tail_consts_padded(params, lo: int, hi: int,
                                 pad_to: int | None = None) -> DecTailConsts:
    """DecTailConsts rows for moduli [lo, hi) with the dropped (global
    last) modulus's BEHZ matrix rows zeroed, so its partials vanish from
    the cross-shard sums.  pad_to > hi-lo appends fully-zeroed rows
    (q=1 to keep the per-row modular ops well-defined) — used by the
    level-aware SPMD decrypt, whose mod-switched ciphertexts keep the
    original padded width while the live modulus chain shrinks."""
    g = params.gamma
    bcm_t, bcm_g = params.base_change_matrix
    neg_t, neg_g = params.neg_inv_q_mod_t_gamma
    rows = []
    for i in range(lo, hi):
        q = params.q[i]
        kept = i < params.r - 1
        rows.append(
            _limbs(q) + _limbs(hm.mont_qinv_neg(q))
            + _limbs(hm.to_mont(params.prod_t_gamma_mod_q[i], q) if kept else 0)
            + _limbs(hm.to_mont(params.inv_punctured_q[i], q) if kept else 0)
            + _limbs(bcm_t[i] if kept else 0)
            + _limbs(hm.to_mont(bcm_g[i], g) if kept else 0))
    for _ in range(len(rows), (pad_to or 0) - lo):
        rows.append(_limbs(1) + _limbs(hm.mont_qinv_neg(1))
                    + _limbs(0) + _limbs(0) + _limbs(0) + _limbs(0))
    glob = (_limbs(g) + _limbs(hm.mont_qinv_neg(g))
            + _limbs(params.gamma_div_2) + _limbs(hm.to_mont(neg_g, g)))
    return DecTailConsts(
        per_mod=jnp.asarray(np.array(rows, dtype=np.uint32)),
        glob=jnp.asarray(np.array(glob, dtype=np.uint32)),
        neg_t=neg_t,
        **DecTailConsts._t_fields(params),
    )


def _make_dec_partial_kernel(tmeta: tuple, rl: int, interpret: bool):
    """decrypt_tail accumulation only: per-shard BEHZ partial sums
    (x_t wrapping-u32 for pow2 t, mod-t for odd t; x_g mod gamma); the
    cross-shard psum and the final scaling/rounding happen in the
    caller (dec_round_from_sums)."""
    part_t_fn, acc_t_fn, _ = _t_strategy(tmeta)

    def kernel(pm_ref, gl_ref, xl_ref, xh_ref, cl_ref, ch_ref,
               otl_ref, ogl_ref, ogh_ref):
        mi = pl.program_id(0)
        q = (pm_ref[mi, 0], pm_ref[mi, 1])
        qinv = (pm_ref[mi, 2], pm_ref[mi, 3])
        ptg = (pm_ref[mi, 4], pm_ref[mi, 5])
        ipq = (pm_ref[mi, 6], pm_ref[mi, 7])
        bct = (pm_ref[mi, 8], pm_ref[mi, 9])
        bcg = (pm_ref[mi, 10], pm_ref[mi, 11])
        gam = (gl_ref[0], gl_ref[1])
        ginv = (gl_ref[2], gl_ref[3])

        x = (xl_ref[0], xh_ref[0])
        c0 = (cl_ref[0], ch_ref[0])
        s = limb32.add64(x, c0)
        s = limb32.cond_sub64(s, q, limb32.gt64(s, q))
        y = _mont_exact(s, ptg, q, qinv)
        y = _mont_exact(y, ipq, q, qinv)
        part_t = part_t_fn(y, bct)
        part_g = _mont_exact(y, bcg, gam, ginv)

        @pl.when(mi == 0)
        def _init():
            otl_ref[0] = part_t
            ogl_ref[0] = part_g[0]
            ogh_ref[0] = part_g[1]

        @pl.when(mi > 0)
        def _acc():
            otl_ref[0] = acc_t_fn(otl_ref[0], part_t)
            acc = limb32.add64((ogl_ref[0], ogh_ref[0]), part_g)
            acc = limb32.reduce_once(acc, gam)
            ogl_ref[0] = acc[0]
            ogh_ref[0] = acc[1]
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def decrypt_tail_partial(x, ct0, consts: DecTailConsts,
                         interpret: bool = False):
    """(rl, n) x, (rl, n) c0 -> (x_t (n,) u32 wrapping sum,
    x_g (n,) u64 sum mod gamma) — this shard's BEHZ partials."""
    rl, n = x.shape
    n1 = n // N2
    xl, xh = limb32.to_pair(x.reshape(rl, n1, N2))
    cl, ch = limb32.to_pair(ct0.reshape(rl, n1, N2))
    z = np.int32(0)
    dmap = lambda mi, pm, gl: (mi, z, z)
    omap = lambda mi, pm, gl: (z, z, z)
    bs = lambda im: pl.BlockSpec((1, n1, N2), im, memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(rl,),
        in_specs=[bs(dmap), bs(dmap), bs(dmap), bs(dmap)],
        out_specs=[bs(omap), bs(omap), bs(omap)],
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    ot, ogl, ogh = pl.pallas_call(
        _make_dec_partial_kernel(consts.tmeta, rl, interpret),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, n1, N2), jnp.uint32)] * 3,
        interpret=interpret,
        **kwargs,
    )(consts.per_mod, consts.glob, xl, xh, cl, ch)
    if interpret:
        ot, ogl, ogh = jax.lax.optimization_barrier((ot, ogl, ogh))
    xg = limb32.from_pair((ogl, ogh)).reshape(n)
    return ot.reshape(n), xg


def combine_gamma_halves(lo_sum, hi_sum, params):
    """Recombine split-psum'd gamma-row partial sums mod gamma.

    Each shard's gamma partial is < gamma ~ 2^61, so a direct u64 psum
    silently wraps once R * gamma >= 2^64 (R > 8 for the published gamma,
    poly_arithmetic.cuh:237-251).  Shards therefore psum the 32-bit
    HALVES of their partials (half sums < R * 2^32 — safe to R = 2^32)
    and this recombines: total = hi * 2^32 + lo (mod gamma), computed as
    mont_mul(hi mod gamma, Mont(2^32)) + (lo mod gamma) < 2^63.
    Everything downstream is mod gamma, so the result is bit-identical to
    the reference's sequential accumulation for any shard count."""
    from . import modmath
    g = params.gamma
    gq = jnp.uint64(g)
    nu = jnp.uint64((1 << 64) // g)
    qinv = jnp.uint64(hm.mont_qinv_neg(g))
    two32_mont = jnp.uint64(hm.to_mont(1 << 32, g))
    hi_m = modmath.mont_mul(modmath.mod_u64(hi_sum, gq, nu), two32_mont,
                            gq, qinv)
    return hi_m + modmath.mod_u64(lo_sum, gq, nu)


def psum_behz_partials(x_t, x_g, axis_name, params):
    """psum the per-shard BEHZ partials across the rns mesh axis, safely
    for ANY shard count R (see combine_gamma_halves).

    One stacked (3, n) all-reduce: [x_t widened to u64, x_g low half,
    x_g high half].  Only the low log2(t) bits of the x_t sum are
    consumed downstream (t < 2^32), so the u64 widening is exact for any
    R < 2^32."""
    parts = jnp.stack([x_t.astype(jnp.uint64),
                       x_g & jnp.uint64(0xFFFFFFFF),
                       x_g >> jnp.uint64(32)])
    sums = jax.lax.psum(parts, axis_name)
    return sums[0], combine_gamma_halves(sums[1], sums[2], params)


def dec_round_from_sums(x_t_sum, x_g_sum, params):
    """Finish decryption from psum'd BEHZ sums (jnp, (n,) elementwise).

    x_t_sum: sum of t-row partials across ALL kept residues (wrapping
    u32 partials for pow2 t; mod-t partials for odd t, whose plain sum
    over <= 2^32 shards still fits u64); x_g_sum: any u64
    representative of the gamma-row total mod gamma (use
    psum_behz_partials to build it overflow-safely for any shard
    count).  Bit-identical to the fused decrypt_tail finisher."""
    from . import modmath
    g = params.gamma
    t = params.t
    neg_t, neg_g = params.neg_inv_q_mod_t_gamma
    nu_g = jnp.uint64((1 << 64) // g)
    x_g = modmath.mod_u64(x_g_sum, jnp.uint64(g), nu_g)
    x_g = modmath.mont_mul(x_g, jnp.uint64(hm.to_mont(neg_g, g)),
                           jnp.uint64(g), jnp.uint64(hm.mont_qinv_neg(g)))
    over = x_g > jnp.uint64(params.gamma_div_2)
    if t & (t - 1) == 0:
        mask = jnp.uint64(t - 1)
        x_t = ((x_t_sum.astype(jnp.uint64) & mask)
               * jnp.uint64(neg_t)) & mask
        corr = jnp.where(over, x_t + (jnp.uint64(g) - x_g), x_t - x_g)
        return corr & mask
    # odd batching prime: exact mod-t (matches _t_strategy.finish /
    # poly.fast_convert_and_round, incl. the gamma-undo)
    tt = jnp.uint64(t)
    nu_t = jnp.uint64((1 << 64) // t)
    x_t = modmath.mod_u64(x_t_sum.astype(jnp.uint64), tt, nu_t)
    x_t = modmath.mod_u64(x_t * jnp.uint64(neg_t), tt, nu_t)
    plus = modmath.add_mod(
        x_t, modmath.mod_u64(jnp.uint64(g) - x_g, tt, nu_t), tt)
    minus = modmath.sub_mod(x_t, modmath.mod_u64(x_g, tt, nu_t), tt)
    corr = jnp.where(over, plus, minus)
    inv_gt = pow(params.gamma % t, -1, t)
    return modmath.mod_u64(corr * jnp.uint64(inv_gt), tt, nu_t)
