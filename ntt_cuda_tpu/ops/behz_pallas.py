"""Pallas fast-base-conversion kernels for the BEHZ EvalMult pipeline.

Round-4 TPU profiling (scratch/mult_profile_16k.log) showed the XLA
conversion chains costing ~half of EvalMult (rns_to_bsk 184 us per
ciphertext, scale_and_round 605 us for 3 components at 16k_5q; 32k mul
9.6 ms against a ~1.2 ms transform bound): every mont_mul in the
ops/behz.py chains round-trips a (k, n) u64 intermediate through HBM,
and the k x (k+1) base-change inner products multiply that by the
matrix size.

These kernels run each conversion as ONE VMEM-resident pass, the same
design as the fused decrypt tail (ops/bfv_tail.py): grid over
(component, target modulus), all k source planes resident per step, the
shared prescaled operand computed once per component into VMEM scratch
at the first target step, and the per-target inner product + finish
accumulated without touching HBM.

Arithmetic: every multiply here is data x CONSTANT, so the kernels use
Shoup mulmod with precomputed 2^64-scaled quotients (24 lane-multiplies
via the loose mulhi, vs ~42 for Montgomery REDC — the same trade the
NTT twiddle kernels make, NOTES_NEXT_ROUND.md kernel-v3) and keep
inner-product accumulators lazy in [0, 4q) with one conditional
subtract per term.  The head-to-head at 32k showed the first
(Montgomery) kernel generation merely matching XLA — both
compute-bound — so the multiply count is the lever.

Values at every interface are CANONICAL [0, q) residues (fast base
conversion sums canonical representatives by definition), which is also
what makes the kernels bit-identical to ops/behz.py: identical integer
values in, identical exact modular results out
(tests/test_behz_pallas.py).  Generalizes the reference's decrypt-side
fast_convert_array (poly_arithmetic.cuh:217-251) exactly as ops/behz.py
does — see that module for the algorithm citations.
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
from . import behz, limb32

U32 = jnp.uint32
N2 = 128
M_TILDE = behz.M_TILDE           # 2^32: the m_tilde channel is masks


def _limbs(v: int) -> tuple[int, int]:
    return v & 0xFFFFFFFF, (v >> 32) & 0xFFFFFFFF


def _wwp(w: int, q: int) -> tuple[int, int, int, int]:
    """(w_lo, w_hi, wp_lo, wp_hi): the constant and its Shoup quotient
    floor(w * 2^64 / q)."""
    return _limbs(w) + _limbs((w << 64) // q)


def _shoup_exact(v, ref, i, j, q):
    """v * const mod q, CANONICAL: exact Shoup ([0, 2q)) + one
    conditional subtract.  ref[i, j:j+4] holds (w, wp) limb pairs."""
    w = (ref[i, j], ref[i, j + 1])
    wp = (ref[i, j + 2], ref[i, j + 3])
    return limb32.reduce_once(limb32.shoup_mulmod_lazy(v, w, wp, q), q)


def _shoup_term(v, w, wp, q):
    """v * const mod q in [0, 3q) — the lazy inner-product term."""
    return limb32.shoup_mulmod_lazy4(v, w, wp, q)


def _acc_lazy(acc, term, four_q):
    """acc, term < 4q -> (acc + term) kept < 4q (one conditional sub;
    sums stay < 8q < 2^64 for q < 2^61)."""
    s = limb32.add64(acc, term)
    return limb32.cond_sub64(s, four_q, limb32.geq64(s, four_q))


def _norm4(x, q, two_q):
    """[0, 4q) -> canonical [0, q): two conditional subtracts."""
    x = limb32.cond_sub64(x, two_q, limb32.geq64(x, two_q))
    return limb32.reduce_once(x, q)


def _sub_mod(a, b, q):
    """(a - b) mod q for canonical a, b < q (limb pairs)."""
    zero = (jnp.zeros_like(q[0]), jnp.zeros_like(q[1]))
    v = limb32.add64(a, limb32.select64(limb32.lt64(a, b), q, zero))
    return limb32.sub64(v, b)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["qsrc", "tgt", "amat", "bsrc", "bmat", "bfin", "glob"],
    meta_fields=["k"],
)
@dataclasses.dataclass(frozen=True)
class MultPallasConsts:
    """u32 limb-pair constant banks (value + Shoup quotient per
    constant) for the three conversion kernels."""

    qsrc: jax.Array   # (k, 12): q_j pair; c_a=(mt*invp mod q_j) w/wp;
    #                   c_f=(t*invp mod q_j) w/wp; bcm_q_mt lo; pad
    tgt: jax.Array    # (k+1, 20): qb pair; prodq w/wp; inv_mt w/wp;
    #                   t_bsk w/wp; inv_prodq w/wp; pad(2)
    amat: jax.Array   # (k+1, k, 4): bcm_q_bsk w/wp (mod bsk_t)
    bsrc: jax.Array   # (k, 12): b_j pair; invp_b w/wp; bcm_b_msk w/wp;
    #                   pad(2)
    bmat: jax.Array   # (k, k, 4): bcm_b_q w/wp (mod q_t)
    bfin: jax.Array   # (k, 4): prodb w/wp (mod q_t)
    glob: jax.Array   # (12,): msk pair; msk_half pair; inv_prodb w/wp;
    #                   neg_inv_q_mt lo; pad
    k: int

    @staticmethod
    def build(params, aux: behz.AuxBase | None = None) -> "MultPallasConsts":
        aux = aux or behz.AuxBase.build(params)
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
        punct_q = [q_prod // qj for qj in qs]
        punct_b = [b_prod // bj for bj in aux.b]

        u32 = lambda rows: jnp.asarray(np.array(rows, dtype=np.uint32))
        qsrc = u32([
            _limbs(qj)
            + _wwp(mt * hm.modinv(pj % qj, qj) % qj, qj)
            + _wwp(params.t * hm.modinv(pj % qj, qj) % qj, qj)
            + (pj % mt, 0)
            for pj, qj in zip(punct_q, qs)])
        tgt = u32([
            _limbs(m)
            + _wwp(q_prod % m, m)
            + _wwp(hm.modinv(mt % m, m), m)
            + _wwp(params.t % m, m)
            + _wwp(hm.modinv(q_prod % m, m), m)
            + (0, 0)
            for m in bsk])
        amat = u32([[_wwp(pj % m, m) for pj in punct_q] for m in bsk])
        bsrc = u32([
            _limbs(bj)
            + _wwp(hm.modinv(pj % bj, bj), bj)
            + _wwp(pj % msk, msk)
            + (0, 0)
            for pj, bj in zip(punct_b, aux.b)])
        bmat = u32([[_wwp(pj % qi, qi) for pj in punct_b] for qi in qs])
        bfin = u32([_wwp(b_prod % qi, qi) for qi in qs])
        glob = u32(_limbs(msk) + _limbs(msk >> 1)
                   + _wwp(hm.modinv(b_prod % msk, msk), msk)
                   + ((-pow(q_prod, -1, mt)) % mt, 0))
        return MultPallasConsts(qsrc=qsrc, tgt=tgt, amat=amat, bsrc=bsrc,
                                bmat=bmat, bfin=bfin, glob=glob, k=k)


def _inner_product(k, zl, zh, mat, t, qb, two_qb, four_qb):
    """Sum_j zp_j * mat[t, j] mod qb, canonical (lazy accumulation)."""
    acc = None
    for j in range(k):
        term = _shoup_term((zl[j], zh[j]), (mat[t, j, 0], mat[t, j, 1]),
                           (mat[t, j, 2], mat[t, j, 3]), qb)
        acc = term if acc is None else _acc_lazy(acc, term, four_qb)
    return _norm4(acc, qb, two_qb)


# ---------------------------------------------------------------------------
# Kernel A: rns_to_bsk — q -> Bsk ∪ {m_tilde} extension + sm_mrq.
# ---------------------------------------------------------------------------

def _make_rns_to_bsk_kernel(k: int, n1: int, interpret: bool):
    def kernel(qsrc, tgt, amat, glob,
               xl_ref, xh_ref, ol_ref, oh_ref, zl, zh, rp):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _prescale():
            ymt = jnp.zeros((n1, N2), U32)
            for j in range(k):
                q = (qsrc[j, 0], qsrc[j, 1])
                x = (xl_ref[0, j], xh_ref[0, j])
                # zp = x * (m_tilde * (q/q_j)^-1) mod q_j, one multiply
                zp = _shoup_exact(x, qsrc, j, 2, q)
                zl[j] = zp[0]
                zh[j] = zp[1]
                # m_tilde channel wraps mod 2^32: low limbs only
                ymt = ymt + zp[0] * qsrc[j, 10]
            # r = -Y/q mod m_tilde (mask arithmetic)
            rp[...] = ymt * glob[8]

        qb = (tgt[t, 0], tgt[t, 1])
        two_qb = limb32.add64(qb, qb)
        four_qb = limb32.add64(two_qb, two_qb)
        y = _inner_product(k, zl, zh, amat, t, qb, two_qb, four_qb)
        # sm_mrq: centered r lift, + r*q, / m_tilde
        r = rp[...]
        big = r >= U32(1 << 31)
        # temp = r + (qb - 2^32) when centered-negative else r
        qm = limb32.sub64(qb, (jnp.zeros_like(r), jnp.ones_like(r)))
        shifted = limb32.add64(qm, (r, jnp.zeros_like(r)))
        temp = (jnp.where(big, shifted[0], r),
                jnp.where(big, shifted[1], jnp.zeros_like(r)))
        corr = _shoup_exact(temp, tgt, t, 2, qb)      # * prod(q) mod m
        s = limb32.reduce_once(limb32.add64(y, corr), qb)
        out = _shoup_exact(s, tgt, t, 6, qb)          # * m_tilde^-1
        ol_ref[0, 0] = out[0]
        oh_ref[0, 0] = out[1]
    return kernel


# ---------------------------------------------------------------------------
# Kernel B: fast_floor — floor(t * x / q) in Bsk.
# ---------------------------------------------------------------------------

def _make_fast_floor_kernel(k: int, n1: int, interpret: bool):
    def kernel(qsrc, tgt, amat,
               xql_ref, xqh_ref, xbl_ref, xbh_ref, ol_ref, oh_ref, zl, zh):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _prescale():
            for j in range(k):
                q = (qsrc[j, 0], qsrc[j, 1])
                x = (xql_ref[0, j], xqh_ref[0, j])
                # zp = x * (t * (q/q_j)^-1) mod q_j, one multiply
                zp = _shoup_exact(x, qsrc, j, 6, q)
                zl[j] = zp[0]
                zh[j] = zp[1]

        qb = (tgt[t, 0], tgt[t, 1])
        two_qb = limb32.add64(qb, qb)
        four_qb = limb32.add64(two_qb, two_qb)
        yb = _shoup_exact((xbl_ref[0, 0], xbh_ref[0, 0]), tgt, t, 10, qb)
        conv = _inner_product(k, zl, zh, amat, t, qb, two_qb, four_qb)
        diff = _sub_mod(yb, conv, qb)
        out = _shoup_exact(diff, tgt, t, 14, qb)      # * prod(q)^-1
        ol_ref[0, 0] = out[0]
        oh_ref[0, 0] = out[1]
    return kernel


# ---------------------------------------------------------------------------
# Kernel C: bsk_to_q — Shenoy-Kumaresan exact conversion back to q.
# ---------------------------------------------------------------------------

def _make_bsk_to_q_kernel(k: int, n1: int, interpret: bool):
    def kernel(qsrc, bsrc, bmat, bfin, glob,
               xl_ref, xh_ref, ol_ref, oh_ref, xpl, xph, negp, magl, magh):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _prescale():
            msk = (glob[0], glob[1])
            two_m = limb32.add64(msk, msk)
            four_m = limb32.add64(two_m, two_m)
            cm = None
            for j in range(k):
                b = (bsrc[j, 0], bsrc[j, 1])
                x = (xl_ref[0, j], xh_ref[0, j])
                xp = _shoup_exact(x, bsrc, j, 2, b)   # * (B/b_j)^-1
                xpl[j] = xp[0]
                xph[j] = xp[1]
                term = _shoup_term(xp, (bsrc[j, 6], bsrc[j, 7]),
                                   (bsrc[j, 8], bsrc[j, 9]), msk)
                cm = term if cm is None else _acc_lazy(cm, term, four_m)
            cm = _norm4(cm, msk, two_m)
            xm = (xl_ref[0, k], xh_ref[0, k])
            w = (glob[4], glob[5])
            wp = (glob[6], glob[7])
            alpha = limb32.reduce_once(limb32.shoup_mulmod_lazy(
                _sub_mod(cm, xm, msk), w, wp, msk), msk)
            neg = limb32.gt64(alpha, (glob[2], glob[3]))   # strict >
            negp[...] = neg.astype(U32)
            mag = limb32.select64(neg, limb32.sub64(msk, alpha), alpha)
            magl[...] = mag[0]
            magh[...] = mag[1]

        q = (qsrc[t, 0], qsrc[t, 1])
        two_q = limb32.add64(q, q)
        four_q = limb32.add64(two_q, two_q)
        cq = _inner_product(k, xpl, xph, bmat, t, q, two_q, four_q)
        corr = _shoup_exact((magl[...], magh[...]), bfin, t, 0, q)
        neg = negp[...] != U32(0)
        plus = limb32.reduce_once(limb32.add64(cq, corr), q)
        minus = _sub_mod(cq, corr, q)
        out = limb32.select64(neg, plus, minus)
        ol_ref[0, 0] = out[0]
        oh_ref[0, 0] = out[1]
    return kernel


# ---------------------------------------------------------------------------
# Wrappers.
# ---------------------------------------------------------------------------

def _vm_kwargs(interpret):
    if interpret:
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)}


def _run(kernel, consts_ops, x_pairs, extra_pairs, C, k_src, k_tgt, n1,
         n_scratch_rows, extra_scratch, interpret):
    """Shared pallas_call plumbing: x (C, k_src) source planes resident
    per step, optional per-target extra input, (C, k_tgt) output."""
    z = np.int32(0)
    src_map = lambda c, t, *refs: (c, z, z, z)
    tgt_map = lambda c, t, *refs: (c, t, z, z)
    bs_src = pl.BlockSpec((1, k_src, n1, N2), src_map,
                          memory_space=pltpu.VMEM)
    bs_tgt = pl.BlockSpec((1, 1, n1, N2), tgt_map, memory_space=pltpu.VMEM)
    in_specs = [bs_src, bs_src]
    args = list(x_pairs)
    for p_ in extra_pairs:
        in_specs += [bs_tgt, bs_tgt]
        args += list(p_)
    scratch = [pltpu.VMEM((n_scratch_rows, n1, N2), jnp.uint32)] * 2 \
        + list(extra_scratch)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(consts_ops),
        grid=(C, k_tgt),
        in_specs=in_specs,
        out_specs=[bs_tgt, bs_tgt],
        scratch_shapes=scratch,
    )
    ol, oh = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((C, k_tgt, n1, N2), jnp.uint32)] * 2,
        interpret=interpret,
        **_vm_kwargs(interpret),
    )(*consts_ops, *args)
    if interpret:
        ol, oh = jax.lax.optimization_barrier((ol, oh))
    return ol, oh


def _split(x, rows):
    """(..., rows, n) u64 -> ((C, rows, n1, N2) lo, hi), leading shape."""
    lead = x.shape[:-2]
    n = x.shape[-1]
    C = 1
    for d in lead:
        C *= d
    xr = x.reshape(C, rows, n // N2, N2)
    return limb32.to_pair(xr), lead, C, n


@functools.partial(jax.jit, static_argnames=("interpret",))
def rns_to_bsk(x, mpc: MultPallasConsts, interpret: bool = False):
    """(..., k, n) base-q residues -> (..., k+1, n) in Bsk.
    Bit-identical to behz.rns_to_bsk."""
    k = mpc.k
    (xl, xh), lead, C, n = _split(x, k)
    n1 = n // N2
    kern = _make_rns_to_bsk_kernel(k, n1, interpret)
    ol, oh = _run(kern, (mpc.qsrc, mpc.tgt, mpc.amat, mpc.glob),
                  (xl, xh), (), C, k, k + 1, n1, k,
                  [pltpu.VMEM((n1, N2), jnp.uint32)], interpret)
    return limb32.from_pair((ol, oh)).reshape(lead + (k + 1, n))


@functools.partial(jax.jit, static_argnames=("interpret",))
def fast_floor(xq, xbsk, mpc: MultPallasConsts, interpret: bool = False):
    """floor(t * x / q) in Bsk: (..., k, n), (..., k+1, n) -> (..., k+1, n).
    Bit-identical to behz.fast_floor."""
    k = mpc.k
    (xql, xqh), lead, C, n = _split(xq, k)
    (xbl, xbh), _, _, _ = _split(xbsk, k + 1)
    n1 = n // N2
    kern = _make_fast_floor_kernel(k, n1, interpret)
    ol, oh = _run(kern, (mpc.qsrc, mpc.tgt, mpc.amat),
                  (xql, xqh), ((xbl, xbh),), C, k, k + 1, n1, k, [],
                  interpret)
    return limb32.from_pair((ol, oh)).reshape(lead + (k + 1, n))


@functools.partial(jax.jit, static_argnames=("interpret",))
def bsk_to_q(x, mpc: MultPallasConsts, interpret: bool = False):
    """Shenoy-Kumaresan (..., k+1, n) in Bsk -> (..., k, n) in q.
    Bit-identical to behz.bsk_to_q."""
    k = mpc.k
    (xl, xh), lead, C, n = _split(x, k + 1)
    n1 = n // N2
    kern = _make_bsk_to_q_kernel(k, n1, interpret)
    ol, oh = _run(kern, (mpc.qsrc, mpc.bsrc, mpc.bmat, mpc.bfin, mpc.glob),
                  (xl, xh), (), C, k + 1, k, n1, k,
                  [pltpu.VMEM((n1, N2), jnp.uint32)] * 3, interpret)
    return limb32.from_pair((ol, oh)).reshape(lead + (k, n))


@functools.partial(jax.jit, static_argnames=("interpret",))
def scale_and_round(xq, xbsk, mpc: MultPallasConsts,
                    interpret: bool = False):
    """fast_floor + bsk_to_q (behz.scale_and_round) on the kernels."""
    return bsk_to_q(fast_floor(xq, xbsk, mpc, interpret=interpret), mpc,
                    interpret=interpret)


# ---------------------------------------------------------------------------
# Target-row-sliced variants for the sharded ('rns' mesh) pipelines.
#
# Under shard_map each shard owns a contiguous band of target rows
# [row0, row0 + rl) while the SOURCE rows arrive whole (one all_gather —
# parallel/spmd_mult.py).  The kernels themselves are unchanged: the
# target-indexed constant banks are dynamic-sliced to the shard's band
# (row0 is a traced axis_index expression; rl is static), so grid axis 1
# runs 0..rl-1 against bank row t == global row row0 + t.  Source banks
# stay whole.  Bit-exactness carries over row-for-row from the full
# kernels (tests/test_spmd_mult.py asserts shard outputs == single-chip).
# ---------------------------------------------------------------------------

def _rows(bank, row0, rl):
    return jax.lax.dynamic_slice_in_dim(bank, row0, rl, axis=0)


@functools.partial(jax.jit, static_argnames=("rl", "interpret"))
def rns_to_bsk_rows(x, mpc: MultPallasConsts, row0, rl: int,
                    interpret: bool = False):
    """Rows [row0, row0+rl) of rns_to_bsk's (..., k+1, n) output from the
    full (..., k, n) base-q input."""
    k = mpc.k
    (xl, xh), lead, C, n = _split(x, k)
    n1 = n // N2
    kern = _make_rns_to_bsk_kernel(k, n1, interpret)
    ol, oh = _run(kern, (mpc.qsrc, _rows(mpc.tgt, row0, rl),
                         _rows(mpc.amat, row0, rl), mpc.glob),
                  (xl, xh), (), C, k, rl, n1, k,
                  [pltpu.VMEM((n1, N2), jnp.uint32)], interpret)
    return limb32.from_pair((ol, oh)).reshape(lead + (rl, n))


@functools.partial(jax.jit, static_argnames=("rl", "interpret"))
def fast_floor_rows(xq, xbsk_rows, mpc: MultPallasConsts, row0, rl: int,
                    interpret: bool = False):
    """Rows [row0, row0+rl) of fast_floor: full (..., k, n) base-q input,
    the shard's own (..., rl, n) Bsk rows."""
    k = mpc.k
    (xql, xqh), lead, C, n = _split(xq, k)
    (xbl, xbh), _, _, _ = _split(xbsk_rows, rl)
    n1 = n // N2
    kern = _make_fast_floor_kernel(k, n1, interpret)
    ol, oh = _run(kern, (mpc.qsrc, _rows(mpc.tgt, row0, rl),
                         _rows(mpc.amat, row0, rl)),
                  (xql, xqh), ((xbl, xbh),), C, k, rl, n1, k, [],
                  interpret)
    return limb32.from_pair((ol, oh)).reshape(lead + (rl, n))


@functools.partial(jax.jit, static_argnames=("rl", "interpret"))
def bsk_to_q_rows(x, mpc: MultPallasConsts, row0, rl: int,
                  interpret: bool = False):
    """Rows [row0, row0+rl) of bsk_to_q's PADDED (..., k+1, n) output
    (row k — the sharded layout's dropped-modulus pad — computes to 0,
    matching the padded XLA shard formula): full (..., k+1, n) Bsk input.

    Padded target banks: bmat/bfin pad rows are zero (every inner-product
    term and the correction vanish), qsrc's pad row reuses row 0's
    modulus limbs so the dead lane arithmetic stays in range."""
    k = mpc.k
    (xl, xh), lead, C, n = _split(x, k + 1)
    n1 = n // N2
    qsrc_pad = jnp.concatenate([mpc.qsrc, mpc.qsrc[:1]], axis=0)
    bmat_pad = jnp.concatenate(
        [mpc.bmat, jnp.zeros((1,) + mpc.bmat.shape[1:], mpc.bmat.dtype)],
        axis=0)
    bfin_pad = jnp.concatenate(
        [mpc.bfin, jnp.zeros((1,) + mpc.bfin.shape[1:], mpc.bfin.dtype)],
        axis=0)
    kern = _make_bsk_to_q_kernel(k, n1, interpret)
    ol, oh = _run(kern, (_rows(qsrc_pad, row0, rl), mpc.bsrc,
                         _rows(bmat_pad, row0, rl),
                         _rows(bfin_pad, row0, rl), mpc.glob),
                  (xl, xh), (), C, k + 1, rl, n1, k,
                  [pltpu.VMEM((n1, N2), jnp.uint32)] * 3, interpret)
    return limb32.from_pair((ol, oh)).reshape(lead + (rl, n))
