"""Whole-BFV-op fused Pallas kernels: one twiddle fetch per modulus.

Round-2 profiling showed each BFV op running its dependent r-poly
transform batches as separate kernels at J=1 — every kernel re-fetching
the ~9 MB/modulus twiddle set and round-tripping its intermediate through
HBM (NOTES_NEXT_ROUND.md item 4).  These kernels restructure each op so
that ALL transforms touching one modulus run inside one grid step, with
the twiddle block resident:

* ``keygen_fused`` — the whole keygen pipeline after the draws
  (bfv_keygen.cuh:120-145): per modulus grid step, sk = NTT(s);
  pk0 = NTT(-(INTT(a (.) sk) + e)).  Three chained transforms per step,
  one fetch of the forward+inverse table set, no HBM round trip for sk
  or the INTT intermediate.
* ``half_polymul`` — INTT(NTT(x) (.) y) for NTT-domain y, the
  reference's half_poly_mul_device (poly_arithmetic.cuh:296-310) and
  decrypt's front half (bfv_decryption.cuh:98-101): forward + dyadic +
  inverse per grid step, J-batched over messages with the modulus-major
  grid so tables load once per modulus.
* ``encrypt_fused`` — the whole encryption after the draws
  (bfv_encryption.cuh:247-290): per (modulus, message, half) grid step,
  u_ntt = NTT(u) is computed once per (modulus, message) into VMEM
  scratch (the reference transforms 2r polys for the same u,
  bfv_encryption.cuh:268); then c_h = INTT(u_ntt (.) pk_h) + e_h, the
  modulus drop, and Delta*m + fix — one kernel for the entire op,
  J-batched.  Outputs are split per ciphertext half with an
  m-independent index map so the last-residue steps park on the block
  the next step overwrites in VMEM (the round-2 kernel flushed a
  garbage block to HBM and re-fetched it, VERDICT.md weak #8).

Draws arrive in COMPACT form: the ternary and Gaussian samplers hand the
kernels one shared i32 plane each (b in {-1,0,1,2}, d in [-19,16] —
sampling.ternary_int/gaussian_int) and the per-modulus residue
broadcasts (q+b / q+d, the reference's *_dist_xq expansion) happen
in-kernel (`_ternary_res`/`_gauss_res`), so the (r, n) u64 draw tensors
never exist in HBM: 2 u32 limb planes per modulus of input traffic
become one i32 plane shared across the grid, and the XLA converter
passes disappear.

All kernels are bit-identical to the unfused pipelines (tested in
tests/test_fused_ops.py) — same lazy-Shoup stage math (ops/ntt_pallas),
same strict-`>` quirks (ops/bfv_tail).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limb32
from . import ntt_pallas as ntp
from .bfv_tail import TailConsts, _mod_u64

U32 = jnp.uint32
N2 = 128


def _qvals(qc_ref, mi):
    q = (qc_ref[mi, 0], qc_ref[mi, 1])
    two_q = (qc_ref[mi, 2], qc_ref[mi, 3])
    four_q = limb32.add64(two_q, two_q)
    qinv = (qc_ref[mi, 6], qc_ref[mi, 7])
    return q, two_q, four_q, qinv


def _fwd_chain(x, ta_ref, tc_ref, tb_ref, q, two_q, four_q, n1, row, lane,
               interpret):
    x = ntp._stage_a_fwd(x, ta_ref.at[0], q, four_q, n1, row, interpret)
    x = ntp._elementwise_fix(x, tc_ref.at[0], q)
    x = ntp._stage_b_fwd(x, tb_ref.at[0], q, four_q, lane, interpret)
    return ntp._normalize(x, q, two_q)


def _inv_mul_chain(x, y, tai_ref, tcir_ref, tbi_ref, q, two_q, four_q, qinv,
                   n1, row, lane, interpret):
    """INTT(x (.) y): Montgomery dyadic + inverse chain (tcir carries the
    2^64 skew correction and n^-1) — cf. ntt_pallas._make_kernel_inv_mul."""
    x = limb32.mont_mul_lazy(x, y, q, qinv)
    x = ntp._stage_b_inv(x, tbi_ref.at[0], q, four_q, lane, interpret)
    x = ntp._elementwise_fix(x, tcir_ref.at[0], q)
    x = ntp._stage_a_inv(x, tai_ref.at[0], q, four_q, n1, row, interpret)
    return ntp._normalize(x, q, two_q)


def _add_negate(x, e, q):
    """-(x + e) mod q with the 0 fixup (modmath.add_negate_mod)."""
    s = limb32.reduce_once(limb32.add64(x, e), q)
    r = limb32.sub64(q, s)
    is_q = (r[0] == q[0]) & (r[1] == q[1])
    zero = jnp.zeros_like(r[0])
    return limb32.select64(is_q, (zero, zero), r)


# compact-draw residue expansion: the one shared pair (the compact-draw
# stage kernels in ntt_pallas use the same maps)
_ternary_res = ntp.ternary_res
_gauss_res = ntp.gauss_res


# ---------------------------------------------------------------------------
# keygen_fused
# ---------------------------------------------------------------------------

def _make_keygen_kernel(n1: int, interpret: bool):
    def kernel(qc_ref, sb_ref, al_ref, ah_ref, ed_ref,
               ta_ref, tc_ref, tb_ref, tai_ref, tcir_ref, tbi_ref,
               skl_ref, skh_ref, p0l_ref, p0h_ref):
        mi = pl.program_id(0)
        q, two_q, four_q, qinv = _qvals(qc_ref, mi)
        lane = jax.lax.broadcasted_iota(U32, (n1, N2), 1)
        row = jax.lax.broadcasted_iota(U32, (n1, N2), 0)
        # sk = NTT(s), s expanded from the COMPACT ternary plane in-kernel
        # (bfv_keygen.cuh:129; one i32 plane instead of (r, n) u64 in HBM)
        sk = _fwd_chain(_ternary_res(sb_ref[...], q), ta_ref, tc_ref,
                        tb_ref, q, two_q, four_q, n1, row, lane, interpret)
        skl_ref[0] = sk[0]
        skh_ref[0] = sk[1]
        # INTT(a (.) sk) (bfv_keygen.cuh:132-133)
        x = _inv_mul_chain((al_ref[0], ah_ref[0]), sk, tai_ref, tcir_ref,
                           tbi_ref, q, two_q, four_q, qinv, n1, row, lane,
                           interpret)
        # pk0 = NTT(-(a*s + e)) (bfv_keygen.cuh:144-145)
        x = _add_negate(x, _gauss_res(ed_ref[...], q), q)
        pk0 = _fwd_chain(x, ta_ref, tc_ref, tb_ref, q, two_q, four_q, n1,
                         row, lane, interpret)
        p0l_ref[0] = pk0[0]
        p0h_ref[0] = pk0[1]
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def keygen_fused(s_b, a, e_d, ftab, interpret: bool = False):
    """Compact (n,) i32 ternary s_b, (r, n) u64 NTT-domain a, compact
    (n,) i32 Gaussian e_d -> (sk, pk0), both (r, n) NTT-domain.
    Bit-identical to ntt_forward(ternary-res s), ntt_inverse_mul(a, sk),
    ntt_forward_addneg(., gaussian-res e); the residue broadcasts
    (sampling.ternary/gaussian) happen in-kernel from the shared compact
    planes."""
    r, n = a.shape
    n1 = n // N2
    LA = int(ftab.ta.shape[2])
    sb = s_b.reshape(n1, N2)
    al, ah = limb32.to_pair(a.reshape(r, n1, N2))
    ed = e_d.reshape(n1, N2)

    z = np.int32(0)
    dmap = lambda m, qc: (m, z, z)
    cmap = lambda m, qc: (z, z)
    tmap = lambda m, qc: (m, z, z, z)
    bs = lambda im: pl.BlockSpec((1, n1, N2), im, memory_space=pltpu.VMEM)
    cs = pl.BlockSpec((n1, N2), cmap, memory_space=pltpu.VMEM)
    ts = lambda rows, im: pl.BlockSpec((1, 4, rows, N2), im,
                                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,   # qconst
        grid=(r,),
        in_specs=[cs,                          # s (compact)
                  bs(dmap), bs(dmap),          # a
                  cs,                          # e (compact)
                  ts(LA, tmap), ts(n1, tmap), ts(8, tmap),     # fwd tables
                  ts(LA, tmap), ts(n1, tmap), ts(8, tmap)],    # inv tables
        out_specs=[bs(dmap), bs(dmap),         # sk
                   bs(dmap), bs(dmap)],        # pk0
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    skl, skh, p0l, p0h = pl.pallas_call(
        _make_keygen_kernel(n1, interpret),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((r, n1, N2), jnp.uint32)] * 4,
        interpret=interpret,
        **kwargs,
    )(ftab.qconst, sb, al, ah, ed,
      ftab.ta, ftab.tc, ftab.tb, ftab.tai, ftab.tcir, ftab.tbi)
    if interpret:
        skl, skh, p0l, p0h = jax.lax.optimization_barrier(
            (skl, skh, p0l, p0h))
    sk = limb32.from_pair((skl, skh)).reshape(r, n)
    pk0 = limb32.from_pair((p0l, p0h)).reshape(r, n)
    return sk, pk0


# ---------------------------------------------------------------------------
# half_polymul
# ---------------------------------------------------------------------------

def _make_halfmul_kernel(n1: int, interpret: bool):
    def kernel(qc_ref, xl_ref, xh_ref, yl_ref, yh_ref,
               ta_ref, tc_ref, tb_ref, tai_ref, tcir_ref, tbi_ref,
               ol_ref, oh_ref):
        mi = pl.program_id(0)
        q, two_q, four_q, qinv = _qvals(qc_ref, mi)
        lane = jax.lax.broadcasted_iota(U32, (n1, N2), 1)
        row = jax.lax.broadcasted_iota(U32, (n1, N2), 0)
        x = _fwd_chain((xl_ref[0], xh_ref[0]), ta_ref, tc_ref, tb_ref,
                       q, two_q, four_q, n1, row, lane, interpret)
        x = _inv_mul_chain(x, (yl_ref[0], yh_ref[0]), tai_ref, tcir_ref,
                           tbi_ref, q, two_q, four_q, qinv, n1, row, lane,
                           interpret)
        ol_ref[0] = x[0]
        oh_ref[0] = x[1]
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def half_polymul(x, y_ntt, ftab, interpret: bool = False):
    """INTT(NTT(x) (.) y_ntt) in one kernel — the reference's
    half_poly_mul_device (poly_arithmetic.cuh:296-310).  x (..., r, n)
    coefficient-domain (standard RNS layout, poly b has modulus b % r);
    y_ntt broadcasts against x's batch dims.  Tables load once per
    modulus across the whole batch.  A batch-invariant y (shape equal to
    x's trailing dims, e.g. the sk in batched decrypt) is NOT
    materialized per message: its blocks are indexed by modulus only, so
    the J grid steps of one modulus re-read the same (r, n) planes."""
    n, n1 = ftab.n, ftab.n1
    LA = int(ftab.ta.shape[2])
    r = ftab.qconst.shape[0]
    batch_shape = x.shape[:-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    if B % r != 0:
        raise ValueError(f"batch {batch_shape} not a multiple of r={r}")
    J = B // r
    xl, xh = limb32.to_pair(x.reshape(B, n1, N2))

    z = np.int32(0)
    dmap = lambda m, j, qc: (j * np.int32(r) + m, z, z)
    if y_ntt.shape != x.shape and y_ntt.shape == x.shape[-2:]:
        # shared across the J batch: keep the (r, n) planes, fetch by
        # modulus (no (J, r, n) HBM materialization)
        yl, yh = limb32.to_pair(y_ntt.reshape(r, n1, N2))
        ymap = lambda m, j, qc: (m, z, z)
    else:
        y_ntt = jnp.broadcast_to(y_ntt, x.shape)
        yl, yh = limb32.to_pair(y_ntt.reshape(B, n1, N2))
        ymap = dmap
    tmap = lambda m, j, qc: (m, z, z, z)
    bs = lambda im: pl.BlockSpec((1, n1, N2), im, memory_space=pltpu.VMEM)
    ts = lambda rows, im: pl.BlockSpec((1, 4, rows, N2), im,
                                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r, J),
        in_specs=[bs(dmap), bs(dmap),
                  bs(ymap), bs(ymap),
                  ts(LA, tmap), ts(n1, tmap), ts(8, tmap),
                  ts(LA, tmap), ts(n1, tmap), ts(8, tmap)],
        out_specs=[bs(dmap), bs(dmap)],
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    ol, oh = pl.pallas_call(
        _make_halfmul_kernel(n1, interpret),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, n1, N2), jnp.uint32)] * 2,
        interpret=interpret,
        **kwargs,
    )(ftab.qconst, xl, xh, yl, yh,
      ftab.ta, ftab.tc, ftab.tb, ftab.tai, ftab.tcir, ftab.tbi)
    if interpret:
        ol, oh = jax.lax.optimization_barrier((ol, oh))
    return limb32.from_pair((ol, oh)).reshape(batch_shape + (n,))


# ---------------------------------------------------------------------------
# encrypt_front: c_h = INTT(NTT(u) (.) pk_h) for both halves, one kernel
# ---------------------------------------------------------------------------

def _make_enc_front_kernel(n1: int, interpret: bool):
    def kernel(qc_ref, ub_ref, p0l_ref, p0h_ref, p1l_ref, p1h_ref,
               ta_ref, tc_ref, tb_ref, tai_ref, tcir_ref, tbi_ref,
               c0l_ref, c0h_ref, c1l_ref, c1h_ref):
        mi = pl.program_id(0)
        q, two_q, four_q, qinv = _qvals(qc_ref, mi)
        lane = jax.lax.broadcasted_iota(U32, (n1, N2), 1)
        row = jax.lax.broadcasted_iota(U32, (n1, N2), 0)
        un = _fwd_chain(_ternary_res(ub_ref[...], q), ta_ref, tc_ref,
                        tb_ref, q, two_q, four_q, n1, row, lane, interpret)
        c0 = _inv_mul_chain(un, (p0l_ref[0], p0h_ref[0]), tai_ref, tcir_ref,
                            tbi_ref, q, two_q, four_q, qinv, n1, row, lane,
                            interpret)
        c0l_ref[0] = c0[0]
        c0h_ref[0] = c0[1]
        c1 = _inv_mul_chain(un, (p1l_ref[0], p1h_ref[0]), tai_ref, tcir_ref,
                            tbi_ref, q, two_q, four_q, qinv, n1, row, lane,
                            interpret)
        c1l_ref[0] = c1[0]
        c1h_ref[0] = c1[1]
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def encrypt_front(u_b, pk, ftab, interpret: bool = False):
    """Compact (n,) i32 ternary u_b, (2, r, n) NTT-domain pk ->
    (2, r, n) c with c[h] = INTT(NTT(u) (.) pk[h]) — encryption's whole
    transform front (bfv_encryption.cuh:247-266, with NTT(u) computed
    once and u expanded from the compact plane in-kernel) in one
    twiddle-resident kernel.  Used by the SPMD pipelines, whose tail
    needs the cross-shard ra psum between this and encrypt_tail."""
    _, r, n = pk.shape
    n1 = n // N2
    LA = int(ftab.ta.shape[2])
    ub = u_b.reshape(n1, N2)
    p0l, p0h = limb32.to_pair(pk[0].reshape(r, n1, N2))
    p1l, p1h = limb32.to_pair(pk[1].reshape(r, n1, N2))

    z = np.int32(0)
    dmap = lambda m, qc: (m, z, z)
    cmap = lambda m, qc: (z, z)
    tmap = lambda m, qc: (m, z, z, z)
    bs = lambda im: pl.BlockSpec((1, n1, N2), im, memory_space=pltpu.VMEM)
    cs = pl.BlockSpec((n1, N2), cmap, memory_space=pltpu.VMEM)
    ts = lambda rows, im: pl.BlockSpec((1, 4, rows, N2), im,
                                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r,),
        in_specs=[cs,
                  bs(dmap), bs(dmap),
                  bs(dmap), bs(dmap),
                  ts(LA, tmap), ts(n1, tmap), ts(8, tmap),
                  ts(LA, tmap), ts(n1, tmap), ts(8, tmap)],
        out_specs=[bs(dmap)] * 4,
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    c0l, c0h, c1l, c1h = pl.pallas_call(
        _make_enc_front_kernel(n1, interpret),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((r, n1, N2), jnp.uint32)] * 4,
        interpret=interpret,
        **kwargs,
    )(ftab.qconst, ub, p0l, p0h, p1l, p1h,
      ftab.ta, ftab.tc, ftab.tb, ftab.tai, ftab.tcir, ftab.tbi)
    if interpret:
        c0l, c0h, c1l, c1h = jax.lax.optimization_barrier(
            (c0l, c0h, c1l, c1h))
    c0 = limb32.from_pair((c0l, c0h)).reshape(r, n)
    c1 = limb32.from_pair((c1l, c1h)).reshape(r, n)
    return jnp.stack([c0, c1])


# ---------------------------------------------------------------------------
# encrypt_fused (whole op, J-batched)
# ---------------------------------------------------------------------------

def _make_enc_kernel(fix_th: int, r: int, n1: int, interpret: bool):
    """Grid (r, J, 2): m_step 0 is the LAST residue (both message/half
    pairs first — its adjusted residue ra lives in VMEM scratch for the
    kept-residue steps), m_step >= 1 is kept residue m_step-1.  u_ntt is
    computed at h == 0 and reused from scratch at h == 1."""
    rr = np.int32(r)

    def kernel(pm_ref, gl_ref, qc_ref, ub_ref, pkl_ref, pkh_ref,
               ed_ref, ml_ref, mh_ref,
               ta_ref, tc_ref, tb_ref, tai_ref, tcir_ref, tbi_ref,
               ol_ref, oh_ref,
               un_l, un_h, ra_l, ra_h):
        m_step = pl.program_id(0)
        j = pl.program_id(1)
        h = pl.program_id(2)
        mi = jnp.where(m_step == 0, rr - 1, m_step - 1)
        qq, two_q, four_q, qinv = _qvals(qc_ref, mi)
        lane = jax.lax.broadcasted_iota(U32, (n1, N2), 1)
        row = jax.lax.broadcasted_iota(U32, (n1, N2), 0)

        # u_ntt once per (modulus, message) — the reference's 2r-forward
        # batch transforms the same u twice (bfv_encryption.cuh:268); u
        # expands from the COMPACT ternary plane in-kernel
        @pl.when(h == 0)
        def _fwd_u():
            x = _fwd_chain(_ternary_res(ub_ref[0], qq), ta_ref, tc_ref,
                           tb_ref, qq, two_q, four_q, n1, row, lane,
                           interpret)
            un_l[...] = x[0]
            un_h[...] = x[1]

        # c_h = INTT(u_ntt (.) pk_h)
        x = _inv_mul_chain((un_l[...], un_h[...]), (pkl_ref[0], pkh_ref[0]),
                           tai_ref, tcir_ref, tbi_ref, qq, two_q, four_q,
                           qinv, n1, row, lane, interpret)
        # c += e (strict `>` quirk, poly_add_xq); e expands from the
        # compact Gaussian plane in-kernel
        s = limb32.add64(x, _gauss_res(ed_ref[0], qq))
        s = limb32.cond_sub64(s, qq, limb32.gt64(s, qq))

        q_last = (gl_ref[0], gl_ref[1])
        half = (gl_ref[2], gl_ref[3])

        @pl.when(m_step == 0)
        def _last():
            # adjusted last residue -> scratch (divide_and_round's
            # `last += q_last/2` broadcast operand)
            ra = limb32.add64(s, half)
            ra = limb32.reduce_once(ra, q_last)
            ra_l[j, h] = ra[0]
            ra_h[j, h] = ra[1]

        @pl.when(m_step > 0)
        def _kept():
            ki = m_step - 1
            q = (pm_ref[ki, 0], pm_ref[ki, 1])
            qinv_k = (pm_ref[ki, 2], pm_ref[ki, 3])
            nu = (pm_ref[ki, 4], pm_ref[ki, 5])
            half_mod = (pm_ref[ki, 6], pm_ref[ki, 7])
            invq_mont = (pm_ref[ki, 8], pm_ref[ki, 9])
            qi_div_t = (pm_ref[ki, 10], pm_ref[ki, 11])
            ra = (ra_l[j, h], ra_h[j, h])
            zero = (jnp.zeros_like(q[0]), jnp.zeros_like(q[1]))
            tmp = _mod_u64(ra, q, nu)
            tmp = limb32.add64(tmp, limb32.select64(
                limb32.lt64(tmp, half_mod), q, zero))
            tmp = limb32.sub64(tmp, half_mod)
            v = limb32.add64(s, limb32.select64(limb32.lt64(s, tmp), q,
                                                zero))
            v = limb32.sub64(v, tmp)
            out = limb32.mont_mul_lazy(v, invq_mont, q, qinv_k)
            out = limb32.reduce_once(out, q)

            # weird_m_stuff on half 0 only (bfv_encryption.cuh:193-213);
            # both halves land in ONE output array indexed (j, h, ki) so
            # the caller needs no jnp.stack pass (an HBM copy per ct)
            @pl.when(h == 0)
            def _c0():
                mw = (ml_ref[0], mh_ref[0])
                fix = ((mw[0] >= U32(fix_th)).astype(U32),
                       jnp.zeros_like(mw[1]))
                dm = limb32.mullo64(mw, qi_div_t)
                withm = limb32.add64(limb32.add64(out, dm), fix)
                withm = _mod_u64(withm, q, nu)
                ol_ref[0] = withm[0]
                oh_ref[0] = withm[1]

            @pl.when(h == 1)
            def _c1():
                ol_ref[0] = out[0]
                oh_ref[0] = out[1]
    return kernel


# The (J, 2, n, u32-pair) ra scratch grows linearly with the message
# batch (16*n bytes per message): past this budget the kernel would blow
# the 100 MB vmem_limit_bytes (tables + pipelined IO blocks take the
# rest), so encrypt_fused transparently splits larger batches into
# chunks of max_encrypt_batch(n) messages (twiddle amortization is
# intact within each chunk).
_ENC_SCRATCH_BUDGET_BYTES = 48 * 1024 * 1024


def max_encrypt_batch(n: int) -> int:
    """Largest J one encrypt_fused kernel launch handles at size n."""
    return max(1, _ENC_SCRATCH_BUDGET_BYTES // (16 * n))


@functools.partial(jax.jit, static_argnames=("interpret",))
def encrypt_fused(u_b, pk, e_d, m_poly, ftab, consts: TailConsts,
                  interpret: bool = False):
    """The whole encryption after the draws, J-batched, in ONE kernel.

    u_b (J, n) COMPACT i32 ternary draws, pk (2, r, n) NTT-domain,
    e_d (J, 2, n) compact i32 Gaussian draws, m_poly (J, n) messages ->
    (J, 2, r-1, n) ciphertexts.  Bit-identical to [per message]
    ntt_forward(ternary-res u), ntt_inverse_mul(broadcast, pk),
    encrypt_tail with gaussian-res e — the residue broadcasts happen
    in-kernel, so no (r, n) u64 draw tensor ever reaches HBM.  Leading J
    dims may be omitted for a single message.  Batches larger than
    max_encrypt_batch(n) run as multiple kernel launches."""
    single = u_b.ndim == 1
    if single:
        u_b, e_d, m_poly = u_b[None], e_d[None], m_poly[None]
    J, n = u_b.shape
    jmax = max_encrypt_batch(n)
    if J > jmax:
        cts = [encrypt_fused(u_b[o:o + jmax], pk, e_d[o:o + jmax],
                             m_poly[o:o + jmax], ftab, consts,
                             interpret=interpret)
               for o in range(0, J, jmax)]
        return jnp.concatenate(cts, axis=0)
    r = pk.shape[1]
    n1 = n // N2
    LA = int(ftab.ta.shape[2])
    ub = u_b.reshape(J, n1, N2)
    pkl, pkh = limb32.to_pair(pk.reshape(2 * r, n1, N2))
    ed = e_d.reshape(J * 2, n1, N2)
    ml, mh = limb32.to_pair(m_poly.reshape(J, n1, N2))

    z = np.int32(0)
    rr = np.int32(r)
    rk = np.int32(r - 1)
    res = lambda m: jnp.where(m == 0, rr - 1, m - 1)
    umap = lambda m, j, h, pm, gl, qc: (j, z, z)
    pmap = lambda m, j, h, pm, gl, qc: (h * rr + res(m), z, z)
    emap = lambda m, j, h, pm, gl, qc: (j * np.int32(2) + h, z, z)
    mmap = lambda m, j, h, pm, gl, qc: (j, z, z)
    # Both ciphertext halves land in ONE (J*2*(r-1) + 1)-block output,
    # indexed (j, h, ki) — the caller assembles (J, 2, r-1, n) with a
    # reshape instead of a jnp.stack HBM pass.  The m=0 steps (which
    # produce only the ra scratch) park on the trailing DUMMY block:
    # the index stays constant across them (at most one garbage flush)
    # and every real block is written exactly once.
    # nblk/z (np.int32), NOT python literals: under x64 a bare literal
    # branch makes jnp.where emit a convert_element_type(i64->i32) in
    # the index-map jaxpr, and Mosaic's _convert_helper recurses forever
    # on 64-bit casts — one such literal was the round-3 "32k op
    # schedule RecursionError" (tests/test_lowering.py guards this)
    nblk = np.int32(J * 2 * (r - 1))
    rk2 = np.int32(2 * (r - 1))
    omap = lambda m, j, h, pm, gl, qc: (
        jnp.where(m == 0, nblk, j * rk2 + h * rk + m - 1), z, z)
    tmap = lambda m, j, h, pm, gl, qc: (res(m), z, z, z)
    bs = lambda im: pl.BlockSpec((1, n1, N2), im, memory_space=pltpu.VMEM)
    ts = lambda rows, im: pl.BlockSpec((1, 4, rows, N2), im,
                                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,   # per_mod (r-1 rows), glob, qconst
        grid=(r, J, 2),
        in_specs=[bs(umap),                    # u (compact i32)
                  bs(pmap), bs(pmap),
                  bs(emap),                    # e (compact i32)
                  bs(mmap), bs(mmap),
                  ts(LA, tmap), ts(n1, tmap), ts(8, tmap),
                  ts(LA, tmap), ts(n1, tmap), ts(8, tmap)],
        out_specs=[bs(omap), bs(omap)],
        scratch_shapes=[pltpu.VMEM((n1, N2), jnp.uint32)] * 2
        + [pltpu.VMEM((J, 2, n1, N2), jnp.uint32)] * 2,
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    ol, oh = pl.pallas_call(
        _make_enc_kernel(consts.fix_th, r, n1, interpret),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((J * 2 * (r - 1) + 1, n1, N2),
                                        jnp.uint32)] * 2,
        interpret=interpret,
        **kwargs,
    )(consts.per_mod, consts.glob, ftab.qconst, ub, pkl, pkh, ed,
      ml, mh, ftab.ta, ftab.tc, ftab.tb, ftab.tai, ftab.tcir, ftab.tbi)
    if interpret:
        ol, oh = jax.lax.optimization_barrier((ol, oh))
    nb = J * 2 * (r - 1)
    ct = limb32.from_pair((ol[:nb], oh[:nb])).reshape(J, 2, r - 1, n)
    return ct[0] if single else ct


# ---------------------------------------------------------------------------
# keyswitch_fused (relinearization / Galois key switching, whole op)
# ---------------------------------------------------------------------------

def _make_keyswitch_kernel(k: int, r: int, n1: int, interpret: bool):
    """Grid (J, r) with m_step 0 = the LAST modulus (its adjusted residue
    pair lives in VMEM scratch for the kept-residue steps, exactly like
    encrypt_fused).  Per modulus step: k digit reductions + k forward
    chains + dyadic-accumulate against both key rows + 2 inverse chains
    + the divide_and_round_q_last tail — one twiddle fetch per modulus
    for the whole key switch (the XLA path round-trips the (k, r, n)
    digit tensor and the (2, r, n) accumulator chains through HBM)."""
    from .bfv_tail import _mod_u64
    rr = np.int32(r)

    def kernel(pm_ref, gl_ref, nub_ref, qc_ref, c2l_ref, c2h_ref,
               kl_ref, kh_ref,
               ta_ref, tc_ref, tb_ref, tai_ref, tcir_ref, tbi_ref,
               o0l_ref, o0h_ref, o1l_ref, o1h_ref, ra_l, ra_h):
        m_step = pl.program_id(1)
        mi = jnp.where(m_step == 0, rr - 1, m_step - 1)
        qq, two_q, four_q, qinv = _qvals(qc_ref, mi)
        nu = (nub_ref[mi, 0], nub_ref[mi, 1])
        lane = jax.lax.broadcasted_iota(U32, (n1, N2), 1)
        row = jax.lax.broadcasted_iota(U32, (n1, N2), 0)

        acc0 = acc1 = None
        for j in range(k):
            d = _mod_u64((c2l_ref[0, j], c2h_ref[0, j]), qq, nu)
            dh = _fwd_chain(d, ta_ref, tc_ref, tb_ref, qq, two_q, four_q,
                            n1, row, lane, interpret)
            # Montgomery dyadic products; the single 2^-64 skew of the
            # accumulated sum is corrected by the inverse chain's tcir
            t0 = limb32.reduce_once(limb32.mont_mul_lazy(
                dh, (kl_ref[0, j], kh_ref[0, j]), qq, qinv), qq)
            t1 = limb32.reduce_once(limb32.mont_mul_lazy(
                dh, (kl_ref[0, k + j], kh_ref[0, k + j]), qq, qinv), qq)
            if acc0 is None:
                acc0, acc1 = t0, t1
            else:
                acc0 = limb32.reduce_once(limb32.add64(acc0, t0), qq)
                acc1 = limb32.reduce_once(limb32.add64(acc1, t1), qq)
            if interpret:
                acc0, acc1 = jax.lax.optimization_barrier((acc0, acc1))

        def inv_chain(x):
            x = ntp._stage_b_inv(x, tbi_ref.at[0], qq, four_q, lane,
                                 interpret)
            x = ntp._elementwise_fix(x, tcir_ref.at[0], qq)
            x = ntp._stage_a_inv(x, tai_ref.at[0], qq, four_q, n1, row,
                                 interpret)
            return ntp._normalize(x, qq, two_q)

        cc0 = inv_chain(acc0)
        cc1 = inv_chain(acc1)

        q_last = (gl_ref[0], gl_ref[1])
        half = (gl_ref[2], gl_ref[3])

        @pl.when(m_step == 0)
        def _last():
            for h, cc in ((0, cc0), (1, cc1)):
                ra = limb32.add64(cc, half)
                ra = limb32.reduce_once(ra, q_last)
                ra_l[h] = ra[0]
                ra_h[h] = ra[1]

        @pl.when(m_step > 0)
        def _kept():
            ki = m_step - 1
            q = (pm_ref[ki, 0], pm_ref[ki, 1])
            qinv_k = (pm_ref[ki, 2], pm_ref[ki, 3])
            nu_k = (pm_ref[ki, 4], pm_ref[ki, 5])
            half_mod = (pm_ref[ki, 6], pm_ref[ki, 7])
            invq_mont = (pm_ref[ki, 8], pm_ref[ki, 9])
            zero = (jnp.zeros_like(q[0]), jnp.zeros_like(q[1]))
            for h, cc, ol, oh in ((0, cc0, o0l_ref, o0h_ref),
                                  (1, cc1, o1l_ref, o1h_ref)):
                ra = (ra_l[h], ra_h[h])
                tmp = _mod_u64(ra, q, nu_k)
                tmp = limb32.add64(tmp, limb32.select64(
                    limb32.lt64(tmp, half_mod), q, zero))
                tmp = limb32.sub64(tmp, half_mod)
                v = limb32.add64(cc, limb32.select64(
                    limb32.lt64(cc, tmp), q, zero))
                v = limb32.sub64(v, tmp)
                out = limb32.mont_mul_lazy(v, invq_mont, q, qinv_k)
                out = limb32.reduce_once(out, q)
                ol[0] = out[0]
                oh[0] = out[1]
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def keyswitch_fused(c2, ksk, ftab, consts: TailConsts, nub,
                    interpret: bool = False):
    """(..., k, n) digit source + (2, k, r, n) NTT-domain switching keys
    -> (..., 2, k, n): the whole key switch (digit decomposition, k
    forward transforms, dyadic accumulation against both key rows, 2
    inverse transforms, divide_and_round_q_last) in ONE kernel per
    modulus grid step.  Bit-identical to models.bfv._keyswitch_jit's
    unfused pipeline.  nub: (r, 2) u32 floor(2^64/q_i) limb pairs."""
    single = c2.ndim == 2
    if single:
        c2 = c2[None]
    J, k, n = c2.shape
    r = ksk.shape[2]
    n1 = n // N2
    LA = int(ftab.ta.shape[2])
    cl, ch = limb32.to_pair(c2.reshape(J, k, n1, N2))
    # key rows per modulus: (2, k, r, n) -> (r, 2k, n1, N2)
    kt = jnp.moveaxis(ksk, 2, 0).reshape(r, 2 * k, n1, N2)
    ktl, kth = limb32.to_pair(kt)

    z = np.int32(0)
    rr = np.int32(r)
    rk = np.int32(r - 1)
    res = lambda m: jnp.where(m == 0, rr - 1, m - 1)
    cmap = lambda j, m, pm, gl, nb, qc: (j, z, z, z)
    kmap = lambda j, m, pm, gl, nb, qc: (res(m), z, z, z)
    tmap = lambda j, m, pm, gl, nb, qc: (res(m), z, z, z)
    omap = lambda j, m, pm, gl, nb, qc: (
        jnp.where(m == 0, j * rk, j * rk + m - 1), z, z)
    cs = pl.BlockSpec((1, k, n1, N2), cmap, memory_space=pltpu.VMEM)
    ks = pl.BlockSpec((1, 2 * k, n1, N2), kmap, memory_space=pltpu.VMEM)
    bs = pl.BlockSpec((1, n1, N2), omap, memory_space=pltpu.VMEM)
    ts = lambda rows: pl.BlockSpec((1, 4, rows, N2), tmap,
                                   memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,   # per_mod, glob, nub, qconst
        grid=(J, r),
        in_specs=[cs, cs, ks, ks,
                  ts(LA), ts(n1), ts(8), ts(LA), ts(n1), ts(8)],
        out_specs=[bs] * 4,
        scratch_shapes=[pltpu.VMEM((2, n1, N2), jnp.uint32)] * 2,
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    o0l, o0h, o1l, o1h = pl.pallas_call(
        _make_keyswitch_kernel(k, r, n1, interpret),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((J * (r - 1), n1, N2),
                                        jnp.uint32)] * 4,
        interpret=interpret,
        **kwargs,
    )(consts.per_mod, consts.glob, nub, ftab.qconst, cl, ch, ktl, kth,
      ftab.ta, ftab.tc, ftab.tb, ftab.tai, ftab.tcir, ftab.tbi)
    if interpret:
        o0l, o0h, o1l, o1h = jax.lax.optimization_barrier(
            (o0l, o0h, o1l, o1h))
    c0 = limb32.from_pair((o0l, o0h)).reshape(J, r - 1, n)
    c1 = limb32.from_pair((o1l, o1h)).reshape(J, r - 1, n)
    out = jnp.stack([c0, c1], axis=1)      # (J, 2, r-1, n)
    return out[0] if single else out

def _make_keyswitch_front_kernel(k: int, n1: int, interpret: bool):
    """keyswitch_fused WITHOUT the divide_and_round_q_last tail, over an
    arbitrary band of modulus rows (grid (J, band)): k digit reductions
    + k forward chains + dyadic-accumulate against both key rows + 2
    inverse chains, emitting the canonical accumulated pair.  The
    sharded key switch (parallel/spmd_mult._keyswitch_shard) runs this
    per shard row band; the modulus drop needs a cross-shard psum so it
    stays in the shard program."""
    def kernel(nub_ref, qc_ref, c2l_ref, c2h_ref, kl_ref, kh_ref,
               ta_ref, tc_ref, tb_ref, tai_ref, tcir_ref, tbi_ref,
               o0l_ref, o0h_ref, o1l_ref, o1h_ref):
        m = pl.program_id(1)
        qq, two_q, four_q, qinv = _qvals(qc_ref, m)
        nu = (nub_ref[m, 0], nub_ref[m, 1])
        lane = jax.lax.broadcasted_iota(U32, (n1, N2), 1)
        row = jax.lax.broadcasted_iota(U32, (n1, N2), 0)

        acc0 = acc1 = None
        for j in range(k):
            d = _mod_u64((c2l_ref[0, j], c2h_ref[0, j]), qq, nu)
            dh = _fwd_chain(d, ta_ref, tc_ref, tb_ref, qq, two_q, four_q,
                            n1, row, lane, interpret)
            t0 = limb32.reduce_once(limb32.mont_mul_lazy(
                dh, (kl_ref[0, j], kh_ref[0, j]), qq, qinv), qq)
            t1 = limb32.reduce_once(limb32.mont_mul_lazy(
                dh, (kl_ref[0, k + j], kh_ref[0, k + j]), qq, qinv), qq)
            if acc0 is None:
                acc0, acc1 = t0, t1
            else:
                acc0 = limb32.reduce_once(limb32.add64(acc0, t0), qq)
                acc1 = limb32.reduce_once(limb32.add64(acc1, t1), qq)
            if interpret:
                acc0, acc1 = jax.lax.optimization_barrier((acc0, acc1))

        def inv_chain(x):
            x = ntp._stage_b_inv(x, tbi_ref.at[0], qq, four_q, lane,
                                 interpret)
            x = ntp._elementwise_fix(x, tcir_ref.at[0], qq)
            x = ntp._stage_a_inv(x, tai_ref.at[0], qq, four_q, n1, row,
                                 interpret)
            return ntp._normalize(x, qq, two_q)

        cc0 = inv_chain(acc0)
        cc1 = inv_chain(acc1)
        o0l_ref[0] = cc0[0]
        o0h_ref[0] = cc0[1]
        o1l_ref[0] = cc1[0]
        o1h_ref[0] = cc1[1]
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def keyswitch_front_fused(c2, ksk_rows, ftab_rows, nub_rows,
                          interpret: bool = False):
    """(..., k, n) digit source + (2, k, RL, n) switching-key rows over a
    band of RL modulus rows (with that band's ftab/nub slices) ->
    (..., 2, RL, n) canonical key-switch accumulators (the Montgomery
    dyadic skew is corrected by tcir, as in keyswitch_fused).
    Bit-identical to the unfused fwd + dyadic-acc + inverse pipeline on
    the same rows (tests/test_fused_ops.py)."""
    single = c2.ndim == 2
    if single:
        c2 = c2[None]
    J, k, n = c2.shape
    RL = ksk_rows.shape[2]
    n1 = n // N2
    LA = int(ftab_rows.ta.shape[2])
    cl, ch = limb32.to_pair(c2.reshape(J, k, n1, N2))
    kt = jnp.moveaxis(ksk_rows, 2, 0).reshape(RL, 2 * k, n1, N2)
    ktl, kth = limb32.to_pair(kt)

    z = np.int32(0)
    rl32 = np.int32(RL)
    cmap = lambda j, m, nb, qc: (j, z, z, z)
    kmap = lambda j, m, nb, qc: (m, z, z, z)
    tmap = lambda j, m, nb, qc: (m, z, z, z)
    omap = lambda j, m, nb, qc: (j * rl32 + m, z, z)
    cs = pl.BlockSpec((1, k, n1, N2), cmap, memory_space=pltpu.VMEM)
    ks = pl.BlockSpec((1, 2 * k, n1, N2), kmap, memory_space=pltpu.VMEM)
    bs = pl.BlockSpec((1, n1, N2), omap, memory_space=pltpu.VMEM)
    ts = lambda rows: pl.BlockSpec((1, 4, rows, N2), tmap,
                                   memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # nub, qconst
        grid=(J, RL),
        in_specs=[cs, cs, ks, ks,
                  ts(LA), ts(n1), ts(8), ts(LA), ts(n1), ts(8)],
        out_specs=[bs] * 4,
        scratch_shapes=[],
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    o0l, o0h, o1l, o1h = pl.pallas_call(
        _make_keyswitch_front_kernel(k, n1, interpret),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((J * RL, n1, N2), jnp.uint32)] * 4,
        interpret=interpret,
        **kwargs,
    )(nub_rows, ftab_rows.qconst, cl, ch, ktl, kth,
      ftab_rows.ta, ftab_rows.tc, ftab_rows.tb,
      ftab_rows.tai, ftab_rows.tcir, ftab_rows.tbi)
    if interpret:
        o0l, o0h, o1l, o1h = jax.lax.optimization_barrier(
            (o0l, o0h, o1l, o1h))
    c0 = limb32.from_pair((o0l, o0h)).reshape(J, RL, n)
    c1 = limb32.from_pair((o1l, o1h)).reshape(J, RL, n)
    out = jnp.stack([c0, c1], axis=1)      # (J, 2, RL, n)
    return out[0] if single else out
