"""Historical kernel designs for the ablation ladder (benchmarks/ablation.py).

The reference documents its design space as five CUDA variants in `old/`
(paper Table 5, D1-D5).  The TPU ladder's equivalents, in the order they
were climbed:

  RI  round-1 shipped design: reshape-interleave forward stage A,
      roll+select inverse WITH per-stage halving, exact-mulhi Shoup in
      [0, 2q)            ~ the "textbook four-step" rung
  CG  Pease constant-geometry stage A (identical access pattern every
      stage, half-size twiddle multiplies) — measured 1.9-3.8x WORSE
      than RI on v5e: Mosaic's strided sublane interleaves dominate
  RS  round-2 step: roll+select both directions, no halving (n^-1 in
      the fix tables), exact-mulhi Shoup
  (shipped v3 = RS + loose-mulhi Shoup in [0, 4q) — ops/ntt_pallas.py)

Every design here is bit-exact (tests/test_ablation_designs.py); they
are kept runnable so the ladder can be re-measured on new toolchains.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntt_cuda_tpu.ops import limb32, ntt_pallas
from ntt_cuda_tpu.ops.ntt_pallas import (
    N2, L2, _expand_rows, _lane_partner, _partner_rows, _plane_pack,
    _tab_slice)

U32 = jnp.uint32


# ---------------------------------------------------------------------------
# Tables.  The shipped FourStepTables carry per-stage-EXPANDED stage-A
# planes (and fold n^-1 into tci); these historical designs slice the
# COMPACT (4, n1, 128) planes and expand in-kernel, and the halving
# designs (RI/CG) need the unscaled tci.
# ---------------------------------------------------------------------------

def _unscale_planes(planes: np.ndarray, q: int, n: int) -> np.ndarray:
    w = planes[0].astype(object) + (planes[1].astype(object) << 32)
    w = (w * n) % q
    return _plane_pack(w, q)


def compact_tables(qs, psis, n, unscale_tci: bool) -> ntt_pallas.FourStepTables:
    """FourStepTables container with COMPACT stage-A planes; tci/tcir
    un-folded (multiplied back by n) for the per-stage-halving designs."""
    parts = [ntt_pallas._mod_tables(int(q), int(p), n)
             for q, p in zip(qs, psis)]
    stack = lambda i: jnp.asarray(np.stack([p[i] for p in parts]))
    tci = stack(4)
    tcir = stack(7)
    if unscale_tci:
        tci = jnp.asarray(np.stack(
            [_unscale_planes(np.asarray(p[4]), int(q), n)
             for p, q in zip(parts, qs)]))
        tcir = jnp.asarray(np.stack(
            [_unscale_planes(np.asarray(p[7]), int(q), n)
             for p, q in zip(parts, qs)]))
    return ntt_pallas.FourStepTables(
        ta=stack(0), tc=stack(1), tb=stack(2), tai=stack(3), tci=tci,
        tbi=stack(5), qconst=stack(6), tcir=tcir, n=n, n1=n // N2)


# ---------------------------------------------------------------------------
# RI design (round-1 shipped): exact Shoup, [0, 2q), per-stage halving.
# ---------------------------------------------------------------------------

def _ri_stage_a_fwd(x, ta_ref, q, two_q, n1):
    L1 = n1.bit_length() - 1
    for s in range(L1):
        m = 1 << s
        d = n1 >> (s + 1)
        xr = tuple(v.reshape(m, 2, d, N2) for v in x)
        u = tuple(v[:, 0] for v in xr)
        v_ = tuple(v[:, 1] for v in xr)
        (w0, w1), (p0, p1) = _tab_slice(ta_ref, m, 2 * m)
        w = (w0.reshape(m, 1, N2), w1.reshape(m, 1, N2))
        wp = (p0.reshape(m, 1, N2), p1.reshape(m, 1, N2))
        t = limb32.shoup_mulmod_lazy(v_, w, wp, q)
        nu = limb32.reduce_once(limb32.add64(u, t), two_q)
        nv = limb32.reduce_once(
            limb32.sub64(limb32.add64(u, two_q), t), two_q)
        x = tuple(jnp.stack([a, b], axis=1).reshape(n1, N2)
                  for a, b in zip(nu, nv))
    return x


def _ri_stage_a_inv(x, tai_ref, q, two_q, q2, n1, row, interpret):
    L1 = n1.bit_length() - 1
    for s in reversed(range(L1)):
        m = 1 << s
        d = n1 >> (s + 1)
        u_mask = (row & U32(d)) == 0
        p = _partner_rows(x, d, n1, u_mask, interpret)
        v_in = limb32.select64(u_mask, p, x)
        u_in = limb32.select64(u_mask, x, p)
        (w0, w1), (p0, p1) = _tab_slice(tai_ref, m, 2 * m)
        w = (_expand_rows(w0, m, d), _expand_rows(w1, m, d))
        wp = (_expand_rows(p0, m, d), _expand_rows(p1, m, d))
        s_sum = limb32.reduce_once(limb32.add64(u_in, v_in), two_q)
        d_dif = limb32.reduce_once(
            limb32.sub64(limb32.add64(u_in, two_q), v_in), two_q)
        t = limb32.shoup_mulmod_lazy(d_dif, w, wp, q)
        res_u = limb32.halve_mod64(s_sum, q2)
        res_v = limb32.halve_mod64(t, q2)
        x = limb32.select64(u_mask, res_u, res_v)
        if interpret:
            x = jax.lax.optimization_barrier(x)
    return x


def _ri_stage_b(x, tb_ref, q, two_q, q2, lane, interpret, inverse):
    rng = reversed(range(L2)) if inverse else range(L2)
    for s in rng:
        step = (N2 // 2) >> s
        u_mask = (lane & step) == 0
        p = _lane_partner(x, step, u_mask, interpret)
        v_in = limb32.select64(u_mask, p, x)
        u_in = limb32.select64(u_mask, x, p)
        w = (tb_ref[0, s:s + 1, :], tb_ref[1, s:s + 1, :])
        wp = (tb_ref[2, s:s + 1, :], tb_ref[3, s:s + 1, :])
        if inverse:
            s_ = limb32.reduce_once(limb32.add64(u_in, v_in), two_q)
            d_ = limb32.reduce_once(
                limb32.sub64(limb32.add64(u_in, two_q), v_in), two_q)
            t = limb32.shoup_mulmod_lazy(d_, w, wp, q)
            res_u = limb32.halve_mod64(s_, q2)
            res_v = limb32.halve_mod64(t, q2)
        else:
            t = limb32.shoup_mulmod_lazy(v_in, w, wp, q)
            res_u = limb32.reduce_once(limb32.add64(u_in, t), two_q)
            res_v = limb32.reduce_once(
                limb32.sub64(limb32.add64(u_in, two_q), t), two_q)
        x = limb32.select64(u_mask, res_u, res_v)
        if interpret and inverse:
            x = jax.lax.optimization_barrier(x)
    return x


# ---------------------------------------------------------------------------
# CG design: Pease constant-geometry stage A (halving variant), exact
# Shoup.  Stage B as in RI.
# ---------------------------------------------------------------------------

def _expand_mod(w, m: int, H: int):
    if m == H:
        return w
    return jnp.broadcast_to(w[None], (H // m, m, N2)).reshape(H, N2)


def _cg_stage_a_fwd(x, ta_ref, q, two_q, n1):
    L1 = n1.bit_length() - 1
    H = n1 // 2
    for s in range(L1):
        m = 1 << s
        u = tuple(v[:H] for v in x)
        v_ = tuple(v[H:] for v in x)
        (w0, w1), (p0, p1) = _tab_slice(ta_ref, m, 2 * m)
        w = (_expand_mod(w0, m, H), _expand_mod(w1, m, H))
        wp = (_expand_mod(p0, m, H), _expand_mod(p1, m, H))
        t = limb32.shoup_mulmod_lazy(v_, w, wp, q)
        nu = limb32.reduce_once(limb32.add64(u, t), two_q)
        nv = limb32.reduce_once(
            limb32.sub64(limb32.add64(u, two_q), t), two_q)
        x = tuple(jnp.stack([a, b], axis=1).reshape(n1, N2)
                  for a, b in zip(nu, nv))
    return x


def _cg_stage_a_inv(x, tai_ref, q, two_q, q2, n1):
    L1 = n1.bit_length() - 1
    H = n1 // 2
    for s in reversed(range(L1)):
        m = 1 << s
        xr = tuple(v.reshape(H, 2, N2) for v in x)
        u = tuple(v[:, 0] for v in xr)
        v_ = tuple(v[:, 1] for v in xr)
        (w0, w1), (p0, p1) = _tab_slice(tai_ref, m, 2 * m)
        w = (_expand_mod(w0, m, H), _expand_mod(w1, m, H))
        wp = (_expand_mod(p0, m, H), _expand_mod(p1, m, H))
        s_sum = limb32.reduce_once(limb32.add64(u, v_), two_q)
        d_dif = limb32.reduce_once(
            limb32.sub64(limb32.add64(u, two_q), v_), two_q)
        t = limb32.shoup_mulmod_lazy(d_dif, w, wp, q)
        ru = limb32.halve_mod64(s_sum, q2)
        rv = limb32.halve_mod64(t, q2)
        x = tuple(jnp.concatenate([a, b], axis=0) for a, b in zip(ru, rv))
    return x


# ---------------------------------------------------------------------------
# RS design: roll+select both directions, no halving, exact Shoup, 2q.
# ---------------------------------------------------------------------------

def _rs_stage_a_fwd(x, ta_ref, q, two_q, n1, row, interpret):
    L1 = n1.bit_length() - 1
    for s in range(L1):
        m = 1 << s
        d = n1 >> (s + 1)
        u_mask = (row & U32(d)) == 0
        p = _partner_rows(x, d, n1, u_mask, interpret)
        v_val = limb32.select64(u_mask, p, x)
        (w0, w1), (p0, p1) = _tab_slice(ta_ref, m, 2 * m)
        w = (_expand_rows(w0, m, d), _expand_rows(w1, m, d))
        wp = (_expand_rows(p0, m, d), _expand_rows(p1, m, d))
        t = limb32.shoup_mulmod_lazy(v_val, w, wp, q)
        res_u = limb32.reduce_once(limb32.add64(x, t), two_q)
        res_v = limb32.reduce_once(
            limb32.sub64(limb32.add64(p, two_q), t), two_q)
        x = limb32.select64(u_mask, res_u, res_v)
        if interpret:
            x = jax.lax.optimization_barrier(x)
    return x


def _rs_stage_a_inv(x, tai_ref, q, two_q, n1, row, interpret):
    L1 = n1.bit_length() - 1
    for s in reversed(range(L1)):
        m = 1 << s
        d = n1 >> (s + 1)
        u_mask = (row & U32(d)) == 0
        p = _partner_rows(x, d, n1, u_mask, interpret)
        s_sum = limb32.reduce_once(limb32.add64(x, p), two_q)
        d_dif = limb32.sub64(limb32.add64(p, two_q), x)
        (w0, w1), (p0, p1) = _tab_slice(tai_ref, m, 2 * m)
        w = (_expand_rows(w0, m, d), _expand_rows(w1, m, d))
        wp = (_expand_rows(p0, m, d), _expand_rows(p1, m, d))
        t = limb32.shoup_mulmod_lazy(d_dif, w, wp, q)
        x = limb32.select64(u_mask, s_sum, t)
        if interpret:
            x = jax.lax.optimization_barrier(x)
    return x


def _rs_stage_b(x, tb_ref, q, two_q, lane, interpret, inverse):
    rng = reversed(range(L2)) if inverse else range(L2)
    for s in rng:
        step = (N2 // 2) >> s
        u_mask = (lane & step) == 0
        p = _lane_partner(x, step, u_mask, interpret)
        w = (tb_ref[0, s:s + 1, :], tb_ref[1, s:s + 1, :])
        wp = (tb_ref[2, s:s + 1, :], tb_ref[3, s:s + 1, :])
        if inverse:
            s_ = limb32.reduce_once(limb32.add64(x, p), two_q)
            d_ = limb32.sub64(limb32.add64(p, two_q), x)
            t = limb32.shoup_mulmod_lazy(d_, w, wp, q)
            x = limb32.select64(u_mask, s_, t)
        else:
            v_val = limb32.select64(u_mask, p, x)
            t = limb32.shoup_mulmod_lazy(v_val, w, wp, q)
            res_u = limb32.reduce_once(limb32.add64(x, t), two_q)
            res_v = limb32.reduce_once(
                limb32.sub64(limb32.add64(p, two_q), t), two_q)
            x = limb32.select64(u_mask, res_u, res_v)
        if interpret and inverse:
            x = jax.lax.optimization_barrier(x)
    return x


# ---------------------------------------------------------------------------
# Kernel factory.
# ---------------------------------------------------------------------------

def _make_kernel(design: str, n1: int, inverse: bool, interpret: bool):
    def kernel(qc_ref, xl_ref, xh_ref, ta_ref, tc_ref, tb_ref,
               ol_ref, oh_ref):
        mi = pl.program_id(0)
        q = (qc_ref[mi, 0], qc_ref[mi, 1])
        two_q = (qc_ref[mi, 2], qc_ref[mi, 3])
        q2 = (qc_ref[mi, 4], qc_ref[mi, 5])
        x = (xl_ref[0], xh_ref[0])
        lane = jax.lax.broadcasted_iota(U32, (n1, N2), 1)
        row = jax.lax.broadcasted_iota(U32, (n1, N2), 0)
        fix = lambda v: limb32.shoup_mulmod_lazy(
            v, (tc_ref[0, 0], tc_ref[0, 1]), (tc_ref[0, 2], tc_ref[0, 3]), q)
        if design in ("RI", "CG"):
            if not inverse:
                a = (_ri_stage_a_fwd if design == "RI"
                     else _cg_stage_a_fwd)
                x = a(x, ta_ref.at[0], q, two_q, n1)
                x = fix(x)
                x = _ri_stage_b(x, tb_ref.at[0], q, two_q, q2, lane,
                                interpret, False)
            else:
                x = _ri_stage_b(x, tb_ref.at[0], q, two_q, q2, lane,
                                interpret, True)
                x = fix(x)
                if design == "RI":
                    x = _ri_stage_a_inv(x, ta_ref.at[0], q, two_q, q2, n1,
                                        row, interpret)
                else:
                    x = _cg_stage_a_inv(x, ta_ref.at[0], q, two_q, q2, n1)
        elif design == "RS":
            if not inverse:
                x = _rs_stage_a_fwd(x, ta_ref.at[0], q, two_q, n1, row,
                                    interpret)
                x = fix(x)
                x = _rs_stage_b(x, tb_ref.at[0], q, two_q, lane, interpret,
                                False)
            else:
                x = _rs_stage_b(x, tb_ref.at[0], q, two_q, lane, interpret,
                                True)
                x = fix(x)
                x = _rs_stage_a_inv(x, ta_ref.at[0], q, two_q, n1, row,
                                    interpret)
        else:
            raise ValueError(design)
        x = limb32.reduce_once(x, q)
        ol_ref[0] = x[0]
        oh_ref[0] = x[1]
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("design", "inverse", "interpret"))
def transform(x64, tables, design: str, inverse: bool,
              interpret: bool = False):
    """Run one ladder design.  RI/CG need tables_unscaled_tci(params);
    RS uses the shipped (n^-1-folded) tables."""
    n, n1 = tables.n, tables.n1
    r = tables.qconst.shape[0]
    batch_shape = x64.shape[:-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    J = B // r
    x64 = x64.reshape(B, n1, N2)
    xl, xh = limb32.to_pair(x64)
    ta = tables.tai if inverse else tables.ta
    tc = tables.tci if inverse else tables.tc
    tb = tables.tbi if inverse else tables.tb
    z = np.int32(0)
    dmap = lambda m, j, qc: (j * np.int32(r) + m, z, z)
    tmap = lambda m, j, qc: (m, z, z, z)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(r, J),
        in_specs=[pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 4, n1, N2), tmap, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 4, n1, N2), tmap, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 4, 8, N2), tmap, memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM)],
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    ol, oh = pl.pallas_call(
        _make_kernel(design, n1, inverse, interpret), grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, n1, N2), jnp.uint32)] * 2,
        interpret=interpret, **kwargs,
    )(tables.qconst, xl, xh, ta, tc, tb)
    if interpret:
        ol, oh = jax.lax.optimization_barrier((ol, oh))
    return limb32.from_pair((ol, oh)).reshape(batch_shape + (n,))
