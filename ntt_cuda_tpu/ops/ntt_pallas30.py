"""Single-limb fused NTT/INTT kernels for the 30-bit modulus family.

The reference ships a u32-coefficient pipeline for q < 2^30 with u64
intermediates (/root/reference/old/ntt_30bit.cuh:51, parameter.h:129-136)
— roughly half the arithmetic of the 60-bit path.  This is its TPU
counterpart: the same four-step roll+select kernel structure as
ops/ntt_pallas.py, but coefficients live in ONE u32 plane and the Shoup
multiply uses a 32-bit precomputed quotient:

    wp = floor(w * 2^32 / q);  t = v*w - mulhi32(v, wp)*q  (mod 2^32)

which lands in [0, 2q) for any u32 v (Harvey's argument at half width) —
6 lane-multiplies per modular multiply vs 24 for the 60-bit limb-pair
form.  Butterflies stay below 4q < 2^32 (every family modulus is
< 2^30), and the inverse folds n^-1 into its fix table exactly as the
60-bit kernel does.  Bit-exact against the XLA path (ops/ntt.py) and the
integer golden model, including n = 65536.
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
from .ntt_pallas import N2, L2, _bitrev_vec, _roll, _roll_rows


def _expand_stage_a32(planes: np.ndarray, n1: int) -> np.ndarray:
    """(2, n1, 128) compact stage-A planes -> (2, log2(n1)*n1, 128)
    per-stage row-expanded (see ntt_pallas.expand_stage_a)."""
    L1 = n1.bit_length() - 1
    out = np.empty((2, L1 * n1, planes.shape[2]), np.uint32)
    for s in range(L1):
        m = 1 << s
        d = n1 >> (s + 1)
        out[:, s * n1:(s + 1) * n1] = np.repeat(
            planes[:, m:2 * m], 2 * d, axis=1)
    return out

U32 = jnp.uint32


# ---------------------------------------------------------------------------
# Host table construction.
# ---------------------------------------------------------------------------

def _pack32(vals_2d: np.ndarray, q: int) -> np.ndarray:
    """(rows, 128) ints -> (2, rows, 128) u32 planes [w, floor(w*2^32/q)]."""
    rows, cols = vals_2d.shape
    out = np.empty((2, rows, cols), dtype=np.uint32)
    for i in range(rows):
        for j in range(cols):
            w = int(vals_2d[i, j])
            out[0, i, j] = w
            out[1, i, j] = (w << 32) // q
    return out


@functools.lru_cache(maxsize=16)
def _mod_tables30(q: int, psi: int, n: int):
    assert q < (1 << 30), f"30-bit path requires q < 2^30, got {q}"
    n1 = n // N2
    psiinv = hm.modinv(psi, q)
    omega = pow(psi, 2, q)
    psi_A, psi_Ai = pow(psi, N2, q), pow(psiinv, N2, q)
    psi_B, psi_Bi = pow(psi, n1, q), pow(psiinv, n1, q)
    revA = _bitrev_vec(n1)
    revB = _bitrev_vec(N2)

    tabA = np.array([pow(psi_A, int(r), q) for r in revA], dtype=object)
    tabAi = np.array([pow(psi_Ai, int(r), q) for r in revA], dtype=object)
    ta = _pack32(np.broadcast_to(tabA[:, None], (n1, N2)).copy(), q)
    tai = _pack32(np.broadcast_to(tabAi[:, None], (n1, N2)).copy(), q)

    base = (psi * psi_Bi) % q
    ninv = hm.modinv(n, q)
    tc = np.empty((n1, N2), dtype=object)
    tci = np.empty((n1, N2), dtype=object)
    for k1r in range(n1):
        rowg = (base * pow(omega, int(revA[k1r]), q)) % q
        rowg_i = hm.modinv(rowg, q)
        v, vi = 1, ninv
        for i2 in range(N2):
            tc[k1r, i2] = v
            tci[k1r, i2] = vi
            v = (v * rowg) % q
            vi = (vi * rowg_i) % q
    tc_p = _pack32(tc, q)
    tci_p = _pack32(tci, q)

    tabB = [pow(psi_B, int(r), q) for r in revB]
    tabBi = [pow(psi_Bi, int(r), q) for r in revB]
    tbs = np.ones((8, N2), dtype=object)
    tbsi = np.ones((8, N2), dtype=object)
    for s in range(L2):
        m = 1 << s
        step = (N2 // 2) >> s
        for lane in range(N2):
            g = lane // (2 * step)
            tbs[s, lane] = tabB[m + g]
            tbsi[s, lane] = tabBi[m + g]
    tb_p = _pack32(tbs, q)
    tbi_p = _pack32(tbsi, q)

    qconst = np.array([q, 2 * q, 0, 0], dtype=np.uint32)
    return ta, tc_p, tb_p, tai, tci_p, tbi_p, qconst


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["ta", "tc", "tb", "tai", "tci", "tbi", "qconst"],
    meta_fields=["n", "n1"],
)
@dataclasses.dataclass(frozen=True)
class FourStepTables30:
    ta: jax.Array    # (r, 2, log2(n1)*n1, 128) u32 [w, wp32], per-stage rows
    tc: jax.Array
    tb: jax.Array    # (r, 2, 8, 128)
    tai: jax.Array
    tci: jax.Array
    tbi: jax.Array
    qconst: jax.Array  # (r, 4) u32: q, 2q
    n: int
    n1: int

    @staticmethod
    def build(qs, psis, n: int) -> "FourStepTables30":
        parts = [_mod_tables30(int(q), int(p), n) for q, p in zip(qs, psis)]
        n1 = n // N2
        stack = lambda i: jnp.asarray(np.stack([p[i] for p in parts]))
        stack_exp = lambda i: jnp.asarray(np.stack(
            [_expand_stage_a32(p[i], n1) for p in parts]))
        return FourStepTables30(
            ta=stack_exp(0), tc=stack(1), tb=stack(2), tai=stack_exp(3),
            tci=stack(4), tbi=stack(5), qconst=stack(6), n=n, n1=n1)


# ---------------------------------------------------------------------------
# Kernel arithmetic (single u32 plane).
# ---------------------------------------------------------------------------

def _mulhi32(a, b):
    return limb32.mul32_wide(a, b)[1]


def _shoup32(v, w, wp, q):
    """v * w mod q in [0, 2q): 32-bit Shoup (6 lane-multiplies)."""
    return v * w - _mulhi32(v, wp) * q


def _reduce32(x, m):
    return x - m * (x >= m).astype(U32)


def _partner_rows32(x, d, n1, u_mask, interpret):
    return jnp.where(u_mask, _roll_rows(x, n1 - d, interpret),
                     _roll_rows(x, d, interpret))


def _stage_a_fwd30(x, ta_ref, q, two_q, n1, row, interpret):
    L1 = n1.bit_length() - 1
    for s in range(L1):
        d = n1 >> (s + 1)
        u_mask = (row & U32(d)) == 0
        p = _partner_rows32(x, d, n1, u_mask, interpret)
        v_val = jnp.where(u_mask, p, x)
        lo = s * n1
        t = _shoup32(v_val, ta_ref[0, lo:lo + n1, :],
                     ta_ref[1, lo:lo + n1, :], q)
        res_u = _reduce32(x + t, two_q)
        res_v = _reduce32(p + two_q - t, two_q)
        x = jnp.where(u_mask, res_u, res_v)
        if interpret:
            x = jax.lax.optimization_barrier(x)
    return x


def _stage_a_inv30(x, tai_ref, q, two_q, n1, row, interpret):
    L1 = n1.bit_length() - 1
    for s in reversed(range(L1)):
        d = n1 >> (s + 1)
        u_mask = (row & U32(d)) == 0
        p = _partner_rows32(x, d, n1, u_mask, interpret)
        s_sum = _reduce32(x + p, two_q)
        d_dif = p + two_q - x
        lo = s * n1
        t = _shoup32(d_dif, tai_ref[0, lo:lo + n1, :],
                     tai_ref[1, lo:lo + n1, :], q)
        x = jnp.where(u_mask, s_sum, t)
        if interpret:
            x = jax.lax.optimization_barrier(x)
    return x


def _lane_partner32(x, step, u_mask, interpret):
    return jnp.where(u_mask, _roll(x, N2 - step, interpret),
                     _roll(x, step, interpret))


def _stage_b_fwd30(x, tb_ref, q, two_q, lane, interpret):
    for s in range(L2):
        step = (N2 // 2) >> s
        u_mask = (lane & step) == 0
        p = _lane_partner32(x, step, u_mask, interpret)
        v_val = jnp.where(u_mask, p, x)
        t = _shoup32(v_val, tb_ref[0, s:s + 1, :], tb_ref[1, s:s + 1, :], q)
        res_u = _reduce32(x + t, two_q)
        res_v = _reduce32(p + two_q - t, two_q)
        x = jnp.where(u_mask, res_u, res_v)
    return x


def _stage_b_inv30(x, tbi_ref, q, two_q, lane, interpret):
    for s in reversed(range(L2)):
        step = (N2 // 2) >> s
        u_mask = (lane & step) == 0
        p = _lane_partner32(x, step, u_mask, interpret)
        s_ = _reduce32(x + p, two_q)
        d_ = p + two_q - x
        t = _shoup32(d_, tbi_ref[0, s:s + 1, :], tbi_ref[1, s:s + 1, :], q)
        x = jnp.where(u_mask, s_, t)
        if interpret:
            x = jax.lax.optimization_barrier(x)
    return x


def _make_kernel30(n1: int, inverse: bool, interpret: bool):
    def kernel(qc_ref, x_ref, ta_ref, tc_ref, tb_ref, o_ref):
        mi = pl.program_id(0)
        q = qc_ref[mi, 0]
        two_q = qc_ref[mi, 1]
        x = x_ref[0]
        lane = jax.lax.broadcasted_iota(U32, (n1, N2), 1)
        row = jax.lax.broadcasted_iota(U32, (n1, N2), 0)
        if not inverse:
            x = _stage_a_fwd30(x, ta_ref.at[0], q, two_q, n1, row, interpret)
            x = _shoup32(x, tc_ref[0, 0], tc_ref[0, 1], q)
            x = _stage_b_fwd30(x, tb_ref.at[0], q, two_q, lane, interpret)
        else:
            x = _stage_b_inv30(x, tb_ref.at[0], q, two_q, lane, interpret)
            x = _shoup32(x, tc_ref[0, 0], tc_ref[0, 1], q)
            x = _stage_a_inv30(x, tai_ref=ta_ref.at[0], q=q, two_q=two_q,
                               n1=n1, row=row, interpret=interpret)
        o_ref[0] = _reduce32(x, q)
    return kernel


@functools.partial(jax.jit, static_argnames=("inverse", "interpret"))
def _transform30(x32, tables: FourStepTables30, inverse: bool,
                 interpret: bool):
    n, n1 = tables.n, tables.n1
    LA = (n1.bit_length() - 1) * n1
    r = tables.qconst.shape[0]
    batch_shape = x32.shape[:-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    J = B // r
    x32 = x32.reshape(B, n1, N2)

    ta = tables.tai if inverse else tables.ta
    tc = tables.tci if inverse else tables.tc
    tb = tables.tbi if inverse else tables.tb
    z = np.int32(0)
    dmap = lambda m, j, qc: (j * np.int32(r) + m, z, z)
    tmap = lambda m, j, qc: (m, z, z, z)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r, J),
        in_specs=[
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, LA, N2), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n1, N2), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 8, N2), tmap, memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM)],
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        _make_kernel30(n1, inverse, interpret),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, n1, N2), jnp.uint32)],
        interpret=interpret,
        **kwargs,
    )(tables.qconst, x32, ta, tc, tb)[0]
    if interpret:
        out = jax.lax.optimization_barrier(out)
    return out.reshape(batch_shape + (n,))


def _dispatch30(x, tables, inverse: bool, interpret: bool):
    r = tables.qconst.shape[0]
    batch = x.shape[:-1]
    B = int(np.prod(batch)) if batch else 1
    if B % r != 0:
        raise ValueError(f"batch {batch} not a multiple of r={r}")
    x32 = x.astype(U32) if x.dtype != jnp.uint32 else x
    out = _transform30(x32, tables, inverse=inverse, interpret=interpret)
    return out.astype(x.dtype) if x.dtype != jnp.uint32 else out


def ntt_forward(x, tables: FourStepTables30, interpret: bool = False):
    """Forward negacyclic NTT (30-bit family) on the last axis of
    x (..., r, n); u32 or u64 input, same dtype out.  Bit-exact equal to
    ops/ntt.ntt_forward on these moduli."""
    return _dispatch30(x, tables, inverse=False, interpret=interpret)


def ntt_inverse(x, tables: FourStepTables30, interpret: bool = False):
    return _dispatch30(x, tables, inverse=True, interpret=interpret)
