"""Fused four-step negacyclic NTT/INTT Pallas kernels (the TPU hot path).

This is the TPU re-design of the reference's D5 "hybrid" kernel
(CTBasedNTTInnerSingle + multi-kernel stages, ntt_60bit.cuh:63-386).
Where the GPU splits stages between global-memory launches and a
shared-memory fused kernel, here the whole transform runs in one Pallas
kernel with the polynomial resident in VMEM, decomposed four-step style
(n = n1 x 128) so every stage is vector-shaped:

* stage A  — log2(n1) Cooley-Tukey stages over the SUBLANE axis
  (row-pair butterflies), a merged negacyclic length-n1 NTT with
  psi_A = psi^128;
* twiddle fix — one elementwise multiply by
  T[k1r, i2] = psi^i2 * psi_B^{-i2} * omega^{i2 * rev(k1r)};
* stage B  — 7 Gentleman-transposed stages over the LANE axis
  (pltpu.roll exchanges), a merged negacyclic length-128 NTT with
  psi_B = psi^(n/128).

Because both sub-transforms use the merged CT-bitrev form, the natural
row-major output of the (n1, 128) tile IS the reference's bit-reversed
output — no transposes, no permutations (verified exactly in
tests/test_ntt_pallas.py).  The inverse runs the mirror (lane GS
stages, inverse twiddle fix, row GS stages).

Every stage — rows and lanes, both directions — uses the roll+select
form: each element fetches its butterfly partner via two cyclic rotates
and a mask select, and the twiddle product runs once per element.
Mosaic compiles rotates at full VPU speed in any stage order, where the
textbook reshape-interleave form is ~8x slower for ascending pair
distances and measurably slower even descending (34 -> 24 us/transform
at n=2^15 from this change alone on v5e); a Pease constant-geometry
variant (identical access pattern every stage, half-size multiplies)
measured 1.9-3.8x WORSE — Mosaic's strided sublane interleaves dominate
(benchmarks/designs.py, NOTES_NEXT_ROUND.md).

Arithmetic: u32-limb Shoup multiplication (ops/limb32.py) with two
deliberate departures from the reference's per-stage bookkeeping, both
bit-identical after final normalization:

* **No per-stage GS halving.**  The reference folds n^-1 as one 2^-1
  per inverse stage (ntt_60bit.cuh:132,166); here the whole n^-1 folds
  into the inverse twiddle-fix tables (tci/tcir) — the same field
  element, 15 fewer halving passes per transform.
* **Loose-mulhi Shoup in a [0, 4q) lazy domain**
  (limb32.shoup_mulmod_lazy4): the quotient estimate drops the a0*b0
  partial product (underestimate <= 1, output < 3q), saving 4 of 16
  high-half multiplies; butterflies stay < 8q < 2^64 for q < 2^61, and
  two conditional subtracts normalize outputs to [0, q).

Measured on v5e at n=2^15 (16-modulus batch, same epoch): forward
34.5 -> 18.3 us/transform, inverse 30.8 -> 20.8 (V100 baselines: 39/23).

Twiddles: the stage-A tables are stored per-stage row-EXPANDED
((4, log2(n1)*n1, 128) — expand_stage_a) because the in-kernel
broadcast+reshape expand of compact rows cost ~4.3 us per stage-A pass,
net of the larger fetch (which the grid pipeline hides).  Fix tables
stay compact (4, n1, 128), stage-B (4, 8, 128): ~9 MB per 55-bit modulus
at n = 2^15.
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
N2 = 128   # lane-axis transform length
L2 = 7


# ---------------------------------------------------------------------------
# Host table construction (exact ints).
# ---------------------------------------------------------------------------

def _shoup(w: int, q: int) -> int:
    return (w << 64) // q


def _plane_pack(vals_2d: np.ndarray, q: int) -> np.ndarray:
    """(rows, 128) int-object array -> (4, rows, 128) u32 planes
    [w_lo, w_hi, wp_lo, wp_hi]."""
    if q < (1 << 61):
        from .. import native
        if native.available():
            v = np.vectorize(int, otypes=[np.uint64])(vals_2d)
            return native.shoup_planes(v, q)
    rows, cols = vals_2d.shape
    w = vals_2d.astype(object)
    wp = np.empty_like(w)
    for i in range(rows):
        for j in range(cols):
            wp[i, j] = _shoup(int(w[i, j]), q)
    m32 = (1 << 32) - 1
    out = np.empty((4, rows, cols), dtype=np.uint32)
    out[0] = np.vectorize(lambda x: int(x) & m32, otypes=[np.uint32])(w)
    out[1] = np.vectorize(lambda x: (int(x) >> 32) & m32, otypes=[np.uint32])(w)
    out[2] = np.vectorize(lambda x: int(x) & m32, otypes=[np.uint32])(wp)
    out[3] = np.vectorize(lambda x: (int(x) >> 32) & m32, otypes=[np.uint32])(wp)
    return out


def _bitrev_vec(k: int) -> np.ndarray:
    L = k.bit_length() - 1
    v = np.arange(k)
    r = np.zeros(k, dtype=np.int64)
    for b in range(L):
        r = (r << 1) | ((v >> b) & 1)
    return r


@functools.lru_cache(maxsize=64)
def _mod_tables(q: int, psi: int, n: int):
    """Forward + inverse four-step tables for one modulus (numpy u32)."""
    if q >= (1 << 61):
        # the loose-mulhi Shoup keeps lazy representatives in [0, 4q);
        # butterflies reach 8q, which must stay below 2^64
        raise ValueError(f"modulus {q} has {q.bit_length()} bits; the "
                         f"fused kernel requires q < 2^61")
    n1 = n // N2
    L1 = n1.bit_length() - 1
    psiinv = hm.modinv(psi, q)
    omega = pow(psi, 2, q)
    psi_A, psi_Ai = pow(psi, N2, q), pow(psiinv, N2, q)
    psi_B, psi_Bi = pow(psi, n1, q), pow(psiinv, n1, q)

    revA = _bitrev_vec(n1)
    revB = _bitrev_vec(N2)

    # stage-A tables: row i = tabA[i] replicated across lanes
    tabA = np.array([pow(psi_A, int(r), q) for r in revA], dtype=object)
    tabAi = np.array([pow(psi_Ai, int(r), q) for r in revA], dtype=object)
    ta = _plane_pack(np.broadcast_to(tabA[:, None], (n1, N2)).copy(), q)
    tai = _plane_pack(np.broadcast_to(tabAi[:, None], (n1, N2)).copy(), q)

    # twiddle-fix tables: T[k1r, i2] = (psi * psi_B^-1 * omega^rev(k1r))^i2.
    # The INVERSE fix additionally folds n^-1 (the kernels run the GS
    # stages without per-stage halving — same field element as the
    # reference's 2^-1-per-stage fold, ntt_60bit.cuh:132,166).
    base = (psi * psi_Bi) % q
    ninv = hm.modinv(n, q)
    tc = np.empty((n1, N2), dtype=object)
    tci = np.empty((n1, N2), dtype=object)
    from .. import native
    use_native = q < (1 << 61) and native.available()
    for k1r in range(n1):
        rowg = (base * pow(omega, int(revA[k1r]), q)) % q
        rowg_i = hm.modinv(rowg, q)
        if use_native:
            tc[k1r] = native.geometric_row(rowg, q, N2).astype(object)
            tci[k1r] = (native.geometric_row(rowg_i, q, N2).astype(object)
                        * ninv) % q
            continue
        v = 1
        vi = ninv
        for i2 in range(N2):
            tc[k1r, i2] = v
            tci[k1r, i2] = vi
            v = (v * rowg) % q
            vi = (vi * rowg_i) % q
    tc_p = _plane_pack(tc, q)
    tci_p = _plane_pack(tci, q)
    # fused-dyadic variant: tci * 2^64 mod q cancels the Montgomery 2^-64
    # skew of mont_mul_lazy exactly (INTT is linear over Z_q)
    R = (1 << 64) % q
    tcir = (tci * R) % q          # object-int arrays: exact
    tcir_p = _plane_pack(tcir, q)

    # stage-B per-stage lane rows: TBS[s][lane] = tabB[2^s + lane // (2*step)]
    tabB = [pow(psi_B, int(r), q) for r in revB]
    tabBi = [pow(psi_Bi, int(r), q) for r in revB]
    tbs = np.empty((8, N2), dtype=object)
    tbsi = np.empty((8, N2), dtype=object)
    tbs[:] = 1
    tbsi[:] = 1
    for s in range(L2):
        m = 1 << s
        step = (N2 // 2) >> s
        for lane in range(N2):
            g = lane // (2 * step)
            tbs[s, lane] = tabB[m + g]
            tbsi[s, lane] = tabBi[m + g]
    tb_p = _plane_pack(tbs, q)
    tbi_p = _plane_pack(tbsi, q)

    q2 = (q + 1) >> 1
    qinv_neg = hm.mont_qinv_neg(q)
    m32 = (1 << 32) - 1
    qconst = np.array(
        [q & m32, q >> 32, (2 * q) & m32, (2 * q) >> 32, q2 & m32, q2 >> 32,
         qinv_neg & m32, qinv_neg >> 32],
        dtype=np.uint32)
    return ta, tc_p, tb_p, tai, tci_p, tbi_p, qconst, tcir_p


def expand_stage_a(planes: np.ndarray, n1: int) -> np.ndarray:
    """(4, n1, 128) compact stage-A planes -> (4, log2(n1)*n1, 128)
    per-stage row-expanded planes: stage s occupies rows
    [s*n1, (s+1)*n1), row i holding the group twiddle
    compact[2^s + i // (2*(n1 >> (s+1)))].

    The in-kernel broadcast+reshape expand of the compact rows cost
    ~4.3 us per stage-A pass at n1=256 even net of the 8x larger table
    fetch (measured 15.1 -> 10.85 us for the 8 inverse row stages on
    v5e), so the expansion is done once at table-build time."""
    L1 = n1.bit_length() - 1
    out = np.empty((4, L1 * n1, planes.shape[2]), np.uint32)
    for s in range(L1):
        m = 1 << s
        d = n1 >> (s + 1)
        out[:, s * n1:(s + 1) * n1] = np.repeat(
            planes[:, m:2 * m], 2 * d, axis=1)
    return out


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["ta", "tc", "tb", "tai", "tci", "tbi", "qconst", "tcir"],
    meta_fields=["n", "n1"],
)
@dataclasses.dataclass(frozen=True)
class FourStepTables:
    ta: jax.Array    # (r, 4, log2(n1)*n1, 128) — per-stage expanded rows
    tc: jax.Array    # (r, 4, n1, 128)
    tb: jax.Array    # (r, 4, 8, 128)
    tai: jax.Array   # (r, 4, log2(n1)*n1, 128)
    tci: jax.Array
    tbi: jax.Array
    qconst: jax.Array  # (r, 8) u32: q, 2q, (q+1)/2, -q^-1 mod 2^64 limbs
    tcir: jax.Array    # (r, 4, n1, 128) — tci * 2^64 mod q (fused dyadic)
    n: int
    n1: int

    @staticmethod
    def build(qs, psis, n: int, compact_a: bool = False) -> "FourStepTables":
        """compact_a=True stores the stage-A planes un-expanded
        ((4, n1, 128) instead of (4, log2(n1)*n1, 128)); the kernels
        detect the layout by shape and expand per stage in-kernel
        (_stage_rows).  Bit-identical outputs; trades ~4.3 us/stage-A
        pass of expand work for 8x smaller twiddle residency."""
        n1 = n // N2
        if compact_a and n1 < 4:
            # at n1=2 (n=256) compact (4, n1, 128) and expanded
            # (4, log2(n1)*n1, 128) planes have the same shape, so the
            # kernels' shape dispatch (_stage_rows) cannot tell them
            # apart and would mis-slice a compact table
            raise ValueError(
                f"compact_a requires n1 >= 4 (n >= 512); n={n} gives "
                f"n1={n1}, where compact and expanded stage-A tables "
                f"are shape-ambiguous")
        parts = [_mod_tables(int(q), int(p), n) for q, p in zip(qs, psis)]
        stack = lambda i: jnp.asarray(np.stack([p[i] for p in parts]))
        if compact_a:
            stack_exp = stack
        else:
            stack_exp = lambda i: jnp.asarray(np.stack(
                [expand_stage_a(p[i], n1) for p in parts]))
        return FourStepTables(
            ta=stack_exp(0), tc=stack(1), tb=stack(2),
            tai=stack_exp(3), tci=stack(4), tbi=stack(5), qconst=stack(6),
            tcir=stack(7),
            n=n, n1=n1,
        )


def tables_for(params, count: int | None = None,
               compact_a: bool = False) -> FourStepTables:
    qs = params.q if count is None else params.q[:count]
    psis = params.psi if count is None else params.psi[:count]
    return FourStepTables.build(qs, psis, params.n, compact_a=compact_a)


# ---------------------------------------------------------------------------
# Kernel bodies.
# ---------------------------------------------------------------------------

def _roll(x, shift: int, interpret: bool):
    if interpret:
        return jnp.roll(x, shift, axis=1)
    # np.int32: under jax_enable_x64 a Python int lowers to i64, which
    # tpu.dynamic_rotate rejects.
    return pltpu.roll(x, np.int32(shift), 1)


def _tab_slice(tab_ref, lo, hi):
    """(w, wp) limb pairs from a (4, rows, 128) plane ref, row range."""
    w = (tab_ref[0, lo:hi, :], tab_ref[1, lo:hi, :])
    wp = (tab_ref[2, lo:hi, :], tab_ref[3, lo:hi, :])
    return w, wp


def _roll_rows(x, shift: int, interpret: bool):
    if interpret:
        return jnp.roll(x, shift, axis=0)
    return pltpu.roll(x, np.int32(shift), 0)


def _expand_rows(w, m: int, d: int):
    """(m, N2) per-group twiddle rows -> (n1, N2): row r gets w[r // (2d)]."""
    return jnp.broadcast_to(w[:, None, :], (m, 2 * d, N2)).reshape(m * 2 * d, N2)


def _partner_rows(x, d, n1, u_mask, interpret):
    """Butterfly partner at row distance d: two sublane rotates + select."""
    return limb32.select64(
        u_mask,
        tuple(_roll_rows(v, n1 - d, interpret) for v in x),
        tuple(_roll_rows(v, d, interpret) for v in x))


def _stage_rows(ta_ref, s: int, n1: int):
    """(w, wp) limb pairs for stage s.

    Two table layouts, dispatched on the ref's row count (a static
    shape, so the branch is resolved at trace time):
    * expanded (4, log2(n1)*n1, 128) — expand_stage_a planes; stage s
      is a contiguous row slice.  The default: the in-kernel expand
      costs ~4.3 us per stage-A pass (module docstring).
    * compact (4, n1, 128) — raw _mod_tables planes (row i = tabA[i]);
      stage s reads rows [2^s, 2^{s+1}) and broadcasts each group row
      across its 2d butterfly rows in-kernel.  8x smaller VMEM
      residency per modulus — the opt-in for whole-op fused kernels at
      n=2^15, where fwd+inv expanded tables (~9 MB/modulus) defeat
      Mosaic's grid pipelining (FourStepTables.build(compact_a=True))."""
    if ta_ref.shape[1] == n1 and n1 >= 4:
        m = 1 << s
        d = n1 >> (s + 1)
        ex = lambda p: _expand_rows(p, m, d)
        return ((ex(ta_ref[0, m:2 * m, :]), ex(ta_ref[1, m:2 * m, :])),
                (ex(ta_ref[2, m:2 * m, :]), ex(ta_ref[3, m:2 * m, :])))
    lo = s * n1
    hi = lo + n1
    return ((ta_ref[0, lo:hi, :], ta_ref[1, lo:hi, :]),
            (ta_ref[2, lo:hi, :], ta_ref[3, lo:hi, :]))


def _stage_a_fwd(x, ta_ref, q, four_q, n1, row, interpret):
    """CT row stages, roll+select: the twiddle product runs on the pair's
    v element (selected per row); u rows keep x, v rows use the partner.
    Mosaic compiles the rotates at full speed where the textbook
    (m, 2, d) reshape-interleave form is movement-bound (module
    docstring).

    One-sided form: instead of materializing both butterfly results
    (u+t and u+4q-t) and selecting, the u operand and the signed twiddle
    term are each selected first and ONE add64+reduce_once finishes the
    stage — bit-identical values (exact mod-2^64 limb arithmetic is
    associative; t < 3q so 4q-t never borrows; u+tt < 8q < 2^64),
    one add64 + one reduce_once fewer per stage per element."""
    L1 = n1.bit_length() - 1
    for s in range(L1):
        d = n1 >> (s + 1)
        u_mask = (row & U32(d)) == 0
        rv = tuple(_roll_rows(v, n1 - d, interpret) for v in x)  # x[i+d]
        ru = tuple(_roll_rows(v, d, interpret) for v in x)       # x[i-d]
        v_val = limb32.select64(u_mask, rv, x)
        u_val = limb32.select64(u_mask, x, ru)
        w, wp = _stage_rows(ta_ref, s, n1)
        t = limb32.shoup_mulmod_lazy4(v_val, w, wp, q)
        tt = limb32.select64(u_mask, t, limb32.sub64(four_q, t))
        x = limb32.reduce_once(limb32.add64(u_val, tt), four_q)
        if interpret:
            # XLA:CPU's fusion pass degenerates (hours) on the composed
            # roll/select chains; barriers keep interpret-mode tests fast.
            x = jax.lax.optimization_barrier(x)
    return x


def _stage_a_inv(x, tai_ref, q, four_q, n1, row, interpret):
    """GS row stages, roll+select, two selects, no halving: u rows take
    u+v, v rows take (u-v)*psi^-1 (n^-1 lives in the fix tables)."""
    L1 = n1.bit_length() - 1
    for s in reversed(range(L1)):
        d = n1 >> (s + 1)
        u_mask = (row & U32(d)) == 0
        p = _partner_rows(x, d, n1, u_mask, interpret)
        s_sum = limb32.reduce_once(limb32.add64(x, p), four_q)
        d_dif = limb32.sub64(limb32.add64(p, four_q), x)  # u-v on v rows
        w, wp = _stage_rows(tai_ref, s, n1)
        t = limb32.shoup_mulmod_lazy4(d_dif, w, wp, q)
        x = limb32.select64(u_mask, s_sum, t)
        if interpret:
            x = jax.lax.optimization_barrier(x)
    return x


def _lane_partner(x, step, u_mask, interpret):
    return limb32.select64(
        u_mask,
        tuple(_roll(v, N2 - step, interpret) for v in x),
        tuple(_roll(v, step, interpret) for v in x))


def _stage_b_fwd(x, tb_ref, q, four_q, lane, interpret):
    # one-sided butterfly form: see _stage_a_fwd (bit-identical)
    for s in range(L2):
        step = (N2 // 2) >> s
        u_mask = (lane & step) == 0
        rv = tuple(_roll(v, N2 - step, interpret) for v in x)  # x[i+step]
        ru = tuple(_roll(v, step, interpret) for v in x)       # x[i-step]
        v_val = limb32.select64(u_mask, rv, x)
        u_val = limb32.select64(u_mask, x, ru)
        w = (tb_ref[0, s:s + 1, :], tb_ref[1, s:s + 1, :])
        wp = (tb_ref[2, s:s + 1, :], tb_ref[3, s:s + 1, :])
        t = limb32.shoup_mulmod_lazy4(v_val, w, wp, q)
        tt = limb32.select64(u_mask, t, limb32.sub64(four_q, t))
        x = limb32.reduce_once(limb32.add64(u_val, tt), four_q)
    return x


def _stage_b_inv(x, tbi_ref, q, four_q, lane, interpret):
    for s in reversed(range(L2)):
        step = (N2 // 2) >> s
        u_mask = (lane & step) == 0
        p = _lane_partner(x, step, u_mask, interpret)
        s_ = limb32.reduce_once(limb32.add64(x, p), four_q)
        d_ = limb32.sub64(limb32.add64(p, four_q), x)
        w = (tbi_ref[0, s:s + 1, :], tbi_ref[1, s:s + 1, :])
        wp = (tbi_ref[2, s:s + 1, :], tbi_ref[3, s:s + 1, :])
        t = limb32.shoup_mulmod_lazy4(d_, w, wp, q)
        x = limb32.select64(u_mask, s_, t)
        if interpret:
            x = jax.lax.optimization_barrier(x)
    return x


def _elementwise_fix(x, tc_ref, q):
    w = (tc_ref[0], tc_ref[1])
    wp = (tc_ref[2], tc_ref[3])
    return limb32.shoup_mulmod_lazy4(x, w, wp, q)


def _normalize(x, q, two_q):
    """[0, 4q) lazy representative -> canonical [0, q): bit-exact."""
    return limb32.reduce_once(limb32.reduce_once(x, two_q), q)


def _kernel_body(mi, qc_ref, xl_ref, xh_ref, ta_ref, tc_ref, tb_ref,
                 ol_ref, oh_ref, n1: int, inverse: bool, interpret: bool):
    q = (qc_ref[mi, 0], qc_ref[mi, 1])
    two_q = (qc_ref[mi, 2], qc_ref[mi, 3])
    four_q = limb32.add64(two_q, two_q)
    x = (xl_ref[0], xh_ref[0])
    lane = jax.lax.broadcasted_iota(U32, (n1, N2), 1)
    row = jax.lax.broadcasted_iota(U32, (n1, N2), 0)
    if not inverse:
        x = _stage_a_fwd(x, ta_ref.at[0], q, four_q, n1, row, interpret)
        x = _elementwise_fix(x, tc_ref.at[0], q)
        x = _stage_b_fwd(x, tb_ref.at[0], q, four_q, lane, interpret)
    else:
        x = _stage_b_inv(x, tb_ref.at[0], q, four_q, lane, interpret)
        x = _elementwise_fix(x, tc_ref.at[0], q)
        x = _stage_a_inv(x, ta_ref.at[0], q, four_q, n1, row, interpret)
    x = _normalize(x, q, two_q)
    ol_ref[0] = x[0]
    oh_ref[0] = x[1]


def _make_kernel_tiled(n1: int, inverse: bool, interpret: bool):
    """Modulus-major grid (r, B//r): the modulus index IS grid axis 0, so
    consecutive steps reuse the same twiddle block (no per-poly re-fetch —
    the analog of the reference's `blockIdx.y % division` constant-bank
    cycling, done without the gather)."""
    def kernel(qc_ref, xl_ref, xh_ref, ta_ref, tc_ref, tb_ref,
               ol_ref, oh_ref):
        _kernel_body(pl.program_id(0), qc_ref, xl_ref, xh_ref, ta_ref,
                     tc_ref, tb_ref, ol_ref, oh_ref, n1, inverse, interpret)
    return kernel


def _make_kernel(n1: int, inverse: bool, interpret: bool):
    """General form: per-poly modulus selected by a prefetched index map
    (the analog of the reference's batch kernels reading `q_cons[blockIdx.y
    % division]`, ntt_60bit.cuh:388-444)."""
    def kernel(mod_idx_ref, qc_ref, xl_ref, xh_ref, ta_ref, tc_ref, tb_ref,
               ol_ref, oh_ref):
        _kernel_body(mod_idx_ref[pl.program_id(0)], qc_ref, xl_ref, xh_ref,
                     ta_ref, tc_ref, tb_ref, ol_ref, oh_ref,
                     n1, inverse, interpret)
    return kernel


# ---------------------------------------------------------------------------
# pallas_call wrappers.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("inverse", "interpret"))
def _transform(x64, mod_idx, tables: FourStepTables, inverse: bool,
               interpret: bool):
    """General path: arbitrary per-poly modulus assignment via a prefetched
    index map."""
    n, n1 = tables.n, tables.n1
    LA = int(tables.ta.shape[2])   # stage-A table rows (expanded or compact)
    batch_shape = x64.shape[:-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    x64 = x64.reshape(B, n1, N2)
    xl, xh = limb32.to_pair(x64)

    ta = tables.tai if inverse else tables.ta
    tc = tables.tci if inverse else tables.tc
    tb = tables.tbi if inverse else tables.tb

    z = np.int32(0)  # under jax_enable_x64 a literal 0 traces as i64,
    # which Mosaic's index-map functions reject
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # mod_idx, qconst
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n1, N2), lambda b, mi, qc: (b, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, N2), lambda b, mi, qc: (b, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, LA, N2), lambda b, mi, qc: (mi[b], z, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, n1, N2), lambda b, mi, qc: (mi[b], z, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 8, N2), lambda b, mi, qc: (mi[b], z, z, z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n1, N2), lambda b, mi, qc: (b, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, N2), lambda b, mi, qc: (b, z, z),
                         memory_space=pltpu.VMEM),
        ],
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    ol, oh = pl.pallas_call(
        _make_kernel(n1, inverse, interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, n1, N2), jnp.uint32),
            jax.ShapeDtypeStruct((B, n1, N2), jnp.uint32),
        ],
        interpret=interpret,
        **kwargs,
    )(mod_idx, tables.qconst, xl, xh, ta, tc, tb)
    if interpret:
        # XLA:CPU's fusion of the interpret-expanded kernel into the u64
        # repack consumer degenerates (>10 min compiles); fence it off.
        ol, oh = jax.lax.optimization_barrier((ol, oh))
    out = limb32.from_pair((ol, oh))
    return out.reshape(batch_shape + (n,))


@functools.partial(jax.jit, static_argnames=("inverse", "interpret"))
def _transform_tiled(x64, tables: FourStepTables, inverse: bool,
                     interpret: bool):
    """Fast path for the standard RNS batch layout (poly b has modulus
    b % r): modulus-major grid (r, B//r), so the twiddle block for a
    modulus is fetched once and reused across its polys (13% over the
    general path at n=2^15, r=9 on v5e)."""
    n, n1 = tables.n, tables.n1
    LA = int(tables.ta.shape[2])   # stage-A table rows (expanded or compact)
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
    # data block j*r + m: polys stay in natural (..., r, n) order
    dmap = lambda m, j, qc: (j * np.int32(r) + m, z, z)
    tmap = lambda m, j, qc: (m, z, z, z)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # qconst
        grid=(r, J),
        in_specs=[
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, LA, N2), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, n1, N2), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 8, N2), tmap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
        ],
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    ol, oh = pl.pallas_call(
        _make_kernel_tiled(n1, inverse, interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, n1, N2), jnp.uint32),
            jax.ShapeDtypeStruct((B, n1, N2), jnp.uint32),
        ],
        interpret=interpret,
        **kwargs,
    )(tables.qconst, xl, xh, ta, tc, tb)
    if interpret:
        ol, oh = jax.lax.optimization_barrier((ol, oh))
    out = limb32.from_pair((ol, oh))
    return out.reshape(batch_shape + (n,))


def _default_mod_idx(x_shape, r: int) -> np.ndarray:
    """Residue-axis index map: x (..., r, n) -> per-poly modulus index,
    matching the reference's blockIdx.y % division batching."""
    batch = x_shape[:-1]
    B = int(np.prod(batch)) if batch else 1
    reps = B // r if r and B % r == 0 else None
    if reps is None:
        raise ValueError(f"batch {batch} not a multiple of r={r}")
    return np.tile(np.arange(r, dtype=np.int32), reps)


def _dispatch(x, tables, mod_idx, inverse: bool, interpret: bool):
    r = tables.qconst.shape[0]
    batch = x.shape[:-1]
    B = int(np.prod(batch)) if batch else 1
    if mod_idx is None and B % r == 0:
        return _transform_tiled(x, tables, inverse=inverse,
                                interpret=interpret)
    if mod_idx is None:
        mod_idx = _default_mod_idx(x.shape, r)
    return _transform(x, jnp.asarray(mod_idx, jnp.int32), tables,
                      inverse=inverse, interpret=interpret)


def ntt_forward(x, tables: FourStepTables, mod_idx=None, interpret: bool = False):
    """Forward negacyclic NTT on the last axis of x (..., r, n) — fused
    Pallas path.  Bit-exact equal to ops/ntt.ntt_forward."""
    return _dispatch(x, tables, mod_idx, inverse=False, interpret=interpret)


def ntt_inverse(x, tables: FourStepTables, mod_idx=None, interpret: bool = False):
    return _dispatch(x, tables, mod_idx, inverse=True, interpret=interpret)


# ---------------------------------------------------------------------------
# Fused dyadic-multiply + inverse NTT.
# ---------------------------------------------------------------------------

def _make_kernel_inv_mul(n1: int, interpret: bool):
    """INTT(x (.) y) in one kernel.  The dyadic product is a Montgomery
    multiply (limb32.mont_mul_lazy, result scaled by 2^-64); the inverse
    twiddle-fix table variant tcir carries the exact 2^64 correction, so
    the output is bit-identical to dyadic_mul + ntt_inverse.  Every dyadic
    multiply in the BFV pipelines is immediately followed by an INTT
    (bfv_keygen.cuh:132-133, bfv_encryption.cuh:270-271,
    bfv_decryption.cuh:100-101), so this removes all standalone dyadic
    kernels and one HBM round trip of the operand."""
    def kernel(qc_ref, xl_ref, xh_ref, yl_ref, yh_ref, ta_ref, tc_ref,
               tb_ref, ol_ref, oh_ref):
        mi = pl.program_id(0)
        q = (qc_ref[mi, 0], qc_ref[mi, 1])
        two_q = (qc_ref[mi, 2], qc_ref[mi, 3])
        four_q = limb32.add64(two_q, two_q)
        qinv = (qc_ref[mi, 6], qc_ref[mi, 7])
        x = (xl_ref[0], xh_ref[0])
        y = (yl_ref[0], yh_ref[0])
        x = limb32.mont_mul_lazy(x, y, q, qinv)    # < 2q ⊂ [0, 4q)
        lane = jax.lax.broadcasted_iota(U32, (n1, N2), 1)
        row = jax.lax.broadcasted_iota(U32, (n1, N2), 0)
        x = _stage_b_inv(x, tb_ref.at[0], q, four_q, lane, interpret)
        x = _elementwise_fix(x, tc_ref.at[0], q)   # tcir: 2^64 and n^-1
        x = _stage_a_inv(x, ta_ref.at[0], q, four_q, n1, row, interpret)
        x = _normalize(x, q, two_q)
        ol_ref[0] = x[0]
        oh_ref[0] = x[1]
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _transform_inv_mul(x64, y64, tables: FourStepTables, interpret: bool):
    n, n1 = tables.n, tables.n1
    LA = int(tables.ta.shape[2])   # stage-A table rows (expanded or compact)
    r = tables.qconst.shape[0]
    batch_shape = x64.shape[:-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    J = B // r
    xl, xh = limb32.to_pair(x64.reshape(B, n1, N2))
    yl, yh = limb32.to_pair(y64.reshape(B, n1, N2))

    z = np.int32(0)
    dmap = lambda m, j, qc: (j * np.int32(r) + m, z, z)
    tmap = lambda m, j, qc: (m, z, z, z)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r, J),
        in_specs=[
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, LA, N2), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, n1, N2), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 8, N2), tmap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
        ],
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    ol, oh = pl.pallas_call(
        _make_kernel_inv_mul(n1, interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, n1, N2), jnp.uint32),
            jax.ShapeDtypeStruct((B, n1, N2), jnp.uint32),
        ],
        interpret=interpret,
        **kwargs,
    )(tables.qconst, xl, xh, yl, yh, tables.tai, tables.tcir, tables.tbi)
    if interpret:
        ol, oh = jax.lax.optimization_barrier((ol, oh))
    out = limb32.from_pair((ol, oh))
    return out.reshape(batch_shape + (n,))


def ternary_res(b, q):
    """Compact ternary i32 b in {-1, 0, 1, 2} -> u64 limb-pair residue
    (b < 0 -> q + b; sampling.ternary semantics).  q odd => q_lo >= 1,
    so q - 1 never borrows.  Shared by the whole-op fused kernels
    (ops/fused_ops.py) and the compact-draw stage kernels below."""
    neg = b < jnp.int32(0)
    lo = jnp.where(neg, q[0] - U32(1), b.astype(U32))
    hi = jnp.where(neg, q[1], jnp.zeros_like(b, U32))
    return lo, hi


def gauss_res(d, q):
    """Compact Gaussian i32 d in [-19, 16] -> u64 limb-pair residue
    (d < 0 -> q + d; sampling.gaussian semantics)."""
    neg = d < jnp.int32(0)
    mag = jnp.where(neg, -d, d).astype(U32)
    qm = limb32.sub64(q, (mag, jnp.zeros_like(mag)))
    lo = jnp.where(neg, qm[0], mag)
    hi = jnp.where(neg, qm[1], jnp.zeros_like(mag))
    return lo, hi


def _make_kernel_fwd_ternary(n1: int, interpret: bool):
    """NTT(ternary-residue(u)) in one kernel: the stage schedule's
    forward of a COMPACT i32 ternary draw (keygen's s, encryption's u) —
    the (r, n) u64 residue tensor never reaches HBM (the draw-path cost
    the op schedule already avoided; measured 130 us of 613 us keygen at
    32k_9q was draw generation+expansion, scratch/kg_profile32k.py).
    Bit-identical to sampling's residue map followed by ntt_forward."""
    def kernel(qc_ref, ub_ref, ta_ref, tc_ref, tb_ref, ol_ref, oh_ref):
        mi = pl.program_id(0)
        q = (qc_ref[mi, 0], qc_ref[mi, 1])
        two_q = (qc_ref[mi, 2], qc_ref[mi, 3])
        four_q = limb32.add64(two_q, two_q)
        x = ternary_res(ub_ref[0], q)
        lane = jax.lax.broadcasted_iota(U32, (n1, N2), 1)
        row = jax.lax.broadcasted_iota(U32, (n1, N2), 0)
        x = _stage_a_fwd(x, ta_ref.at[0], q, four_q, n1, row, interpret)
        x = _elementwise_fix(x, tc_ref.at[0], q)
        x = _stage_b_fwd(x, tb_ref.at[0], q, four_q, lane, interpret)
        x = _normalize(x, q, two_q)
        ol_ref[0] = x[0]
        oh_ref[0] = x[1]
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _transform_fwd_ternary(u_b, tables: FourStepTables, interpret: bool):
    n, n1 = tables.n, tables.n1
    LA = int(tables.ta.shape[2])
    r = tables.qconst.shape[0]
    J = u_b.shape[0]
    ub = u_b.reshape(J, n1, N2)
    z = np.int32(0)
    umap = lambda m, j, qc: (j, z, z)
    dmap = lambda m, j, qc: (j * np.int32(r) + m, z, z)
    tmap = lambda m, j, qc: (m, z, z, z)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r, J),
        in_specs=[
            pl.BlockSpec((1, n1, N2), umap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, LA, N2), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, n1, N2), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 8, N2), tmap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
        ],
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    ol, oh = pl.pallas_call(
        _make_kernel_fwd_ternary(n1, interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((J * r, n1, N2), jnp.uint32),
            jax.ShapeDtypeStruct((J * r, n1, N2), jnp.uint32),
        ],
        interpret=interpret,
        **kwargs,
    )(tables.qconst, ub, tables.ta, tables.tc, tables.tb)
    if interpret:
        ol, oh = jax.lax.optimization_barrier((ol, oh))
    # grid is (r, J) with data blocks j*r + m: natural (J, r, n) order
    return limb32.from_pair((ol, oh)).reshape(J, r, n)


def ntt_forward_ternary(u_b, tables: FourStepTables,
                        interpret: bool = False):
    """(n,) or (J, n) compact i32 ternary draw -> (r, n) / (J, r, n)
    NTT-domain u64 residues, expansion fused into the forward kernel."""
    single = u_b.ndim == 1
    if single:
        u_b = u_b[None]
    out = _transform_fwd_ternary(u_b, tables, interpret=interpret)
    return out[0] if single else out


def _make_kernel_fwd_addneg(n1: int, interpret: bool):
    """NTT(-(x + e)) in one kernel: keygen's poly_add_negate_xq
    (bfv_keygen.cuh:81-93) is an elementwise preamble to the forward
    transform of pk0, so it rides the same VMEM residency —
    bit-identical to poly.poly_add_negate followed by ntt_forward."""
    def kernel(qc_ref, xl_ref, xh_ref, el_ref, eh_ref, ta_ref, tc_ref,
               tb_ref, ol_ref, oh_ref):
        mi = pl.program_id(0)
        q = (qc_ref[mi, 0], qc_ref[mi, 1])
        two_q = (qc_ref[mi, 2], qc_ref[mi, 3])
        four_q = limb32.add64(two_q, two_q)
        x = (xl_ref[0], xh_ref[0])
        e = (el_ref[0], eh_ref[0])
        # -(x + e) mod q with the 0 fixup (modmath.add_negate_mod)
        s = limb32.reduce_once(limb32.add64(x, e), q)
        r = limb32.sub64(q, s)
        is_q = (r[0] == q[0]) & (r[1] == q[1])
        zero = jnp.zeros_like(r[0])
        x = limb32.select64(is_q, (zero, zero), r)
        lane = jax.lax.broadcasted_iota(U32, (n1, N2), 1)
        row = jax.lax.broadcasted_iota(U32, (n1, N2), 0)
        x = _stage_a_fwd(x, ta_ref.at[0], q, four_q, n1, row, interpret)
        x = _elementwise_fix(x, tc_ref.at[0], q)
        x = _stage_b_fwd(x, tb_ref.at[0], q, four_q, lane, interpret)
        x = _normalize(x, q, two_q)
        ol_ref[0] = x[0]
        oh_ref[0] = x[1]
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _transform_fwd_addneg(x64, e64, tables: FourStepTables,
                          interpret: bool):
    n, n1 = tables.n, tables.n1
    LA = int(tables.ta.shape[2])
    r = tables.qconst.shape[0]
    batch_shape = x64.shape[:-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    J = B // r
    xl, xh = limb32.to_pair(x64.reshape(B, n1, N2))
    el, eh = limb32.to_pair(e64.reshape(B, n1, N2))
    z = np.int32(0)
    dmap = lambda m, j, qc: (j * np.int32(r) + m, z, z)
    tmap = lambda m, j, qc: (m, z, z, z)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r, J),
        in_specs=[
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, LA, N2), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, n1, N2), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 8, N2), tmap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
        ],
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    ol, oh = pl.pallas_call(
        _make_kernel_fwd_addneg(n1, interpret),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, n1, N2), jnp.uint32)] * 2,
        interpret=interpret,
        **kwargs,
    )(tables.qconst, xl, xh, el, eh, tables.ta, tables.tc, tables.tb)
    if interpret:
        ol, oh = jax.lax.optimization_barrier((ol, oh))
    return limb32.from_pair((ol, oh)).reshape(batch_shape + (n,))


def ntt_forward_addneg(x, e, tables: FourStepTables,
                       interpret: bool = False):
    """NTT(-(x + e) mod q) fused — bit-exact equal to
    poly.poly_add_negate followed by ntt_forward.  Standard RNS layout
    (poly b has modulus b % r)."""
    e = jnp.broadcast_to(e, x.shape)
    r = tables.qconst.shape[0]
    batch = x.shape[:-1]
    B = int(np.prod(batch)) if batch else 1
    if B % r != 0:
        raise ValueError(f"batch {batch} not a multiple of r={r}")
    return _transform_fwd_addneg(x, e, tables, interpret=interpret)


def _make_kernel_fwd_addneg_gauss(n1: int, interpret: bool):
    """NTT(-(x + gauss-residue(e))) in one kernel: fwd_addneg with the
    error term expanded in-kernel from its COMPACT i32 Gaussian plane
    (keygen's e never becomes an (r, n) u64 HBM tensor on the stage
    schedule).  Bit-identical to sampling's residue map + poly_add_negate
    + ntt_forward."""
    def kernel(qc_ref, xl_ref, xh_ref, ed_ref, ta_ref, tc_ref,
               tb_ref, ol_ref, oh_ref):
        mi = pl.program_id(0)
        q = (qc_ref[mi, 0], qc_ref[mi, 1])
        two_q = (qc_ref[mi, 2], qc_ref[mi, 3])
        four_q = limb32.add64(two_q, two_q)
        x = (xl_ref[0], xh_ref[0])
        e = gauss_res(ed_ref[0], q)
        s = limb32.reduce_once(limb32.add64(x, e), q)
        r = limb32.sub64(q, s)
        is_q = (r[0] == q[0]) & (r[1] == q[1])
        zero = jnp.zeros_like(r[0])
        x = limb32.select64(is_q, (zero, zero), r)
        lane = jax.lax.broadcasted_iota(U32, (n1, N2), 1)
        row = jax.lax.broadcasted_iota(U32, (n1, N2), 0)
        x = _stage_a_fwd(x, ta_ref.at[0], q, four_q, n1, row, interpret)
        x = _elementwise_fix(x, tc_ref.at[0], q)
        x = _stage_b_fwd(x, tb_ref.at[0], q, four_q, lane, interpret)
        x = _normalize(x, q, two_q)
        ol_ref[0] = x[0]
        oh_ref[0] = x[1]
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _transform_fwd_addneg_gauss(x64, e_d, tables: FourStepTables,
                                interpret: bool):
    n, n1 = tables.n, tables.n1
    LA = int(tables.ta.shape[2])
    r = tables.qconst.shape[0]
    batch_shape = x64.shape[:-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    J = B // r
    xl, xh = limb32.to_pair(x64.reshape(B, n1, N2))
    ed = e_d.reshape(J, n1, N2)
    z = np.int32(0)
    dmap = lambda m, j, qc: (j * np.int32(r) + m, z, z)
    emap = lambda m, j, qc: (j, z, z)
    tmap = lambda m, j, qc: (m, z, z, z)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r, J),
        in_specs=[
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, N2), emap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, LA, N2), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, n1, N2), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 8, N2), tmap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, N2), dmap, memory_space=pltpu.VMEM),
        ],
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    ol, oh = pl.pallas_call(
        _make_kernel_fwd_addneg_gauss(n1, interpret),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, n1, N2), jnp.uint32)] * 2,
        interpret=interpret,
        **kwargs,
    )(tables.qconst, xl, xh, ed, tables.ta, tables.tc, tables.tb)
    if interpret:
        ol, oh = jax.lax.optimization_barrier((ol, oh))
    return limb32.from_pair((ol, oh)).reshape(batch_shape + (n,))


def ntt_forward_addneg_gauss(x, e_d, tables: FourStepTables,
                             interpret: bool = False):
    """NTT(-(x + e)) with e given as a COMPACT (n,) / (J, n) i32
    Gaussian draw, expanded in-kernel.  Standard RNS layout."""
    if e_d.ndim == 1:
        e_d = e_d[None]
    r = tables.qconst.shape[0]
    batch = x.shape[:-1]
    B = int(np.prod(batch)) if batch else 1
    if B % r != 0 or B // r != e_d.shape[0]:
        raise ValueError(f"batch {batch} vs e_d {e_d.shape} (r={r})")
    return _transform_fwd_addneg_gauss(x, e_d, tables, interpret=interpret)


def ntt_inverse_mul(x, y, tables: FourStepTables, interpret: bool = False):
    """INTT(x (.) y) fused — bit-exact equal to
    ntt.ntt_inverse(ntt.dyadic_mul(x, y)).  Standard RNS layout only
    (poly b has modulus b % r); y broadcasts against x's batch dims."""
    y = jnp.broadcast_to(y, x.shape)
    r = tables.qconst.shape[0]
    batch = x.shape[:-1]
    B = int(np.prod(batch)) if batch else 1
    if B % r != 0:
        raise ValueError(f"batch {batch} not a multiple of r={r}")
    return _transform_inv_mul(x, y, tables, interpret=interpret)
