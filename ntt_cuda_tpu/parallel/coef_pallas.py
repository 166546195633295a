"""Coefficient-sharded NTT with the fused Pallas kernel per shard.

parallel/sharded.py runs every butterfly stage as XLA u64 math; this
module keeps its cross-shard stages (one `ppermute` per stage for the
log2(C) strides that cross the shard boundary — the reference's
multi-kernel launches, ntt_60bit.cuh:267-386) but runs everything below
the boundary as the single fused Pallas kernel (ops/ntt_pallas.py).

Why that works: with shard c holding coefficients [c*n/C, (c+1)*n/C), the
forward transform's first log2(C) stages (largest strides) are the only
cross-shard ones.  After them, shard c's remaining work is exactly an
independent length-(n/C) merged CT transform whose twiddles are the
sub-tree of the global bit-reversed table rooted at group c: at a local
stage with m groups, local table rows [m, 2m) are global rows
[m*(C+c), m*(C+c)+m).  Those contiguous slices are gathered host-side
into per-shard FourStepTables, so the unmodified single-chip kernel runs
on the shard's (n1/C, 128) tile.  The inverse mirrors this (fused local
kernel first, then the log2(C) cross GS stages).

Bit-exact equal to the single-chip transform (tests/test_coef_pallas.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import modmath, ntt, ntt_pallas
from ..ops.ntt_pallas import N2
from . import sharded
from .mesh import COEF_AXIS, RNS_AXIS

U64 = jnp.uint64


def _gather_shard_tables(q: int, psi: int, n: int, C: int):
    """Per-shard local FourStepTables planes for one modulus:
    (C, 4, log2(n1_l)*n1_l, 128) per-stage-EXPANDED stage-A tables
    (forward + inverse; ntt_pallas.expand_stage_a), sliced fix tables,
    shared stage-B tables, qconst."""
    ta, tc, tb, tai, tci, tbi, qconst, tcir = ntt_pallas._mod_tables(
        q, psi, n)
    n1 = n // N2
    n1_l = n1 // C
    ta_c = np.zeros((C, 4, n1_l, N2), np.uint32)
    tai_c = np.zeros((C, 4, n1_l, N2), np.uint32)
    for c in range(C):
        m = 1
        while m <= n1_l // 2:
            lo = m * (C + c)
            ta_c[c, :, m:2 * m] = ta[:, lo:lo + m]
            tai_c[c, :, m:2 * m] = tai[:, lo:lo + m]
            m *= 2
    ta_e = np.stack([ntt_pallas.expand_stage_a(ta_c[c], n1_l)
                     for c in range(C)])
    tai_e = np.stack([ntt_pallas.expand_stage_a(tai_c[c], n1_l)
                      for c in range(C)])
    tc_c = np.stack([tc[:, c * n1_l:(c + 1) * n1_l] for c in range(C)])
    tci_c = np.stack([tci[:, c * n1_l:(c + 1) * n1_l] for c in range(C)])
    tcir_c = np.stack([tcir[:, c * n1_l:(c + 1) * n1_l] for c in range(C)])
    tb_c = np.broadcast_to(tb, (C,) + tb.shape).copy()
    tbi_c = np.broadcast_to(tbi, (C,) + tbi.shape).copy()
    return ta_e, tc_c, tb_c, tai_e, tci_c, tbi_c, qconst, tcir_c


@dataclasses.dataclass(frozen=True)
class CoefShardedNTT:
    """Jitted coefficient-sharded forward/inverse NTT over a
    ('rns', 'coef') mesh; per-shard compute is the fused Pallas kernel."""

    mesh: Mesh
    n: int
    C: int
    # (r, C, 4, n1_l, N2) et al., sharded P('rns', 'coef', ...)
    ta: jax.Array
    tc: jax.Array
    tb: jax.Array
    tai: jax.Array
    tci: jax.Array
    tbi: jax.Array
    qconst: jax.Array         # (r, 8) u32, P('rns', None)
    tcir: jax.Array           # fused-dyadic fix tables (coef-sliced)
    psi_mont: jax.Array       # (r, n) Montgomery twiddles (cross stages)
    psiinv_mont: jax.Array
    q: jax.Array              # (r, 1)
    qinv: jax.Array
    interpret: bool

    @staticmethod
    def build(qs, psis, n: int, mesh: Mesh,
              interpret: bool | None = None) -> "CoefShardedNTT":
        C = mesh.shape[COEF_AXIS]
        if interpret is None:
            # by mesh devices, not the process default backend
            interpret = mesh.devices.flat[0].platform != "tpu"
        parts = [_gather_shard_tables(int(q), int(p), n, C)
                 for q, p in zip(qs, psis)]
        stack = lambda i: jnp.asarray(np.stack([p[i] for p in parts]))
        tabs = ntt.NTTTables.build(qs, psis, n)
        ms = modmath.ModulusSet.from_moduli(qs)
        sh = lambda *spec: NamedSharding(mesh, P(*spec))
        put = lambda x, *spec: jax.device_put(x, sh(*spec))
        return CoefShardedNTT(
            mesh=mesh, n=n, C=C,
            ta=put(stack(0), RNS_AXIS, COEF_AXIS),
            tc=put(stack(1), RNS_AXIS, COEF_AXIS),
            tb=put(stack(2), RNS_AXIS, COEF_AXIS),
            tai=put(stack(3), RNS_AXIS, COEF_AXIS),
            tci=put(stack(4), RNS_AXIS, COEF_AXIS),
            tbi=put(stack(5), RNS_AXIS, COEF_AXIS),
            qconst=put(jnp.asarray(np.stack([p[6] for p in parts])),
                       RNS_AXIS, None),
            tcir=put(jnp.asarray(np.stack([p[7] for p in parts])),
                     RNS_AXIS, COEF_AXIS),
            psi_mont=put(tabs.psi_mont, RNS_AXIS, None),
            psiinv_mont=put(tabs.psiinv_mont, RNS_AXIS, None),
            q=put(ms.q, RNS_AXIS, None),
            qinv=put(ms.qinv_neg, RNS_AXIS, None),
            interpret=interpret,
        )

    def _ftab_local(self, ta, tc, tb, tai, tci, tbi, qconst, tcir=None):
        """Reassemble a local FourStepTables from shard_map-sliced arrays
        ((r_loc, 1, 4, n1_l, N2) -> (r_loc, 4, n1_l, N2))."""
        n_l = self.n // self.C
        sq = lambda a: a[:, 0]
        return ntt_pallas.FourStepTables(
            ta=sq(ta), tc=sq(tc), tb=sq(tb), tai=sq(tai), tci=sq(tci),
            tbi=sq(tbi), qconst=qconst,
            tcir=sq(tcir if tcir is not None else tci),
            n=n_l, n1=n_l // N2)

    def forward(self, x):
        """(r, n) P('rns','coef') -> forward NTT, same sharding."""
        C, n = self.C, self.n
        logc = C.bit_length() - 1
        interp = self.interpret

        def f(x, pm, q, qinv, ta, tc, tb, tai, tci, tbi, qc):
            block = jax.lax.axis_index(COEF_AXIS)
            for s in range(logc):
                x = sharded._cross_forward_stage(x, pm, q, qinv, n, C, s,
                                                 block)
            ftab = self._ftab_local(ta, tc, tb, tai, tci, tbi, qc)
            return ntt_pallas.ntt_forward(x, ftab, interpret=interp)

        fn = shard_map(
            f, mesh=self.mesh,
            in_specs=(P(RNS_AXIS, COEF_AXIS), P(RNS_AXIS, None),
                      P(RNS_AXIS, None), P(RNS_AXIS, None),
                      P(RNS_AXIS, COEF_AXIS), P(RNS_AXIS, COEF_AXIS),
                      P(RNS_AXIS, COEF_AXIS), P(RNS_AXIS, COEF_AXIS),
                      P(RNS_AXIS, COEF_AXIS), P(RNS_AXIS, COEF_AXIS),
                      P(RNS_AXIS, None)),
            out_specs=P(RNS_AXIS, COEF_AXIS),
            check_vma=False)
        return jax.jit(fn)(x, self.psi_mont, self.q, self.qinv, self.ta,
                           self.tc, self.tb, self.tai, self.tci, self.tbi,
                           self.qconst)

    def inverse(self, x):
        C, n = self.C, self.n
        logc = C.bit_length() - 1
        interp = self.interpret

        def f(x, pm, q, qinv, ta, tc, tb, tai, tci, tbi, qc):
            block = jax.lax.axis_index(COEF_AXIS)
            ftab = self._ftab_local(ta, tc, tb, tai, tci, tbi, qc)
            x = ntt_pallas.ntt_inverse(x, ftab, interpret=interp)
            for s in reversed(range(logc)):
                # halve=False: the local kernel's tables already fold the
                # global n^-1 (sliced from the full-n tci)
                x = sharded._cross_inverse_stage(x, pm, q, qinv, n, C, s,
                                                 block, halve=False)
            return x

        fn = shard_map(
            f, mesh=self.mesh,
            in_specs=(P(RNS_AXIS, COEF_AXIS), P(RNS_AXIS, None),
                      P(RNS_AXIS, None), P(RNS_AXIS, None),
                      P(RNS_AXIS, COEF_AXIS), P(RNS_AXIS, COEF_AXIS),
                      P(RNS_AXIS, COEF_AXIS), P(RNS_AXIS, COEF_AXIS),
                      P(RNS_AXIS, COEF_AXIS), P(RNS_AXIS, COEF_AXIS),
                      P(RNS_AXIS, None)),
            out_specs=P(RNS_AXIS, COEF_AXIS),
            check_vma=False)
        return jax.jit(fn)(x, self.psiinv_mont, self.q, self.qinv, self.ta,
                           self.tc, self.tb, self.tai, self.tci, self.tbi,
                           self.qconst)


def cross_fwd(x, pm, q, qinv, n: int, C: int, block):
    """The log2(C) cross-shard CT stages (call inside shard_map)."""
    for s in range(C.bit_length() - 1):
        x = sharded._cross_forward_stage(x, pm, q, qinv, n, C, s, block)
    return x


def cross_inv(x, pm, q, qinv, n: int, C: int, block):
    """The log2(C) cross-shard GS stages (after the local inverse).
    No halving: the fused local kernels' tables fold the global n^-1
    (ops/ntt_pallas.py), so these stages are scale-free."""
    for s in reversed(range(C.bit_length() - 1)):
        x = sharded._cross_inverse_stage(x, pm, q, qinv, n, C, s, block,
                                         halve=False)
    return x


def _inverse_mul_method(self, x, y):
    """INTT(x (.) y) under coefficient sharding: the fused dyadic+local
    INTT kernel per shard (the dyadic is elementwise, so it commutes with
    the sharding), then the cross GS stages."""
    C, n = self.C, self.n
    interp = self.interpret

    def f(x, y, pm, q, qinv, ta, tc, tb, tai, tci, tbi, qc, tcir):
        block = jax.lax.axis_index(COEF_AXIS)
        ftab = self._ftab_local(ta, tc, tb, tai, tci, tbi, qc, tcir)
        x = ntt_pallas.ntt_inverse_mul(x, y, ftab, interpret=interp)
        return cross_inv(x, pm, q, qinv, n, C, block)

    row = P(RNS_AXIS, None)
    both = P(RNS_AXIS, COEF_AXIS)
    fn = shard_map(
        f, mesh=self.mesh,
        in_specs=(both, both, row, row, row,
                  both, both, both, both, both, both, row, both),
        out_specs=both,
        check_vma=False)
    return jax.jit(fn)(x, y, self.psiinv_mont, self.q, self.qinv, self.ta,
                       self.tc, self.tb, self.tai, self.tci, self.tbi,
                       self.qconst, self.tcir)


CoefShardedNTT.inverse_mul = _inverse_mul_method
