"""Explicit 2-D SPMD BFV pipelines over a ('rns', 'coef') mesh.

Combines parallel/spmd.py (modulus channels sharded, counter-mode
keystream slicing, one psum each in encrypt/decrypt) with
parallel/coef_pallas.py (coefficients sharded, fused Pallas kernels per
shard, ppermute exchanges for the log2(C) butterfly stages crossing the
coefficient boundary).  This is the full-scale configuration of
BASELINE.json config 5: polynomials up to 2^17 split over coef shards on
ICI while modulus channels span hosts, every chip running the fused
kernels on its (r/R, n/C) slice.

Cross-chip traffic per op:
  * NTT/INTT: log2(C) ppermutes over 'coef' (the reference's multi-kernel
    stage boundary, ntt_60bit.cuh:267-386);
  * encrypt: one psum over 'rns' of the (2, n/C) adjusted last residue;
  * decrypt: one psum over 'rns' of the BEHZ partial sums;
  * keygen: ppermutes only.

Each shard samples exactly its (modulus-range x coefficient-range) slice
of the Salsa20 stream via block-counter offsets — bit-identical to the
single-chip draws.  Ciphertexts use the reference's padding-in-place
layout (2, r, n).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import bfv_tail, modmath, ntt, ntt_pallas, poly, salsa20, sampling
from ..ops.ntt_pallas import N2
from ..params import BFVParams
from . import coef_pallas
from .mesh import COEF_AXIS, RNS_AXIS

U64 = jnp.uint64


def _ftab_local(ta, tc, tb, tai, tci, tbi, qconst, tcir, n_l: int):
    sq = lambda a: a[:, 0]
    return ntt_pallas.FourStepTables(
        ta=sq(ta), tc=sq(tc), tb=sq(tb), tai=sq(tai), tci=sq(tci),
        tbi=sq(tbi), qconst=qconst, tcir=sq(tcir), n=n_l, n1=n_l // N2)


@dataclasses.dataclass(frozen=True)
class Spmd2DBFVContext:
    params: BFVParams
    mesh: Mesh
    cnt: coef_pallas.CoefShardedNTT     # tables (already mesh-sharded)
    ms: modmath.ModulusSet              # (r, 1) rows, P('rns', None)
    tail_consts: bfv_tail.TailConsts
    dec_consts: bfv_tail.DecTailConsts
    interpret: bool

    @staticmethod
    def build(params: BFVParams, mesh: Mesh,
              interpret: bool | None = None) -> "Spmd2DBFVContext":
        if params.t & (params.t - 1):
            raise ValueError("SPMD pipelines run the fused pallas tails, "
                             "which assume a power-of-two t")
        R = mesh.shape[RNS_AXIS]
        C = mesh.shape[COEF_AXIS]
        if params.r % R != 0:
            raise ValueError(f"r={params.r} not divisible by rns={R}")
        if params.n % (C * 2 * N2) != 0:
            raise ValueError(f"n={params.n} too small for coef={C}")
        if interpret is None:
            # by mesh devices, not the process default backend
            interpret = mesh.devices.flat[0].platform != "tpu"
        cnt = coef_pallas.CoefShardedNTT.build(
            params.q, params.psi, params.n, mesh, interpret=interpret)
        row = NamedSharding(mesh, P(RNS_AXIS))
        rep = NamedSharding(mesh, P())
        shard_rows = lambda tree: jax.tree.map(
            lambda x: jax.device_put(
                x, row if getattr(x, "ndim", 0) >= 2 and
                x.shape[0] == params.r else rep), tree)
        return Spmd2DBFVContext(
            params=params, mesh=mesh, cnt=cnt,
            ms=shard_rows(modmath.modulus_set(params)),
            tail_consts=shard_rows(bfv_tail.build_tail_consts_padded(params)),
            dec_consts=shard_rows(
                bfv_tail.build_dec_tail_consts_padded(params, 0, params.r)),
            interpret=interpret,
        )

    # -- plumbing -------------------------------------------------------------

    def _tables(self):
        c = self.cnt
        return (c.psi_mont, c.psiinv_mont, c.q, c.qinv, c.ta, c.tc, c.tb,
                c.tai, c.tci, c.tbi, c.qconst, c.tcir)

    def _table_specs(self):
        r, C = self.params.r, self.mesh.shape[COEF_AXIS]
        def spec_of(x):
            if getattr(x, "ndim", 0) >= 2 and x.shape[0] == r:
                if x.ndim >= 3 and x.shape[1] == C:
                    return P(RNS_AXIS, COEF_AXIS)
                return P(RNS_AXIS)
            return P()
        return tuple(jax.tree.map(spec_of, t) for t in self._tables())

    def _ms_spec(self):
        r = self.params.r
        return jax.tree.map(
            lambda x: P(RNS_AXIS) if getattr(x, "ndim", 0) >= 2 and
            x.shape[0] == r else P(), self.ms)

    def _consts_spec(self, consts):
        r = self.params.r
        return jax.tree.map(
            lambda x: P(RNS_AXIS) if getattr(x, "ndim", 0) >= 2 and
            x.shape[0] == r else P(), consts)

    # -- per-shard draws (counter-mode keystream slices) ----------------------

    def _draw_slices(self, n, r, R, C, rl, S):
        """Returns per-shard draw functions closing over static geometry."""
        ksi = "xla" if self.interpret else "pallas"
        def keygen_draws_local(nonce, ri, ci, ms):
            c0s = ci.astype(U64) * U64(S // 64)
            bw_s = salsa20.keystream_block_words(S // 64, nonce=nonce,
                                                 counter0=c0s, impl=ksi)
            s = sampling.ternary(salsa20.block_words_u8(bw_s, 0, S), ms)
            lanes = []
            for j in range(rl):   # per local modulus: slices 8n bytes apart
                c0 = (n // 64 + (ri.astype(U64) * U64(rl) + U64(j)) *
                      U64(n // 8) + ci.astype(U64) * U64(S // 8))
                bw = salsa20.keystream_block_words(S // 8, nonce=nonce,
                                                   counter0=c0, impl=ksi)
                lanes.append(salsa20.block_words_u64(bw, 0, S))
            a = sampling.uniform(jnp.stack(lanes), ms)
            c0e = U64((n + 8 * r * n) // 64) + ci.astype(U64) * U64(S // 16)
            bw_e = salsa20.keystream_block_words(S // 16, nonce=nonce,
                                                 counter0=c0e, impl=ksi)
            e = sampling.gaussian(salsa20.block_words_u32(bw_e, 0, S), ms)
            return s, a, e

        def encrypt_draws_local(nonce, ci, ms):
            c0u = ci.astype(U64) * U64(S // 64)
            bw_u = salsa20.keystream_block_words(S // 64, nonce=nonce,
                                                 counter0=c0u, impl=ksi)
            u = sampling.ternary(salsa20.block_words_u8(bw_u, 0, S), ms)
            es = []
            for base in (n, 5 * n):   # e0, e1 u32 lanes
                c0 = U64(base // 64) + ci.astype(U64) * U64(S // 16)
                bw = salsa20.keystream_block_words(S // 16, nonce=nonce,
                                                   counter0=c0, impl=ksi)
                es.append(sampling.gaussian(
                    salsa20.block_words_u32(bw, 0, S), ms))
            return u, es[0], es[1]

        return keygen_draws_local, encrypt_draws_local

    # -- pipelines -------------------------------------------------------------

    def keygen(self, nonce=0):
        fn, args = self._keygen_program(nonce)
        return fn(*args)

    def lowered_keygen(self, nonce=0):
        """jax Lowered of the keygen program (for collective-structure
        introspection; tests/test_collectives.py)."""
        fn, args = self._keygen_program(nonce)
        return fn.lower(*args)

    def _keygen_program(self, nonce):
        sampling.check_user_nonce(nonce)
        p = self.params
        n, r = p.n, p.r
        R, C = self.mesh.shape[RNS_AXIS], self.mesh.shape[COEF_AXIS]
        rl, S = r // R, n // C
        n_l = S
        interp = self.interpret
        kg_draws, _ = self._draw_slices(n, r, R, C, rl, S)

        def kg(nonce_, ms, pm, pmi, q, qinv, ta, tc, tb, tai, tci, tbi,
               qc, tcir):
            ri = jax.lax.axis_index(RNS_AXIS)
            ci = jax.lax.axis_index(COEF_AXIS)
            s, a, e = kg_draws(nonce_, ri, ci, ms)
            ftab = _ftab_local(ta, tc, tb, tai, tci, tbi, qc, tcir, n_l)
            sk = coef_pallas.cross_fwd(s, pm, q, qinv, n, C, ci)
            sk = ntt_pallas.ntt_forward(sk, ftab, interpret=interp)
            pk0 = ntt_pallas.ntt_inverse_mul(a, sk, ftab, interpret=interp)
            pk0 = coef_pallas.cross_inv(pk0, pmi, q, qinv, n, C, ci)
            pk0 = poly.poly_add_negate(pk0, e, ms)
            pk0 = coef_pallas.cross_fwd(pk0, pm, q, qinv, n, C, ci)
            # the cross stages sit between the add-negate and the local
            # forward, so only the plain forward kernel applies here
            pk0 = ntt_pallas.ntt_forward(pk0, ftab, interpret=interp)
            return sk, jnp.stack([pk0, a])

        specs = self._table_specs()
        fn = shard_map(
            kg, mesh=self.mesh,
            in_specs=(P(), self._ms_spec()) + specs,
            out_specs=(P(RNS_AXIS, COEF_AXIS), P(None, RNS_AXIS, COEF_AXIS)),
            check_vma=False)
        # structural nonce domain separation, as in the single-chip path
        return jax.jit(fn), ((sampling.keygen_nonce(nonce), self.ms)
                             + self._tables())

    def encrypt(self, pk, m_poly, nonce=0):
        from ..models.bfv import check_residues
        p = self.params
        pk = check_residues("pk", pk, (2, p.r, p.n))
        m_poly = check_residues("m_poly", m_poly, (p.n,))
        fn, args = self._encrypt_program(pk, m_poly, nonce)
        return fn(*args)

    def lowered_encrypt(self, pk, m_poly, nonce=0):
        fn, args = self._encrypt_program(pk, m_poly, nonce)
        return fn.lower(*args)

    def _encrypt_program(self, pk, m_poly, nonce):
        sampling.check_user_nonce(nonce)
        p = self.params
        n, r = p.n, p.r
        R, C = self.mesh.shape[RNS_AXIS], self.mesh.shape[COEF_AXIS]
        rl, S = r // R, n // C
        q_last, half = p.q[-1], p.half_last_modulus
        interp = self.interpret
        _, enc_draws = self._draw_slices(n, r, R, C, rl, S)

        def enc(nonce_, pkk, m, ms, tcst, pm, pmi, q, qinv, ta, tc, tb,
                tai, tci, tbi, qc, tcir):
            ri = jax.lax.axis_index(RNS_AXIS)
            ci = jax.lax.axis_index(COEF_AXIS)
            u, e0, e1 = enc_draws(nonce_, ci, ms)
            ftab = _ftab_local(ta, tc, tb, tai, tci, tbi, qc, tcir, S)
            # NTT(u) once — both ciphertext halves hold the same u
            un = coef_pallas.cross_fwd(u, pm, q, qinv, n, C, ci)
            un = ntt_pallas.ntt_forward(un, ftab, interpret=interp)
            c = jnp.broadcast_to(un, (2,) + un.shape)
            c = ntt_pallas.ntt_inverse_mul(c, pkk, ftab, interpret=interp)
            c = coef_pallas.cross_inv(c, pmi, q, qinv, n, C, ci)
            e = jnp.stack([e0, e1])
            ql = U64(q_last)
            ra = c[:, -1, :] + e[:, -1, :]
            ra = ra - ql * (ra > ql).astype(U64)
            ra = ra + U64(half)
            ra = ra - ql * (ra >= ql).astype(U64)
            ra = jnp.where(ri == R - 1, ra, jnp.zeros_like(ra))
            ra = jax.lax.psum(ra, RNS_AXIS)
            return bfv_tail.encrypt_tail_padded(c, e, ra, m, tcst,
                                                interpret=interp)

        specs = self._table_specs()
        fn = shard_map(
            enc, mesh=self.mesh,
            in_specs=(P(), P(None, RNS_AXIS, COEF_AXIS), P(COEF_AXIS),
                      self._ms_spec(), self._consts_spec(self.tail_consts))
                     + specs,
            out_specs=P(None, RNS_AXIS, COEF_AXIS),
            check_vma=False)
        return jax.jit(fn), ((sampling.encrypt_nonce(nonce), pk,
                              jnp.asarray(m_poly, U64), self.ms,
                              self.tail_consts) + self._tables())

    def decrypt(self, sk, ct):
        from ..models.bfv import check_residues
        p = self.params
        sk = check_residues("sk", sk, (p.r, p.n))
        ct = check_residues("ct", ct, (2, p.r, p.n),
                            "SPMD ciphertexts use the padded (2, r, n) "
                            "reference layout")
        fn, args = self._decrypt_program(sk, ct)
        return fn(*args)

    def lowered_decrypt(self, sk, ct):
        fn, args = self._decrypt_program(sk, ct)
        return fn.lower(*args)

    def _decrypt_program(self, sk, ct):
        p = self.params
        n = p.n
        C = self.mesh.shape[COEF_AXIS]
        S = n // C
        interp = self.interpret

        def dec(skk, ctt, dc, pm, pmi, q, qinv, ta, tc, tb, tai, tci, tbi,
                qc, tcir):
            ci = jax.lax.axis_index(COEF_AXIS)
            ftab = _ftab_local(ta, tc, tb, tai, tci, tbi, qc, tcir, S)
            x = coef_pallas.cross_fwd(ctt[1], pm, q, qinv, n, C, ci)
            x = ntt_pallas.ntt_forward(x, ftab, interpret=interp)
            x = ntt_pallas.ntt_inverse_mul(x, skk, ftab, interpret=interp)
            x = coef_pallas.cross_inv(x, pmi, q, qinv, n, C, ci)
            xt, xg = bfv_tail.decrypt_tail_partial(x, ctt[0], dc,
                                                   interpret=interp)
            # split-halves psum: overflow-safe for any rns shard count
            xt, xg = bfv_tail.psum_behz_partials(xt, xg, RNS_AXIS, p)
            return bfv_tail.dec_round_from_sums(xt, xg, p)

        specs = self._table_specs()
        fn = shard_map(
            dec, mesh=self.mesh,
            in_specs=(P(RNS_AXIS, COEF_AXIS), P(None, RNS_AXIS, COEF_AXIS),
                      self._consts_spec(self.dec_consts)) + specs,
            out_specs=P(COEF_AXIS),
            check_vma=False)
        return jax.jit(fn), (sk, ct, self.dec_consts) + self._tables()
