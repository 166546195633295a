"""2-D (rns x coef) SPMD EvalMult / relinearization.

parallel/spmd_mult.py's communication pattern lifted onto the full-scale
2-D mesh of parallel/spmd2d.py: the BEHZ base conversions are
COEFFICIENT-ELEMENTWISE, so the 'coef' axis adds zero conversion traffic
— each conversion still gathers its source rows over 'rns' only, now as
(…, r, n/C) slices.  Every transform is the 2-D machinery's cross
(log2(C) ppermute) + local fused-kernel composition, over the ciphertext
base AND the auxiliary Bsk base (its own CoefShardedNTT tables).

Per relinearized multiply: 4+1 all_gathers over 'rns' + 1 psum (the
divide_and_round last-residue broadcast) + the transforms' ppermutes.
Bit-identical to the single-chip mul on real rows (the shard bodies are
parallel/spmd_mult.py's, shared)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import behz, bfv_tail, modmath, ntt, ntt_pallas, poly, salsa20, \
    sampling
from . import coef_pallas
from .mesh import COEF_AXIS, RNS_AXIS
from .spmd2d import Spmd2DBFVContext, _ftab_local
from .spmd_mult import SpmdMultConsts, _bsk_to_q_shard, \
    _bsk_to_q_shard_pl, _fast_floor_shard, _fast_floor_shard_pl, \
    _rns_to_bsk_shard, _rns_to_bsk_shard_pl

U64 = jnp.uint64


def _tables_of(cnt):
    return (cnt.psi_mont, cnt.psiinv_mont, cnt.q, cnt.qinv, cnt.ta, cnt.tc,
            cnt.tb, cnt.tai, cnt.tci, cnt.tbi, cnt.qconst, cnt.tcir)


def _keyswitch2d(c2_loc, ksk_loc, ms, mc, ri, ci, rl, r, k, fwd, inv):
    """parallel/spmd_mult._keyswitch_shard on the 2-D mesh: the digit
    rows gather over 'rns' (coefficients are elementwise-local), the
    transforms take the cross+local composition, and the modulus drop
    broadcasts the adjusted last residue with one rns psum."""
    gidx = ri * rl + jnp.arange(rl)
    c2_all = jax.lax.all_gather(c2_loc, RNS_AXIS, axis=-2, tiled=True)
    d = jnp.stack([
        modmath.mod_u64(c2_all[j][None, :], ms.q, ms.nu)
        for j in range(k)])                           # (k, rl, S)
    dhat = fwd(d, ci)
    acc0 = acc1 = None
    for j in range(k):
        t0 = ntt.dyadic_mul(dhat[j], ksk_loc[0, j], ms)
        t1 = ntt.dyadic_mul(dhat[j], ksk_loc[1, j], ms)
        acc0 = t0 if acc0 is None else modmath.add_mod(acc0, t0, ms.q)
        acc1 = t1 if acc1 is None else modmath.add_mod(acc1, t1, ms.q)
    cc = inv(jnp.stack([acc0, acc1]), ci)             # (2, rl, S)
    own = (gidx == r - 1)[:, None]
    ra = jnp.sum(jnp.where(own, cc, U64(0)), axis=-2)
    ra = jax.lax.psum(ra, RNS_AXIS)
    qlast = mc.q_all[r - 1, 0]
    ra = ra + mc.half
    ra = ra - qlast * (ra >= qlast).astype(U64)
    half_mod_loc = jax.lax.dynamic_slice_in_dim(mc.half_mod, ri * rl, rl,
                                                axis=0)
    invq_loc = jax.lax.dynamic_slice_in_dim(mc.inv_qlast_mont, ri * rl,
                                            rl, axis=0)
    tmp = modmath.mod_u64(ra[:, None, :], ms.q, ms.nu)
    tmp = tmp + ms.q * (tmp < half_mod_loc).astype(U64) - half_mod_loc
    v = cc + ms.q * (cc < tmp).astype(U64) - tmp
    return modmath.mont_mul(v, invq_loc, ms.q, ms.qinv_neg)


def _galois_apply_2d(x_loc, perm, neg, ms, ci, S):
    """A GLOBAL coefficient permutation under coef sharding: gather the
    full coefficient axis over 'coef', permute, keep the local slice —
    the automorphism's one unavoidable cross-coef exchange."""
    x_all = jax.lax.all_gather(x_loc, COEF_AXIS, axis=-1, tiled=True)
    out = poly.galois_apply(x_all, perm, neg, ms)
    return jax.lax.dynamic_slice_in_dim(out, ci * S, S, axis=-1)


@dataclasses.dataclass(frozen=True)
class Spmd2DMultContext:
    """EvalMult over a Spmd2DBFVContext's ('rns', 'coef') mesh."""

    base: Spmd2DBFVContext
    mc: SpmdMultConsts                  # replicated banks (table fields None)
    cnt_bsk: coef_pallas.CoefShardedNTT
    ms_bsk: modmath.ModulusSet          # (r, 1) rows, P('rns', None)
    conv_impl: str = "xla"              # "pallas"/"pallas-interpret"/"xla"

    @staticmethod
    def build(base: Spmd2DBFVContext,
              conv_impl: str | None = None) -> "Spmd2DMultContext":
        """conv_impl selects the base-conversion implementation: the
        single-pass Pallas kernels ("pallas", the real-TPU default;
        "pallas-interpret" for CPU validation) or the portable XLA
        chains ("xla", the interpret-mesh default — interpret-mode
        kernel sweeps cost seconds per call in tests).  Requires
        n/C % 128 == 0 for the kernel forms."""
        p = base.params
        if conv_impl is None:
            conv_impl = "xla" if base.interpret else "pallas"
        if conv_impl not in ("pallas", "pallas-interpret", "xla"):
            raise ValueError(f"unknown conv_impl {conv_impl!r}")
        if conv_impl != "xla" and (p.n // base.mesh.shape[COEF_AXIS]) \
                % 128 != 0:
            raise ValueError("pallas conversions need n/C % 128 == 0")
        aux = behz.AuxBase.build(p)
        banks = SpmdMultConsts.host_build(p, aux)
        rep = NamedSharding(base.mesh, P())
        row = NamedSharding(base.mesh, P(RNS_AXIS))
        from ..ops import behz_pallas
        mc = SpmdMultConsts(
            **{kk: jax.device_put(v, rep) for kk, v in banks.items()},
            mpc=(jax.device_put(behz_pallas.MultPallasConsts.build(p, aux),
                                rep) if conv_impl != "xla" else None))
        cnt_bsk = coef_pallas.CoefShardedNTT.build(
            aux.bsk, aux.bsk_psi, p.n, base.mesh, interpret=base.interpret)
        ms_bsk = jax.tree.map(
            lambda x: jax.device_put(
                x, row if getattr(x, "ndim", 0) >= 2 and
                x.shape[0] == p.r else rep),
            modmath.ModulusSet.from_moduli(aux.bsk))
        return Spmd2DMultContext(base=base, mc=mc, cnt_bsk=cnt_bsk,
                                 ms_bsk=ms_bsk, conv_impl=conv_impl)

    # -- plumbing -----------------------------------------------------------

    def _geom(self):
        p = self.base.params
        R = self.base.mesh.shape[RNS_AXIS]
        C = self.base.mesh.shape[COEF_AXIS]
        return p, p.r, p.r - 1, p.n, R, C, p.r // R, p.n // C

    def _bsk_table_specs(self):
        r, C = self.base.params.r, self.base.mesh.shape[COEF_AXIS]

        def spec_of(x):
            if getattr(x, "ndim", 0) >= 2 and x.shape[0] == r:
                if x.ndim >= 3 and x.shape[1] == C:
                    return P(RNS_AXIS, COEF_AXIS)
                return P(RNS_AXIS)
            return P()
        return tuple(jax.tree.map(spec_of, t)
                     for t in _tables_of(self.cnt_bsk))

    def _mc_spec(self):
        return jax.tree.map(lambda x: P(), self.mc)

    def _ms_bsk_spec(self):
        r = self.base.params.r
        return jax.tree.map(
            lambda x: P(RNS_AXIS) if getattr(x, "ndim", 0) >= 2 and
            x.shape[0] == r else P(), self.ms_bsk)

    # -- public API ---------------------------------------------------------

    def mul(self, ct_a, ct_b, rlk=None):
        """Padded (2, r, n) x2 -> padded (3, r, n), or relinearized
        (2, r, n) with rlk (relin_keygen)."""
        from ..models.bfv import check_residues
        p = self.base.params
        ct_a = check_residues("ct_a", ct_a, (2, p.r, p.n),
                              "SPMD ciphertexts use the padded layout")
        ct_b = check_residues("ct_b", ct_b, (2, p.r, p.n))
        fn, args = self._mul_program(ct_a, ct_b)
        ct3 = fn(*args)
        if rlk is None:
            return ct3
        return self.relinearize(ct3, rlk)

    def lowered_mul(self, ct_a, ct_b):
        fn, args = self._mul_program(ct_a, ct_b)
        return fn.lower(*args)

    def relin_keygen(self, sk, nonce=0):
        """sk (r, n) P('rns', 'coef') NTT-domain -> rlk (2, k, r, n)
        P(None, None, 'rns', 'coef'), bit-matching the single-chip keys."""
        from ..models.bfv import check_residues
        sampling.check_user_nonce(nonce)
        p = self.base.params
        sk = check_residues("sk", sk, (p.r, p.n))
        fn, args = self._relin_keygen_program(sk, nonce)
        return fn(*args)

    def relinearize(self, ct3, rlk):
        from ..models.bfv import check_residues
        p = self.base.params
        ct3 = check_residues("ct3", ct3, (3, p.r, p.n))
        rlk = check_residues("rlk", rlk, (2, p.r - 1, p.r, p.n))
        fn, args = self._relinearize_program(ct3, rlk)
        return fn(*args)

    def galois_keygen(self, sk, elts, nonce=0):
        """Sharded Galois keys on the 2-D mesh: {g: (2, k, r, n)
        P(None, None, 'rns', 'coef')}, bit-matching single-chip."""
        from ..models.bfv import check_residues
        sampling.check_user_nonce(nonce)
        p = self.base.params
        sk = check_residues("sk", sk, (p.r, p.n))
        elts = sorted({int(g) for g in elts})
        for g in elts:
            poly.galois_maps(p.n, g)        # validates each element
        fn, args = self._galois_keygen_program(sk, tuple(elts), nonce)
        keys = fn(*args)
        return {g: keys[t] for t, g in enumerate(elts)}

    def apply_galois(self, ct, g, gk):
        """tau_g on a padded (2, r, n) ciphertext: one coef all_gather
        for the global permutation, then the rns key switch."""
        from ..models.bfv import check_residues
        p = self.base.params
        ct = check_residues("ct", ct, (2, p.r, p.n))
        gk = check_residues("gk", gk, (2, p.r - 1, p.r, p.n))
        perm, neg = poly.galois_maps(p.n, int(g))
        fn, args = self._apply_galois_program(ct, gk, perm, neg)
        return fn(*args)

    def _galois_keygen_program(self, sk, elts, nonce):
        p, r, k, n, R, C, rl, S = self._geom()
        interp = self.base.interpret
        make = self._transforms(interp, n, C, S)
        tq_specs = self.base._table_specs()
        ksi = "xla" if interp else "pallas"
        stride = 8 * r * n + 4 * n
        region = (k * stride + 63) // 64
        maps = [poly.galois_maps(n, g) for g in elts]
        perms = jnp.asarray(np.stack([m[0] for m in maps]))
        negs = jnp.asarray(np.stack([m[1] for m in maps]))

        def body(nonce_, sk_loc, perms_, negs_, ms, mc, *tabs):
            ri = jax.lax.axis_index(RNS_AXIS)
            ci = jax.lax.axis_index(COEF_AXIS)
            fwd_q, inv_q, inv_mul_q = make(tabs, ms)
            (pm, pmi, q, qinv, ta, tc, tb, tai, tci, tbi, qc,
             tcir) = tabs
            ftab = _ftab_local(ta, tc, tb, tai, tci, tbi, qc, tcir, S)
            gidx = ri * rl + jnp.arange(rl)
            p_loc = jax.lax.dynamic_slice_in_dim(mc.p_mont_q, ri * rl,
                                                 rl, axis=0)
            s_coef = inv_q(sk_loc, ci)
            out = []
            for t, g in enumerate(elts):
                ts = _galois_apply_2d(s_coef, perms_[t], negs_[t], ms,
                                      ci, S)
                ts_hat = fwd_q(ts, ci)
                term = modmath.mont_mul(ts_hat, p_loc, ms.q, ms.qinv_neg)
                keys = []
                for j in range(k):
                    lanes = []
                    for jj in range(rl):
                        c0a = (U64(g * region + j * stride // 64)
                               + (ri.astype(U64) * U64(rl) + U64(jj))
                               * U64(n // 8)
                               + ci.astype(U64) * U64(S // 8))
                        bw = salsa20.keystream_block_words(
                            S // 8, key_byte=sampling.GALOIS_KEY_BYTE,
                            nonce=nonce_, counter0=c0a, impl=ksi)
                        lanes.append(salsa20.block_words_u64(bw, 0, S))
                    a_j = sampling.uniform(jnp.stack(lanes), ms)
                    c0e = (U64(g * region
                               + (j * stride + 8 * r * n) // 64)
                           + ci.astype(U64) * U64(S // 16))
                    bw_e = salsa20.keystream_block_words(
                        S // 16, key_byte=sampling.GALOIS_KEY_BYTE,
                        nonce=nonce_, counter0=c0e, impl=ksi)
                    e_j = sampling.gaussian(
                        salsa20.block_words_u32(bw_e, 0, S), ms)
                    x = ntt_pallas.ntt_inverse_mul(a_j, sk_loc, ftab,
                                                   interpret=interp)
                    x = coef_pallas.cross_inv(x, pmi, q, qinv, n, C, ci)
                    x = poly.poly_add_negate(x, e_j, ms)
                    x = coef_pallas.cross_fwd(x, pm, q, qinv, n, C, ci)
                    x = ntt_pallas.ntt_forward(x, ftab, interpret=interp)
                    mask = (gidx == j)[:, None]
                    x = jnp.where(mask, modmath.add_mod(x, term, ms.q),
                                  x)
                    keys.append(jnp.stack([x, a_j]))
                out.append(jnp.swapaxes(jnp.stack(keys), 0, 1))
            return jnp.stack(out)               # (E, 2, k, rl, S)

        fn = shard_map(
            body, mesh=self.base.mesh,
            in_specs=(P(), P(RNS_AXIS, COEF_AXIS), P(), P(),
                      self.base._ms_spec(), self._mc_spec()) + tq_specs,
            out_specs=P(None, None, None, RNS_AXIS, COEF_AXIS),
            check_vma=False)
        return jax.jit(fn), ((sampling.keygen_nonce(nonce), sk, perms,
                              negs, self.base.ms, self.mc)
                             + self.base._tables())

    def _apply_galois_program(self, ct, gk, perm, neg):
        p, r, k, n, R, C, rl, S = self._geom()
        interp = self.base.interpret
        make = self._transforms(interp, n, C, S)
        tq_specs = self.base._table_specs()

        def body(ct_loc, gk_loc, perm_, neg_, ms, mc, *tabs):
            ri = jax.lax.axis_index(RNS_AXIS)
            ci = jax.lax.axis_index(COEF_AXIS)
            fwd_q, inv_q, inv_mul_q = make(tabs, ms)
            tc_ = _galois_apply_2d(ct_loc, perm_, neg_, ms, ci, S)
            cc = _keyswitch2d(tc_[1], gk_loc, ms, mc, ri, ci, rl, r, k,
                              fwd_q, inv_q)
            c0 = modmath.add_mod(tc_[0], cc[0], ms.q)
            return jnp.stack([c0, cc[1]])

        fn = shard_map(
            body, mesh=self.base.mesh,
            in_specs=(P(None, RNS_AXIS, COEF_AXIS),
                      P(None, None, RNS_AXIS, COEF_AXIS), P(), P(),
                      self.base._ms_spec(), self._mc_spec()) + tq_specs,
            out_specs=P(None, RNS_AXIS, COEF_AXIS),
            check_vma=False)
        return jax.jit(fn), ((ct, gk, jnp.asarray(perm),
                              jnp.asarray(neg), self.base.ms, self.mc)
                             + self.base._tables())

    def decrypt3(self, sk, ct3):
        from ..models.bfv import check_residues
        p = self.base.params
        sk = check_residues("sk", sk, (p.r, p.n))
        ct3 = check_residues("ct3", ct3, (3, p.r, p.n))
        fn, args = self._decrypt3_program(sk, ct3)
        return fn(*args)

    # -- programs -----------------------------------------------------------

    def _transforms(self, interp, n, C, S):
        """Shard-level transform closures over unpacked table tuples."""
        def make(tabs, ms_unused):
            (pm, pmi, q, qinv, ta, tc, tb, tai, tci, tbi, qc, tcir) = tabs
            ftab = _ftab_local(ta, tc, tb, tai, tci, tbi, qc, tcir, S)

            def fwd(x, ci):
                x = coef_pallas.cross_fwd(x, pm, q, qinv, n, C, ci)
                return ntt_pallas.ntt_forward(x, ftab, interpret=interp)

            def inv(x, ci):
                x = ntt_pallas.ntt_inverse(x, ftab, interpret=interp)
                return coef_pallas.cross_inv(x, pmi, q, qinv, n, C, ci)

            def inv_mul(x, y, ci):
                x = ntt_pallas.ntt_inverse_mul(x, y, ftab, interpret=interp)
                return coef_pallas.cross_inv(x, pmi, q, qinv, n, C, ci)
            return fwd, inv, inv_mul
        return make

    def _mul_program(self, ct_a, ct_b):
        p, r, k, n, R, C, rl, S = self._geom()
        interp = self.base.interpret
        use_pl = self.conv_impl != "xla"
        conv_interp = self.conv_impl == "pallas-interpret"
        make = self._transforms(interp, n, C, S)
        tq_specs = self.base._table_specs()
        tb_specs = self._bsk_table_specs()
        NT = 12

        def body(a_loc, b_loc, ms, msb, mc, *tabs):
            ri = jax.lax.axis_index(RNS_AXIS)
            ci = jax.lax.axis_index(COEF_AXIS)
            fwd_q, inv_q, inv_mul_q = make(tabs[:NT], ms)
            fwd_b, inv_b, inv_mul_b = make(tabs[NT:], msb)
            if use_pl:
                ab = _rns_to_bsk_shard_pl(a_loc, mc.mpc, ri * rl, rl, k,
                                          conv_interp)
                bb = _rns_to_bsk_shard_pl(b_loc, mc.mpc, ri * rl, rl, k,
                                          conv_interp)
            else:
                bskq_loc = jax.lax.dynamic_slice_in_dim(
                    mc.bsk_q_all, ri * rl, rl, axis=0)
                bskqinv_loc = jax.lax.dynamic_slice_in_dim(
                    mc.bsk_qinv_all, ri * rl, rl, axis=0)
                ab = _rns_to_bsk_shard(a_loc, mc, ri, rl, k, bskq_loc,
                                       bskqinv_loc)
                bb = _rns_to_bsk_shard(b_loc, mc, ri, rl, k, bskq_loc,
                                       bskqinv_loc)

            def tensor(fa, fb, inv, inv_mul, ms_):
                a0, a1 = fa[..., 0, :, :], fa[..., 1, :, :]
                b0, b1 = fb[..., 0, :, :], fb[..., 1, :, :]
                c0 = inv_mul(a0, b0, ci)
                mid = modmath.add_mod(ntt.dyadic_mul(a0, b1, ms_),
                                      ntt.dyadic_mul(a1, b0, ms_), ms_.q)
                c1 = inv(mid, ci)
                c2 = inv_mul(a1, b1, ci)
                return jnp.stack([c0, c1, c2], axis=-3)

            pq = tensor(fwd_q(a_loc, ci), fwd_q(b_loc, ci), inv_q,
                        inv_mul_q, ms)
            pb = tensor(fwd_b(ab, ci), fwd_b(bb, ci), inv_b, inv_mul_b,
                        msb)
            if use_pl:
                fl = _fast_floor_shard_pl(pq, pb, mc.mpc, ri * rl, rl, k,
                                          conv_interp)
                return _bsk_to_q_shard_pl(fl, mc.mpc, ri * rl, rl,
                                          conv_interp)
            fl = _fast_floor_shard(pq, pb, mc, ri, rl, k, bskq_loc,
                                   bskqinv_loc)
            return _bsk_to_q_shard(fl, mc, ri, rl, k, ms.q, ms.qinv_neg)

        fn = shard_map(
            body, mesh=self.base.mesh,
            in_specs=(P(None, RNS_AXIS, COEF_AXIS),
                      P(None, RNS_AXIS, COEF_AXIS),
                      self.base._ms_spec(), self._ms_bsk_spec(),
                      self._mc_spec()) + tq_specs + tb_specs,
            out_specs=P(None, RNS_AXIS, COEF_AXIS),
            check_vma=False)
        return jax.jit(fn), ((ct_a, ct_b, self.base.ms, self.ms_bsk,
                              self.mc) + self.base._tables()
                             + _tables_of(self.cnt_bsk))

    def _relin_keygen_program(self, sk, nonce):
        p, r, k, n, R, C, rl, S = self._geom()
        interp = self.base.interpret
        make = self._transforms(interp, n, C, S)
        tq_specs = self.base._table_specs()
        ksi = "xla" if interp else "pallas"
        stride = 8 * r * n + 4 * n

        def body(nonce_, sk_loc, ms, mc, *tabs):
            ri = jax.lax.axis_index(RNS_AXIS)
            ci = jax.lax.axis_index(COEF_AXIS)
            fwd_q, inv_q, inv_mul_q = make(tabs, ms)
            (pm, pmi, q, qinv, ta, tc, tb, tai, tci, tbi, qc, tcir) = tabs
            ftab = _ftab_local(ta, tc, tb, tai, tci, tbi, qc, tcir, S)
            gidx = ri * rl + jnp.arange(rl)
            hs2 = ntt.dyadic_mul(sk_loc, sk_loc, ms)
            p_loc = jax.lax.dynamic_slice_in_dim(mc.p_mont_q, ri * rl, rl,
                                                 axis=0)
            term = modmath.mont_mul(hs2, p_loc, ms.q, ms.qinv_neg)
            keys = []
            for j in range(k):
                lanes = []
                for jj in range(rl):
                    c0a = (U64(j * stride // 64)
                           + (ri.astype(U64) * U64(rl) + U64(jj))
                           * U64(n // 8) + ci.astype(U64) * U64(S // 8))
                    bw = salsa20.keystream_block_words(
                        S // 8, key_byte=sampling.RELIN_KEY_BYTE,
                        nonce=nonce_, counter0=c0a, impl=ksi)
                    lanes.append(salsa20.block_words_u64(bw, 0, S))
                a_j = sampling.uniform(jnp.stack(lanes), ms)
                c0e = (U64((j * stride + 8 * r * n) // 64)
                       + ci.astype(U64) * U64(S // 16))
                bw_e = salsa20.keystream_block_words(
                    S // 16, key_byte=sampling.RELIN_KEY_BYTE,
                    nonce=nonce_, counter0=c0e, impl=ksi)
                e_j = sampling.gaussian(
                    salsa20.block_words_u32(bw_e, 0, S), ms)
                x = ntt_pallas.ntt_inverse_mul(a_j, sk_loc, ftab,
                                               interpret=interp)
                x = coef_pallas.cross_inv(x, pmi, q, qinv, n, C, ci)
                x = poly.poly_add_negate(x, e_j, ms)
                x = coef_pallas.cross_fwd(x, pm, q, qinv, n, C, ci)
                x = ntt_pallas.ntt_forward(x, ftab, interpret=interp)
                mask = (gidx == j)[:, None]
                x = jnp.where(mask, modmath.add_mod(x, term, ms.q), x)
                keys.append(jnp.stack([x, a_j]))
            return jnp.swapaxes(jnp.stack(keys), 0, 1)   # (2, k, rl, S)

        fn = shard_map(
            body, mesh=self.base.mesh,
            in_specs=(P(), P(RNS_AXIS, COEF_AXIS), self.base._ms_spec(),
                      self._mc_spec()) + tq_specs,
            out_specs=P(None, None, RNS_AXIS, COEF_AXIS),
            check_vma=False)
        return jax.jit(fn), ((sampling.keygen_nonce(nonce), sk,
                              self.base.ms, self.mc) + self.base._tables())

    def _relinearize_program(self, ct3, rlk):
        p, r, k, n, R, C, rl, S = self._geom()
        interp = self.base.interpret
        make = self._transforms(interp, n, C, S)
        tq_specs = self.base._table_specs()

        def body(ct3_loc, rlk_loc, ms, mc, *tabs):
            ri = jax.lax.axis_index(RNS_AXIS)
            ci = jax.lax.axis_index(COEF_AXIS)
            fwd_q, inv_q, inv_mul_q = make(tabs, ms)
            cc = _keyswitch2d(ct3_loc[2], rlk_loc, ms, mc, ri, ci, rl, r,
                              k, fwd_q, inv_q)
            return modmath.add_mod(ct3_loc[:2], cc, ms.q)

        fn = shard_map(
            body, mesh=self.base.mesh,
            in_specs=(P(None, RNS_AXIS, COEF_AXIS),
                      P(None, None, RNS_AXIS, COEF_AXIS),
                      self.base._ms_spec(), self._mc_spec()) + tq_specs,
            out_specs=P(None, RNS_AXIS, COEF_AXIS),
            check_vma=False)
        return jax.jit(fn), ((ct3, rlk, self.base.ms, self.mc)
                             + self.base._tables())

    def _decrypt3_program(self, sk, ct3):
        p, r, k, n, R, C, rl, S = self._geom()
        interp = self.base.interpret
        tq_specs = self.base._table_specs()

        def body(sk_loc, ct3_loc, ms, dc, *tabs):
            ci = jax.lax.axis_index(COEF_AXIS)
            (pm, pmi, q, qinv, ta, tc, tb, tai, tci, tbi, qc, tcir) = tabs
            ftab = _ftab_local(ta, tc, tb, tai, tci, tbi, qc, tcir, S)
            sk2 = ntt.dyadic_mul(sk_loc, sk_loc, ms)

            def half_mul(c, key):
                x = coef_pallas.cross_fwd(c, pm, q, qinv, n, C, ci)
                x = ntt_pallas.ntt_forward(x, ftab, interpret=interp)
                return ntt.dyadic_mul(x, key, ms)

            a = modmath.add_mod(half_mul(ct3_loc[1], sk_loc),
                                half_mul(ct3_loc[2], sk2), ms.q)
            x = ntt_pallas.ntt_inverse(a, ftab, interpret=interp)
            x = coef_pallas.cross_inv(x, pmi, q, qinv, n, C, ci)
            xt, xg = bfv_tail.decrypt_tail_partial(x, ct3_loc[0], dc,
                                                   interpret=interp)
            xt, xg = bfv_tail.psum_behz_partials(xt, xg, RNS_AXIS, p)
            return bfv_tail.dec_round_from_sums(xt, xg, p)

        fn = shard_map(
            body, mesh=self.base.mesh,
            in_specs=(P(RNS_AXIS, COEF_AXIS), P(None, RNS_AXIS, COEF_AXIS),
                      self.base._ms_spec(),
                      self.base._consts_spec(self.base.dec_consts))
                     + tq_specs,
            out_specs=P(COEF_AXIS),
            check_vma=False)
        return jax.jit(fn), ((sk, ct3, self.base.ms, self.base.dec_consts)
                             + self.base._tables())
