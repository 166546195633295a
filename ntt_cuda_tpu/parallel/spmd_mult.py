"""SPMD EvalMult / relinearization over the 'rns' mesh axis.

Extends parallel/spmd.py's explicit shard_map pipelines with the BEHZ
multiplication machinery (ops/behz.py).  The sharding story is the
natural one for base conversions:

  * every NTT / INTT / dyadic stage is modulus-row-local (zero traffic),
    exactly like keygen/encrypt/decrypt;
  * each fast base conversion needs ALL source-base residue rows, so its
    input is one `all_gather` over 'rns' (the scaled row products and
    the target-row inner products are then computed locally — the
    per-modulus constant banks are kilobytes and live replicated);
  * relinearization's digit decomposition gathers c2 once, runs the k
    digit transforms on local key rows, and broadcasts the adjusted
    last residue with one psum for the divide_and_round_q_last drop
    (the same collective shape as encryption's).

Totals per relinearized multiply: 5 all_gathers ((2, k, n)-scale each)
+ 1 psum — all O(k*n) words, vs the O(k^2 * n) local transform work.

The Bsk auxiliary base has exactly k+1 = r moduli, so Bsk tensors shard
over the same 'rns' axis with no padding; base-q tensors use the padded
(…, r, n) reference layout of parallel/spmd.py, the conversion banks
zeroing the dropped row's contributions (the same trick as the padded
decrypt constants).

Bit-exactness contract: every shard-local formula mirrors ops/behz.py /
models/bfv.py term-for-term and in the same accumulation order, so
results are bit-identical to the single-chip pipelines for any shard
count (tests/test_spmd_mult.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import (behz, behz_pallas, bfv_tail, fused_ops, modmath, ntt,
                   ntt_pallas, poly, sampling)
from ..utils import hostmath as hm
from .spmd import SpmdBFVContext

U64 = jnp.uint64
_M32 = (1 << 32) - 1


_col = behz._col          # (vals) -> (len, 1) u64 column, one shared impl


@dataclasses.dataclass(frozen=True)
class SpmdMultConsts:
    """Replicated padded constant banks (all (r, ...)-shaped, dropped-row
    contributions zeroed) + the sharded Bsk transform tables.  The
    multiplication analog of spmd.py's padded tail/dec consts."""

    # q-side (padded to r rows; row r-1 = dropped modulus, zeroed)
    q_all: jax.Array               # (r, 1) — full q incl. the dropped one
    qinv_all: jax.Array
    nu_all: jax.Array
    mt_mont_q: jax.Array           # (r, 1), pad 0
    inv_punct_q_mont: jax.Array    # (r, 1), pad 0  (zeroes the garbage row)
    t_mont_q: jax.Array            # (r, 1), pad 0
    bcm_q_mt: jax.Array            # (r,), pad 0
    neg_inv_q_mt: jax.Array        # ()

    # Bsk-side (exactly r real rows)
    bsk_q_all: jax.Array           # (r, 1)
    bsk_qinv_all: jax.Array
    bcm_q_bsk_mont: jax.Array      # (r, r) [bsk target, q source], col pad 0
    prodq_mont_bsk: jax.Array      # (r, 1)
    inv_mt_mont_bsk: jax.Array     # (r, 1)
    t_mont_bsk: jax.Array          # (r, 1)
    inv_prodq_mont_bsk: jax.Array  # (r, 1)

    # Shenoy-Kumaresan B -> q
    inv_punct_b_mont: jax.Array    # (r, 1), row r-1 (m_sk) = 0
    bcm_b_q_mont: jax.Array        # (r, r) [q target, B source], pads 0
    bcm_b_msk_mont: jax.Array      # (r,), pad 0
    inv_prodb_mont_msk: jax.Array  # ()
    prodb_mont_q: jax.Array        # (r, 1), pad 0
    msk: jax.Array                 # ()
    msk_qinv_neg: jax.Array        # ()
    msk_half: jax.Array            # ()

    # relinearization (special-modulus key switch)
    p_mont_q: jax.Array            # (r, 1) q_last * R mod q_i, pad 0
    half: jax.Array                # () floor(q_last / 2)
    half_mod: jax.Array            # (r, 1) half mod q_i, pad 0
    inv_qlast_mont: jax.Array      # (r, 1), pad 0 (zeroes the garbage row)

    # sharded transform state for the auxiliary base (None when the
    # caller carries its own transform machinery, e.g. spmd2d_mult's
    # coefficient-sharded tables)
    ms_bsk: modmath.ModulusSet | None = None
    tables_bsk: ntt.NTTTables | None = None
    ftab_bsk: ntt_pallas.FourStepTables | None = None
    # replicated u32 limb-pair banks for the single-pass Pallas
    # conversion kernels (ops/behz_pallas.py) — None on the xla impl
    mpc: behz_pallas.MultPallasConsts | None = None

    @staticmethod
    def host_build(params, aux: behz.AuxBase):
        """All banks as host numpy (device placement happens in build())."""
        k = params.r - 1
        qs = params.q[:k]
        q_last = params.q[-1]
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

        pad0 = lambda vals: _col(list(vals) + [0])
        return dict(
            q_all=_col(params.q),
            qinv_all=_col([hm.mont_qinv_neg(q) for q in params.q]),
            nu_all=_col([(1 << 64) // q for q in params.q]),
            mt_mont_q=pad0([hm.to_mont(mt % qj, qj) for qj in qs]),
            inv_punct_q_mont=pad0([hm.to_mont(hm.modinv(pj % qj, qj), qj)
                                   for pj, qj in zip(punct_q, qs)]),
            t_mont_q=pad0([hm.to_mont(params.t % qj, qj) for qj in qs]),
            bcm_q_mt=jnp.asarray(np.array([pj % mt for pj in punct_q] + [0],
                                          dtype=np.uint64)),
            neg_inv_q_mt=jnp.uint64((-pow(q_prod, -1, mt)) % mt),
            bsk_q_all=_col(bsk),
            bsk_qinv_all=_col([hm.mont_qinv_neg(m) for m in bsk]),
            bcm_q_bsk_mont=jnp.asarray(np.array(
                [[hm.to_mont(pj % m, m) for pj in punct_q] + [0]
                 for m in bsk], dtype=np.uint64)),
            prodq_mont_bsk=_col([hm.to_mont(q_prod % m, m) for m in bsk]),
            inv_mt_mont_bsk=_col([hm.to_mont(hm.modinv(mt % m, m), m)
                                  for m in bsk]),
            t_mont_bsk=_col([hm.to_mont(params.t % m, m) for m in bsk]),
            inv_prodq_mont_bsk=_col([hm.to_mont(
                hm.modinv(q_prod % m, m), m) for m in bsk]),
            inv_punct_b_mont=pad0([hm.to_mont(hm.modinv(pj % bj, bj), bj)
                                   for pj, bj in zip(punct_b, aux.b)]),
            bcm_b_q_mont=jnp.asarray(np.array(
                [[hm.to_mont(pj % qi, qi) for pj in punct_b] + [0]
                 for qi in qs] + [[0] * (k + 1)], dtype=np.uint64)),
            bcm_b_msk_mont=jnp.asarray(np.array(
                [hm.to_mont(pj % msk, msk) for pj in punct_b] + [0],
                dtype=np.uint64)),
            inv_prodb_mont_msk=jnp.uint64(
                hm.to_mont(hm.modinv(b_prod % msk, msk), msk)),
            prodb_mont_q=pad0([hm.to_mont(b_prod % qi, qi) for qi in qs]),
            msk=jnp.uint64(msk),
            msk_qinv_neg=jnp.uint64(hm.mont_qinv_neg(msk)),
            msk_half=jnp.uint64(msk >> 1),
            p_mont_q=pad0([hm.to_mont(q_last % qj, qj) for qj in qs]),
            half=jnp.uint64(params.half_last_modulus),
            half_mod=pad0(params.half_mod_q),
            inv_qlast_mont=pad0([hm.to_mont(x, qi) for x, qi in
                                 zip(params.inv_q_last_mod_q, qs)]),
        )


jax.tree_util.register_dataclass(
    SpmdMultConsts,
    data_fields=[f.name for f in dataclasses.fields(SpmdMultConsts)],
    meta_fields=[],
)


def _conv_local(zp_all, bcm, idx, rl, k, ms_q_loc, ms_qinv_loc):
    """Target-row inner products for this shard's rows: the same
    source loop (j ascending, add_mod) as behz._conv."""
    bcm_loc = jax.lax.dynamic_slice_in_dim(bcm, idx * rl, rl, axis=0)
    out = None
    for j in range(k):
        term = modmath.mont_mul(zp_all[..., j:j + 1, :],
                                bcm_loc[:, j:j + 1],
                                ms_q_loc, ms_qinv_loc)
        out = term if out is None else modmath.add_mod(out, term,
                                                       ms_q_loc)
    return out

def _rns_to_bsk_shard(x_loc, mc, idx, rl, k, bskq_loc, bskqinv_loc):
    """behz.rns_to_bsk with one all_gather of the raw base-q rows."""
    x_all = jax.lax.all_gather(x_loc, "rns", axis=-2, tiled=True)
    z = modmath.mont_mul(x_all, mc.mt_mont_q, mc.q_all, mc.qinv_all)
    zp = modmath.mont_mul(z, mc.inv_punct_q_mont, mc.q_all,
                          mc.qinv_all)                 # pad row -> 0
    y = _conv_local(zp, mc.bcm_q_bsk_mont, idx, rl, k,
                         bskq_loc, bskqinv_loc)
    ymt = jnp.zeros(zp.shape[:-2] + zp.shape[-1:], U64)
    for j in range(k):
        ymt = ymt + zp[..., j, :] * mc.bcm_q_mt[j]
    ymt = ymt & U64(_M32)
    rr = (ymt * mc.neg_inv_q_mt) & U64(_M32)
    rb = rr[..., None, :]
    lift = jnp.where(rb >= U64(behz.M_TILDE // 2),
                     bskq_loc - U64(behz.M_TILDE), U64(0))
    temp = rb + lift
    corr = modmath.mont_mul(
        temp, jax.lax.dynamic_slice_in_dim(mc.prodq_mont_bsk,
                                           idx * rl, rl, axis=0),
        bskq_loc, bskqinv_loc)
    s = modmath.add_mod(y, corr, bskq_loc)
    return modmath.mont_mul(
        s, jax.lax.dynamic_slice_in_dim(mc.inv_mt_mont_bsk,
                                        idx * rl, rl, axis=0),
        bskq_loc, bskqinv_loc)

def _fast_floor_shard(xq_loc, xbsk_loc, mc, idx, rl, k, bskq_loc,
                  bskqinv_loc):
    xq_all = jax.lax.all_gather(xq_loc, "rns", axis=-2, tiled=True)
    yq = modmath.mont_mul(xq_all, mc.t_mont_q, mc.q_all, mc.qinv_all)
    zp = modmath.mont_mul(yq, mc.inv_punct_q_mont, mc.q_all,
                          mc.qinv_all)
    conv = _conv_local(zp, mc.bcm_q_bsk_mont, idx, rl, k,
                            bskq_loc, bskqinv_loc)
    yb = modmath.mont_mul(
        xbsk_loc, jax.lax.dynamic_slice_in_dim(mc.t_mont_bsk,
                                               idx * rl, rl, axis=0),
        bskq_loc, bskqinv_loc)
    diff = modmath.sub_mod(yb, conv, bskq_loc)
    return modmath.mont_mul(
        diff, jax.lax.dynamic_slice_in_dim(mc.inv_prodq_mont_bsk,
                                           idx * rl, rl, axis=0),
        bskq_loc, bskqinv_loc)

def _bsk_to_q_shard(x_loc, mc, idx, rl, k, q_loc, qinv_loc):
    x_all = jax.lax.all_gather(x_loc, "rns", axis=-2, tiled=True)
    xp = modmath.mont_mul(x_all, mc.inv_punct_b_mont, mc.bsk_q_all,
                          mc.bsk_qinv_all)             # m_sk row -> 0
    cq = _conv_local(xp, mc.bcm_b_q_mont, idx, rl, k,
                          q_loc, qinv_loc)
    cm = None
    for j in range(k):
        term = modmath.mont_mul(xp[..., j, :], mc.bcm_b_msk_mont[j],
                                mc.msk, mc.msk_qinv_neg)
        cm = term if cm is None else modmath.add_mod(cm, term, mc.msk)
    alpha = modmath.mont_mul(
        modmath.sub_mod(cm, x_all[..., k, :], mc.msk),
        mc.inv_prodb_mont_msk, mc.msk, mc.msk_qinv_neg)
    neg = alpha > mc.msk_half
    mag = jnp.where(neg, mc.msk - alpha, alpha)[..., None, :]
    corr = modmath.mont_mul(
        mag, jax.lax.dynamic_slice_in_dim(mc.prodb_mont_q,
                                          idx * rl, rl, axis=0),
        q_loc, qinv_loc)
    negb = neg[..., None, :]
    return jnp.where(negb, modmath.add_mod(cq, corr, q_loc),
                     modmath.sub_mod(cq, corr, q_loc))


def _nub_from_ms(ms):
    """(rl, 2) u32 floor(2^64/q_i) limb pairs from the shard's modulus
    bundle (keyswitch_front_fused's digit-reduction bank)."""
    nu = ms.nu[:, 0]
    return jnp.stack([(nu & U64(0xFFFFFFFF)).astype(jnp.uint32),
                      (nu >> U64(32)).astype(jnp.uint32)], axis=1)


def _ks_front(ms, ftab, interp):
    """The whole key-switch front (digits + k forwards + dyadic-acc + 2
    inverses) as ONE twiddle-resident kernel over this shard's modulus
    rows (fused_ops.keyswitch_front_fused) — for _keyswitch_shard's
    `front` hook on the pallas impls."""
    return lambda c2a, ksk_loc: fused_ops.keyswitch_front_fused(
        c2a, ksk_loc, ftab, _nub_from_ms(ms), interpret=interp)


def _rns_to_bsk_shard_pl(x_loc, mpc, row0, rl, k, interp):
    """_rns_to_bsk_shard on the single-pass Pallas kernel: same gather,
    the shard's rl-row Bsk band from behz_pallas.rns_to_bsk_rows.
    Works for any coefficient-axis width that is a multiple of 128
    (the conversions are coefficient-elementwise)."""
    x_all = jax.lax.all_gather(x_loc, "rns", axis=-2, tiled=True)
    xq = jax.lax.slice_in_dim(x_all, 0, k, axis=-2)      # drop the pad row
    return behz_pallas.rns_to_bsk_rows(xq, mpc, row0, rl, interpret=interp)


def _fast_floor_shard_pl(pq_loc, pb_loc, mpc, row0, rl, k, interp):
    pq_all = jax.lax.all_gather(pq_loc, "rns", axis=-2, tiled=True)
    pq_k = jax.lax.slice_in_dim(pq_all, 0, k, axis=-2)
    return behz_pallas.fast_floor_rows(pq_k, pb_loc, mpc, row0, rl,
                                       interpret=interp)


def _bsk_to_q_shard_pl(fl_loc, mpc, row0, rl, interp):
    fl_all = jax.lax.all_gather(fl_loc, "rns", axis=-2, tiled=True)
    return behz_pallas.bsk_to_q_rows(fl_all, mpc, row0, rl,
                                     interpret=interp)


def _keyswitch_shard(c2_loc, ksk_loc, ms, mc, idx, rl, r, k, fwd, inv,
                     front=None):
    """Key-switch one polynomial through k switching keys, shard-local:
    gather the digit rows over 'rns', transform + accumulate against the
    local key rows, then divide_and_round_q_last with the owner shard
    broadcasting the adjusted last residue (one psum — the same
    collective as encryption's modulus drop).  Returns (2, rl, n).

    `front`: optional (c2_all, ksk_loc) -> (2, rl, n) replacement for
    the digit+forward+dyadic-accumulate+inverse front — the pallas impls
    pass fused_ops.keyswitch_front_fused so the whole front is one
    twiddle-resident kernel per local modulus (the digit tensor and
    accumulator chains never touch HBM)."""
    gidx = idx * rl + jnp.arange(rl)
    c2_all = jax.lax.all_gather(c2_loc, "rns", axis=-2, tiled=True)
    if front is not None:
        cc = front(jax.lax.slice_in_dim(c2_all, 0, k, axis=-2), ksk_loc)
    else:
        d = jnp.stack([
            modmath.mod_u64(c2_all[j][None, :], ms.q, ms.nu)
            for j in range(k)])                    # (k, rl, n)
        dhat = fwd(d)
        acc0 = acc1 = None
        for j in range(k):
            t0 = ntt.dyadic_mul(dhat[j], ksk_loc[0, j], ms)
            t1 = ntt.dyadic_mul(dhat[j], ksk_loc[1, j], ms)
            acc0 = t0 if acc0 is None else modmath.add_mod(acc0, t0, ms.q)
            acc1 = t1 if acc1 is None else modmath.add_mod(acc1, t1, ms.q)
        cc = inv(jnp.stack([acc0, acc1]))          # (2, rl, n)
    own = (gidx == r - 1)[:, None]
    ra = jnp.sum(jnp.where(own, cc, U64(0)), axis=-2)  # (2, n)
    ra = jax.lax.psum(ra, "rns")
    qlast = mc.q_all[r - 1, 0]
    ra = ra + mc.half
    ra = ra - qlast * (ra >= qlast).astype(U64)
    half_mod_loc = jax.lax.dynamic_slice_in_dim(mc.half_mod, idx * rl, rl,
                                                axis=0)
    invq_loc = jax.lax.dynamic_slice_in_dim(mc.inv_qlast_mont, idx * rl,
                                            rl, axis=0)
    tmp = modmath.mod_u64(ra[:, None, :], ms.q, ms.nu)
    tmp = tmp + ms.q * (tmp < half_mod_loc).astype(U64) - half_mod_loc
    v = cc + ms.q * (cc < tmp).astype(U64) - tmp
    return modmath.mont_mul(v, invq_loc, ms.q, ms.qinv_neg)


@dataclasses.dataclass(frozen=True)
class SpmdMultContext:
    """EvalMult over an SpmdBFVContext's mesh.  ntt_impl: "pallas"
    (real TPU mesh), "pallas-interpret", or "xla" (the portable
    stage-loop — the CPU-test default, bit-identical)."""

    base: SpmdBFVContext
    mc: SpmdMultConsts
    tables_q: ntt.NTTTables        # full-base xla tables, row-sharded
    ntt_impl: str

    @staticmethod
    def build(base: SpmdBFVContext,
              ntt_impl: str | None = None) -> "SpmdMultContext":
        p = base.params
        if ntt_impl is None:
            ntt_impl = "pallas" if not base.interpret else "xla"
        if ntt_impl not in ("pallas", "pallas-interpret", "xla"):
            raise ValueError(f"unknown ntt_impl {ntt_impl!r}")
        aux = behz.AuxBase.build(p)
        banks = SpmdMultConsts.host_build(p, aux)
        mesh = base.mesh
        row = NamedSharding(mesh, P("rns"))
        rep = NamedSharding(mesh, P())

        def place(x):
            return jax.device_put(
                x, row if getattr(x, "ndim", 0) >= 2 and
                x.shape[0] == p.r else rep)

        banks = {kk: jax.device_put(v, rep) for kk, v in banks.items()}
        use_pallas = ntt_impl != "xla"
        mc = SpmdMultConsts(
            **banks,
            ms_bsk=jax.tree.map(place,
                                modmath.ModulusSet.from_moduli(aux.bsk)),
            # each impl's dead table family stays unbuilt (_ops() uses
            # exactly one of the two)
            tables_bsk=(None if use_pallas else jax.tree.map(
                place, ntt.NTTTables.build(aux.bsk, aux.bsk_psi, p.n))),
            ftab_bsk=(jax.tree.map(
                place, ntt_pallas.FourStepTables.build(
                    aux.bsk, aux.bsk_psi, p.n)) if use_pallas else None),
            # single-pass conversion kernel banks (replicated — each
            # shard's band of target rows is dynamic-sliced in-program)
            mpc=(jax.device_put(behz_pallas.MultPallasConsts.build(p, aux),
                                rep) if use_pallas else None),
        )
        tables_q = (None if use_pallas else jax.tree.map(
            place, ntt.NTTTables.build(p.q, p.psi, p.n)))
        return SpmdMultContext(base=base, mc=mc, tables_q=tables_q,
                               ntt_impl=ntt_impl)

    # -- spec helpers -------------------------------------------------------

    def _mc_specs(self):
        r = self.base.params.r
        spec_of = lambda x: (P("rns") if getattr(x, "ndim", 0) >= 2 and
                             x.shape[0] == r else P())
        # replicated banks are rank <= 1 or (r, 1)?  The (r, 1) BANKS are
        # replicated on purpose (each shard needs every source row); only
        # the transform tables / modulus bundles shard.  Distinguish by
        # placement: follow the actual shardings chosen in build().
        def spec_from_sharding(x):
            sh = getattr(x, "sharding", None)
            if sh is not None and getattr(sh, "spec", None):
                return P(*sh.spec)
            return P()
        return (jax.tree.map(spec_from_sharding, self.mc),
                jax.tree.map(spec_from_sharding, self.tables_q))

    # -- shard-level transform-impl selection -------------------------------

    def _ops(self):
        impl = self.ntt_impl
        if impl == "xla":
            def fwd(x, ftab, tables, ms):
                return ntt.ntt_forward(x, tables, ms)

            def inv(x, ftab, tables, ms):
                return ntt.ntt_inverse(x, tables, ms)

            def inv_mul(x, y, ftab, tables, ms):
                return ntt.ntt_inverse(ntt.dyadic_mul(x, y, ms), tables, ms)

            def fwd_addneg(x, e, ftab, tables, ms):
                return ntt.ntt_forward(poly.poly_add_negate(x, e, ms),
                                       tables, ms)
        else:
            interp = impl == "pallas-interpret"

            def fwd(x, ftab, tables, ms):
                return ntt_pallas.ntt_forward(x, ftab, interpret=interp)

            def inv(x, ftab, tables, ms):
                return ntt_pallas.ntt_inverse(x, ftab, interpret=interp)

            def inv_mul(x, y, ftab, tables, ms):
                return ntt_pallas.ntt_inverse_mul(x, y, ftab,
                                                  interpret=interp)

            def fwd_addneg(x, e, ftab, tables, ms):
                return ntt_pallas.ntt_forward_addneg(x, e, ftab,
                                                     interpret=interp)
        return fwd, inv, inv_mul, fwd_addneg

    # -- public API ---------------------------------------------------------

    def mul(self, ct_a, ct_b, rlk=None):
        """Padded (2, r, n) ciphertexts -> padded (3, r, n) product, or
        relinearized (2, r, n) with rlk (relin_keygen).  Bit-identical
        on real rows to BFVContext.mul."""
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
        """sk (r, n) NTT-domain P('rns') -> rlk (2, k, r, n)
        P(None, None, 'rns', None).  Draw layout and results bit-match
        the single-chip relin_keygen (counter-mode keystream slices)."""
        from ..models.bfv import check_residues
        sampling.check_user_nonce(nonce)
        p = self.base.params
        sk = check_residues("sk", sk, (p.r, p.n))
        fn, args = self._relin_keygen_program(sk, nonce)
        return fn(*args)

    def relinearize(self, ct3, rlk):
        from ..models.bfv import check_residues
        p = self.base.params
        ct3 = check_residues("ct3", ct3, (3, p.r, p.n),
                             "SPMD mul returns the padded (3, r, n) form")
        rlk = check_residues("rlk", rlk, (2, p.r - 1, p.r, p.n))
        fn, args = self._relinearize_program(ct3, rlk)
        return fn(*args)

    def galois_keygen(self, sk, elts, nonce=0):
        """Sharded Galois switching keys: {g: (2, k, r, n)
        P(None, None, 'rns', None)}, bit-matching the single-chip keys
        (element-value-indexed counter regions, sliced per shard)."""
        from ..models.bfv import check_residues
        sampling.check_user_nonce(nonce)
        p = self.base.params
        sk = check_residues("sk", sk, (p.r, p.n))
        elts = sorted({int(g) for g in elts})
        maps = [poly.galois_maps(p.n, g) for g in elts]
        fn, args = self._galois_keygen_program(sk, tuple(elts), nonce)
        keys = fn(*args)
        return {g: keys[t] for t, g in enumerate(elts)}

    def apply_galois(self, ct, g, gk):
        """tau_g on a padded (2, r, n) ciphertext + key switch back to
        sk; bit-identical on real rows to BFVContext.apply_galois."""
        from ..models.bfv import check_residues
        p = self.base.params
        ct = check_residues("ct", ct, (2, p.r, p.n),
                            "SPMD ciphertexts use the padded layout")
        gk = check_residues("gk", gk, (2, p.r - 1, p.r, p.n))
        perm, neg = poly.galois_maps(p.n, int(g))
        fn, args = self._apply_galois_program(ct, gk, perm, neg)
        return fn(*args)

    def _galois_keygen_program(self, sk, elts, nonce):
        p, r, k, n, R, rl = self._shard_ctx()
        mc_spec, tq_spec = self._mc_specs()
        ms_spec, ftab_spec, _, _ = self.base._specs()
        fwd, inv, inv_mul, fwd_addneg = self._ops()
        ksi = "xla" if self.base.interpret else "pallas"
        from ..ops import salsa20
        stride = 8 * r * n + 4 * n
        region = (k * stride + 63) // 64
        maps = [poly.galois_maps(n, g) for g in elts]
        perms = jnp.asarray(np.stack([m[0] for m in maps]))
        negs = jnp.asarray(np.stack([m[1] for m in maps]))

        def body(nonce_, sk_loc, perms_, negs_, ms, ftab, mc, tq):
            idx = jax.lax.axis_index("rns")
            gidx = idx * rl + jnp.arange(rl)
            p_loc = jax.lax.dynamic_slice_in_dim(mc.p_mont_q, idx * rl,
                                                 rl, axis=0)
            s_coef = inv(sk_loc, ftab, tq, ms)
            out = []
            for t, g in enumerate(elts):
                ts = poly.galois_apply(s_coef, perms_[t], negs_[t], ms)
                ts_hat = fwd(ts, ftab, tq, ms)
                term = modmath.mont_mul(ts_hat, p_loc, ms.q, ms.qinv_neg)
                keys = []
                for j in range(k):
                    c0a = (U64(g * region + j * stride // 64)
                           + idx.astype(U64) * U64(rl * n // 8))
                    bw_a = salsa20.keystream_block_words(
                        rl * n // 8, key_byte=sampling.GALOIS_KEY_BYTE,
                        nonce=nonce_, counter0=c0a, impl=ksi)
                    a_j = sampling.uniform(
                        salsa20.block_words_u64(bw_a, 0,
                                                rl * n).reshape(rl, n),
                        ms)
                    bw_e = salsa20.keystream_block_words(
                        (4 * n + 63) // 64,
                        key_byte=sampling.GALOIS_KEY_BYTE, nonce=nonce_,
                        counter0=g * region
                        + (j * stride + 8 * r * n) // 64, impl=ksi)
                    e_j = sampling.gaussian(
                        salsa20.block_words_u32(bw_e, 0, n), ms)
                    x = inv_mul(a_j, sk_loc, ftab, tq, ms)
                    x = fwd_addneg(x, e_j, ftab, tq, ms)
                    mask = (gidx == j)[:, None]
                    x = jnp.where(mask, modmath.add_mod(x, term, ms.q), x)
                    keys.append(jnp.stack([x, a_j]))
                out.append(jnp.swapaxes(jnp.stack(keys), 0, 1))
            return jnp.stack(out)                   # (E, 2, k, rl, n)

        fn = shard_map(body, mesh=self.base.mesh,
                       in_specs=(P(), P("rns", None), P(), P(),
                                 ms_spec, ftab_spec, mc_spec, tq_spec),
                       out_specs=P(None, None, None, "rns", None),
                       check_vma=False)
        return jax.jit(fn), (sampling.keygen_nonce(nonce), sk, perms,
                             negs, self.base.ms, self.base.ftab, self.mc,
                             self.tables_q)

    def _apply_galois_program(self, ct, gk, perm, neg):
        p, r, k, n, R, rl = self._shard_ctx()
        mc_spec, tq_spec = self._mc_specs()
        ms_spec, ftab_spec, _, _ = self.base._specs()
        fwd, inv, inv_mul, _ = self._ops()
        use_pl = self.ntt_impl != "xla"
        interp = self.ntt_impl == "pallas-interpret"

        def body(ct_loc, gk_loc, perm_, neg_, ms, ftab, mc, tq):
            idx = jax.lax.axis_index("rns")
            tc = poly.galois_apply(ct_loc, perm_, neg_, ms)
            cc = _keyswitch_shard(
                tc[1], gk_loc, ms, mc, idx, rl, r, k,
                lambda x: fwd(x, ftab, tq, ms),
                lambda x: inv(x, ftab, tq, ms),
                front=_ks_front(ms, ftab, interp) if use_pl else None)
            c0 = modmath.add_mod(tc[0], cc[0], ms.q)
            return jnp.stack([c0, cc[1]])

        fn = shard_map(body, mesh=self.base.mesh,
                       in_specs=(P(None, "rns", None),
                                 P(None, None, "rns", None), P(), P(),
                                 ms_spec, ftab_spec, mc_spec, tq_spec),
                       out_specs=P(None, "rns", None),
                       check_vma=False)
        return jax.jit(fn), (ct, gk, jnp.asarray(perm), jnp.asarray(neg),
                             self.base.ms, self.base.ftab, self.mc,
                             self.tables_q)

    def decrypt3(self, sk, ct3):
        """Padded 3-component decrypt: c0 + c1 s + c2 s^2 -> (n,)."""
        from ..models.bfv import check_residues
        p = self.base.params
        sk = check_residues("sk", sk, (p.r, p.n))
        ct3 = check_residues("ct3", ct3, (3, p.r, p.n))
        fn, args = self._decrypt3_program(sk, ct3)
        return fn(*args)

    # -- programs -----------------------------------------------------------

    def _shard_ctx(self):
        p = self.base.params
        R = self.base.mesh.shape["rns"]
        return p, p.r, p.r - 1, p.n, R, p.r // R
    def _mul_program(self, ct_a, ct_b):
        p, r, k, n, R, rl = self._shard_ctx()
        mc_spec, tq_spec = self._mc_specs()
        ms_spec, ftab_spec, _, _ = self.base._specs()
        fwd, inv, inv_mul, _ = self._ops()
        use_pl = self.ntt_impl != "xla"
        interp = self.ntt_impl == "pallas-interpret"

        def body(a_loc, b_loc, ms, ftab, mc, tq):
            idx = jax.lax.axis_index("rns")
            if use_pl:
                # single-pass Pallas conversions (ops/behz_pallas.py) on
                # this shard's target-row band; same 4-all_gather
                # collective structure as the XLA chains below
                row0 = idx * rl
                ab = _rns_to_bsk_shard_pl(a_loc, mc.mpc, row0, rl, k,
                                          interp)
                bb = _rns_to_bsk_shard_pl(b_loc, mc.mpc, row0, rl, k,
                                          interp)
            else:
                bskq_loc = jax.lax.dynamic_slice_in_dim(
                    mc.bsk_q_all, idx * rl, rl, axis=0)
                bskqinv_loc = jax.lax.dynamic_slice_in_dim(
                    mc.bsk_qinv_all, idx * rl, rl, axis=0)
                ab = _rns_to_bsk_shard(a_loc, mc, idx, rl, k,
                                       bskq_loc, bskqinv_loc)
                bb = _rns_to_bsk_shard(b_loc, mc, idx, rl, k,
                                       bskq_loc, bskqinv_loc)
            fa_q = fwd(a_loc, ftab, tq, ms)
            fb_q = fwd(b_loc, ftab, tq, ms)
            fa_b = fwd(ab, mc.ftab_bsk, mc.tables_bsk, mc.ms_bsk)
            fb_b = fwd(bb, mc.ftab_bsk, mc.tables_bsk, mc.ms_bsk)

            def tensor(fa, fb, ftab_, tab_, ms_):
                a0, a1 = fa[..., 0, :, :], fa[..., 1, :, :]
                b0, b1 = fb[..., 0, :, :], fb[..., 1, :, :]
                c0 = inv_mul(a0, b0, ftab_, tab_, ms_)
                mid = modmath.add_mod(ntt.dyadic_mul(a0, b1, ms_),
                                      ntt.dyadic_mul(a1, b0, ms_), ms_.q)
                c1 = inv(mid, ftab_, tab_, ms_)
                c2 = inv_mul(a1, b1, ftab_, tab_, ms_)
                return jnp.stack([c0, c1, c2], axis=-3)

            pq = tensor(fa_q, fb_q, ftab, tq, ms)
            pb = tensor(fa_b, fb_b, mc.ftab_bsk, mc.tables_bsk, mc.ms_bsk)
            if use_pl:
                row0 = idx * rl
                fl = _fast_floor_shard_pl(pq, pb, mc.mpc, row0, rl, k,
                                          interp)
                return _bsk_to_q_shard_pl(fl, mc.mpc, row0, rl, interp)
            fl = _fast_floor_shard(pq, pb, mc, idx, rl, k,
                                   bskq_loc, bskqinv_loc)
            return _bsk_to_q_shard(fl, mc, idx, rl, k,
                                   ms.q, ms.qinv_neg)

        fn = shard_map(body, mesh=self.base.mesh,
                       in_specs=(P(None, "rns", None), P(None, "rns", None),
                                 ms_spec, ftab_spec, mc_spec, tq_spec),
                       out_specs=P(None, "rns", None),
                       check_vma=False)
        return jax.jit(fn), (ct_a, ct_b, self.base.ms, self.base.ftab,
                             self.mc, self.tables_q)

    def _relin_keygen_program(self, sk, nonce):
        p, r, k, n, R, rl = self._shard_ctx()
        mc_spec, tq_spec = self._mc_specs()
        ms_spec, ftab_spec, _, _ = self.base._specs()
        fwd, inv, inv_mul, fwd_addneg = self._ops()
        ksi = "xla" if self.base.interpret else "pallas"
        from ..ops import salsa20
        stride = 8 * r * n + 4 * n

        def body(nonce_, sk_loc, ms, ftab, mc, tq):
            idx = jax.lax.axis_index("rns")
            gidx = idx * rl + jnp.arange(rl)
            hs2 = ntt.dyadic_mul(sk_loc, sk_loc, ms)
            p_loc = jax.lax.dynamic_slice_in_dim(mc.p_mont_q, idx * rl, rl,
                                                 axis=0)
            term = modmath.mont_mul(hs2, p_loc, ms.q, ms.qinv_neg)
            keys = []
            for j in range(k):
                c0a = (U64(j * stride // 64)
                       + idx.astype(U64) * U64(rl * n // 8))
                bw_a = salsa20.keystream_block_words(
                    rl * n // 8, key_byte=sampling.RELIN_KEY_BYTE,
                    nonce=nonce_, counter0=c0a, impl=ksi)
                a_j = sampling.uniform(
                    salsa20.block_words_u64(bw_a, 0, rl * n).reshape(rl, n),
                    ms)
                bw_e = salsa20.keystream_block_words(
                    (4 * n + 63) // 64, key_byte=sampling.RELIN_KEY_BYTE,
                    nonce=nonce_, counter0=(j * stride + 8 * r * n) // 64,
                    impl=ksi)
                e_j = sampling.gaussian(
                    salsa20.block_words_u32(bw_e, 0, n), ms)
                x = inv_mul(a_j, sk_loc, ftab, tq, ms)
                x = fwd_addneg(x, e_j, ftab, tq, ms)
                mask = (gidx == j)[:, None]
                x = jnp.where(mask, modmath.add_mod(x, term, ms.q), x)
                keys.append(jnp.stack([x, a_j]))
            out = jnp.stack(keys)                  # (k, 2, rl, n)
            return jnp.swapaxes(out, 0, 1)         # (2, k, rl, n)

        fn = shard_map(body, mesh=self.base.mesh,
                       in_specs=(P(), P("rns", None), ms_spec, ftab_spec,
                                 mc_spec, tq_spec),
                       out_specs=P(None, None, "rns", None),
                       check_vma=False)
        return jax.jit(fn), (sampling.keygen_nonce(nonce), sk, self.base.ms,
                             self.base.ftab, self.mc, self.tables_q)

    def _relinearize_program(self, ct3, rlk):
        p, r, k, n, R, rl = self._shard_ctx()
        mc_spec, tq_spec = self._mc_specs()
        ms_spec, ftab_spec, _, _ = self.base._specs()
        fwd, inv, inv_mul, _ = self._ops()
        use_pl = self.ntt_impl != "xla"
        interp = self.ntt_impl == "pallas-interpret"

        def body(ct3_loc, rlk_loc, ms, ftab, mc, tq):
            idx = jax.lax.axis_index("rns")
            cc = _keyswitch_shard(
                ct3_loc[2], rlk_loc, ms, mc, idx, rl, r, k,
                lambda x: fwd(x, ftab, tq, ms),
                lambda x: inv(x, ftab, tq, ms),
                front=_ks_front(ms, ftab, interp) if use_pl else None)
            return modmath.add_mod(ct3_loc[:2], cc, ms.q)

        fn = shard_map(body, mesh=self.base.mesh,
                       in_specs=(P(None, "rns", None),
                                 P(None, None, "rns", None),
                                 ms_spec, ftab_spec, mc_spec, tq_spec),
                       out_specs=P(None, "rns", None),
                       check_vma=False)
        return jax.jit(fn), (ct3, rlk, self.base.ms, self.base.ftab,
                             self.mc, self.tables_q)

    def _decrypt3_program(self, sk, ct3):
        p, r, k, n, R, rl = self._shard_ctx()
        mc_spec, tq_spec = self._mc_specs()
        ms_spec, ftab_spec, _, dec_spec = self.base._specs()
        fwd, inv, inv_mul, _ = self._ops()
        interp = self.base.interpret

        def body(sk_loc, ct3_loc, ms, ftab, mc, tq, dc):
            sk2 = ntt.dyadic_mul(sk_loc, sk_loc, ms)
            x1 = inv_mul(fwd(ct3_loc[1], ftab, tq, ms), sk_loc, ftab, tq,
                         ms)
            x2 = inv_mul(fwd(ct3_loc[2], ftab, tq, ms), sk2, ftab, tq, ms)
            x = modmath.add_mod(x1, x2, ms.q)
            xt, xg = bfv_tail.decrypt_tail_partial(x, ct3_loc[0], dc,
                                                   interpret=interp)
            xt, xg = bfv_tail.psum_behz_partials(xt, xg, "rns", p)
            return bfv_tail.dec_round_from_sums(xt, xg, p)

        fn = shard_map(body, mesh=self.base.mesh,
                       in_specs=(P("rns", None), P(None, "rns", None),
                                 ms_spec, ftab_spec, mc_spec, tq_spec,
                                 dec_spec),
                       out_specs=P(),
                       check_vma=False)
        return jax.jit(fn), (sk, ct3, self.base.ms, self.base.ftab,
                             self.mc, self.tables_q, self.base.dec_consts)
