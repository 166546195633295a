"""Explicit shard_map BFV pipelines over the 'rns' mesh axis.

Unlike parallel/rns.py (which relies on GSPMD to partition the jitted XLA
pipelines), this module writes the SPMD program directly: every device
runs the fused Pallas kernels on its own r/R modulus channels, generates
exactly its slice of the Salsa20 keystream (counter mode), and the only
cross-chip traffic is

  * encrypt — one psum broadcasting the (2, n) adjusted last residue for
    the SEAL-style modulus drop (divide_and_round, the single cross-RNS
    dependency of encryption), and
  * decrypt — one psum of the BEHZ base-conversion partial sums (x_t
    widened to u64, x_g split into 32-bit halves so the sum cannot wrap
    for any shard count; associative recombination mod gamma is
    bit-identical to the reference's sequential accumulation —
    bfv_tail.psum_behz_partials).

Keygen has no collectives at all.  Ciphertexts use the reference's
padding-in-place layout ((2, r, n) with the dropped residue slot garbage,
bfv_encryption.cuh:216-222) so every shard's slice has the same shape.

This is the multi-chip path where the Pallas kernels actually scale; the
GSPMD path may only replicate a Mosaic custom call.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import bfv_tail, fused_ops, modmath, ntt_pallas, \
    salsa20, sampling
from ..params import BFVParams

U64 = jnp.uint64


@dataclasses.dataclass(frozen=True)
class SpmdBFVContext:
    params: BFVParams
    mesh: Mesh                     # 1-axis mesh ('rns',)
    ms: modmath.ModulusSet         # (r, 1) bundles, sharded P('rns', ...)
    ftab: ntt_pallas.FourStepTables
    tail_consts: bfv_tail.TailConsts        # padded (r rows)
    dec_consts: bfv_tail.DecTailConsts      # padded (r rows, dropped zeroed)
    interpret: bool

    @staticmethod
    def build(params: BFVParams, devices=None,
              interpret: bool | None = None) -> "SpmdBFVContext":
        if params.t & (params.t - 1) and (params.t % 2 == 0
                                          or params.t >= (1 << 31)):
            raise ValueError("SPMD pipelines run the fused pallas tails: "
                             "t must be a power of two or an odd "
                             "batching prime < 2^31")
        if devices is None:
            devices = jax.devices()
        mesh = Mesh(np.array(devices), ("rns",))
        R = mesh.shape["rns"]
        if params.r % R != 0:
            raise ValueError(f"r={params.r} not divisible by {R} shards")
        if interpret is None:
            # decide by the MESH devices, not the process default backend
            # (environments can force-register an accelerator while the
            # mesh lives on virtual CPU devices)
            interpret = mesh.devices.flat[0].platform != "tpu"
        row = NamedSharding(mesh, P("rns"))

        def shard(tree):
            # row bundles are rank >= 2 with r rows; 1-D globals (which can
            # coincidentally have length r) and scalars replicate
            return jax.tree.map(
                lambda x: jax.device_put(
                    x, row if getattr(x, "ndim", 0) >= 2 and
                    x.shape[0] == params.r else
                    NamedSharding(mesh, P())), tree)

        return SpmdBFVContext(
            params=params,
            mesh=mesh,
            ms=shard(modmath.modulus_set(params)),
            ftab=shard(ntt_pallas.tables_for(params)),
            tail_consts=shard(bfv_tail.build_tail_consts_padded(params)),
            dec_consts=shard(
                bfv_tail.build_dec_tail_consts_padded(params, 0, params.r)),
            interpret=interpret,
        )

    # -- helpers ------------------------------------------------------------

    def _specs(self):
        """(ms_spec, ftab_spec, consts_spec) pytrees of PartitionSpecs."""
        row = P("rns")
        rep = P()
        def spec_of(x):
            return row if getattr(x, "ndim", 0) >= 2 and \
                x.shape[0] == self.params.r else rep
        return (jax.tree.map(spec_of, self.ms),
                jax.tree.map(spec_of, self.ftab),
                jax.tree.map(spec_of, self.tail_consts),
                jax.tree.map(spec_of, self.dec_consts))

    # -- pipelines ----------------------------------------------------------
    #
    # Each pipeline is exposed both as an executing method and as a
    # `lowered_*` variant returning the jax Lowered object, so tests (and
    # users) can inspect the compiled HLO and assert the communication
    # structure — exactly the designed collectives, nothing inserted by
    # GSPMD (tests/test_collectives.py).

    def keygen(self, nonce=0):
        """-> sk (r, n) P('rns', None), pk (2, r, n) P(None, 'rns', None).
        Zero collectives: s/e draws are shard-replicated compute; each
        shard generates its own uniform keystream slice (counter mode)."""
        fn, args = self._keygen_program(nonce)
        return fn(*args)

    def lowered_keygen(self, nonce=0):
        fn, args = self._keygen_program(nonce)
        return fn.lower(*args)

    def _keygen_program(self, nonce):
        sampling.check_user_nonce(nonce)
        p = self.params
        n, r = p.n, p.r
        R = self.mesh.shape["rns"]
        rl = r // R
        interp = self.interpret
        ms_spec, ftab_spec, _, _ = self._specs()

        ksi = "xla" if interp else "pallas"

        def kg(nonce_, ms, ftab):
            idx = jax.lax.axis_index("rns")
            bw_s = salsa20.keystream_block_words(n // 64, nonce=nonce_,
                                                 impl=ksi)
            s_b = sampling.ternary_int(salsa20.block_words_u8(bw_s, 0,
                                                              n))
            c0a = n // 64 + idx.astype(U64) * U64(rl * n // 8)
            bw_a = salsa20.keystream_block_words(rl * n // 8, nonce=nonce_,
                                                 counter0=c0a, impl=ksi)
            a = sampling.uniform(
                salsa20.block_words_u64(bw_a, 0, rl * n).reshape(rl, n), ms)
            bw_e = salsa20.keystream_block_words(
                n // 16, nonce=nonce_, counter0=(n + 8 * r * n) // 64,
                impl=ksi)
            e_d = sampling.gaussian_int(
                salsa20.block_words_u32(bw_e, 0, n))
            # whole post-draw pipeline: one twiddle-resident kernel on
            # the shard's local moduli, compact draws expanded in-kernel
            # (ops/fused_ops.py)
            sk, pk0 = fused_ops.keygen_fused(s_b, a, e_d, ftab,
                                             interpret=interp)
            return sk, jnp.stack([pk0, a])

        fn = shard_map(kg, mesh=self.mesh,
                       in_specs=(P(), ms_spec, ftab_spec),
                       out_specs=(P("rns", None), P(None, "rns", None)),
                       check_vma=False)
        # same structural nonce domain separation as the single-chip path
        # (sampling.keygen_nonce) — sharded == single-chip stays bit-exact
        return jax.jit(fn), (sampling.keygen_nonce(nonce), self.ms,
                             self.ftab)

    def encrypt(self, pk, m_poly, nonce=0):
        """pk (2, r, n) NTT-domain -> padded ciphertext (2, r, n), the
        global-last residue slot garbage (reference layout).  One psum."""
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
        R = self.mesh.shape["rns"]
        rl = r // R
        q_last = p.q[-1]
        half = p.half_last_modulus
        interp = self.interpret
        ms_spec, ftab_spec, tail_spec, _ = self._specs()

        ksi = "xla" if interp else "pallas"

        def enc(nonce_, pkk, m, ms, ftab, tc):
            idx = jax.lax.axis_index("rns")
            bw = salsa20.keystream_block_words(
                (sampling.encrypt_entropy_bytes(n) + 63) // 64, nonce=nonce_,
                impl=ksi)
            u_b = sampling.ternary_int(salsa20.block_words_u8(bw, 0, n))
            e0 = sampling.gaussian(salsa20.block_words_u32(bw, n, n), ms)
            e1 = sampling.gaussian(salsa20.block_words_u32(bw, 5 * n, n), ms)
            # whole transform front (NTT(u) once, both halves' inverse
            # dyadic) as one twiddle-resident kernel; u stays compact
            c = fused_ops.encrypt_front(u_b, pkk, ftab, interpret=interp)
            e = jnp.stack([e0, e1])
            # adjusted last residue, owner shard -> everyone (one psum)
            ql = U64(q_last)
            ra = c[:, -1, :] + e[:, -1, :]
            ra = ra - ql * (ra > ql).astype(U64)      # strict-`>` quirk
            ra = ra + U64(half)
            ra = ra - ql * (ra >= ql).astype(U64)
            ra = jnp.where(idx == R - 1, ra, jnp.zeros_like(ra))
            ra = jax.lax.psum(ra, "rns")
            return bfv_tail.encrypt_tail_padded(c, e, ra, m, tc,
                                                interpret=interp)

        fn = shard_map(enc, mesh=self.mesh,
                       in_specs=(P(), P(None, "rns", None), P(),
                                 ms_spec, ftab_spec, tail_spec),
                       out_specs=P(None, "rns", None),
                       check_vma=False)
        return jax.jit(fn), (sampling.encrypt_nonce(nonce), pk,
                             jnp.asarray(m_poly, U64), self.ms, self.ftab,
                             self.tail_consts)

    def add(self, ct_a, ct_b):
        """Homomorphic addition on padded ciphertexts: elementwise,
        row-local, zero collectives (decrypts to (m1 + m2) mod t).
        Garbage pad rows stay garbage."""
        return self._ct_elementwise("add", ct_a, ct_b, _padded_add_jit)

    def sub(self, ct_a, ct_b):
        """Homomorphic subtraction on padded ciphertexts (row-local)."""
        return self._ct_elementwise("sub", ct_a, ct_b, _padded_sub_jit)

    def _ct_elementwise(self, op, ct_a, ct_b, fn):
        from ..models.bfv import check_residues
        p = self.params
        ct_a = check_residues(f"{op} lhs", ct_a, (2, p.r, p.n),
                              "SPMD ciphertexts use the padded layout")
        ct_b = check_residues(f"{op} rhs", ct_b, (2, p.r, p.n))
        return fn(ct_a, ct_b, self.ms)

    def decrypt(self, sk, ct, level: int = 0):
        """sk (r, n) NTT-domain, ct (2, r, n) padded -> (n,) plaintext,
        replicated.  One psum of the BEHZ partials.

        level > 0 decrypts a mod-switched ciphertext (mod_switch_to_next
        applied `level` times): the padded width stays r, but the BEHZ
        conversion runs over the level's live chain q[:r-level] with all
        other rows' contributions zeroed."""
        from ..models.bfv import check_residues
        p = self.params
        sk = check_residues("sk", sk, (p.r, p.n))
        ct = check_residues("ct", ct, (2, p.r, p.n),
                            "SPMD ciphertexts use the padded (2, r, n) "
                            "reference layout")
        fn, args = self._decrypt_program(sk, ct, level)
        return fn(*args)

    def lowered_decrypt(self, sk, ct, level: int = 0):
        fn, args = self._decrypt_program(sk, ct, level)
        return fn.lower(*args)

    def _dec_consts_level(self, level: int):
        """Padded DecTailConsts for the level's live chain (cached on
        the frozen context via the dec_consts object's identity —
        rebuilt per call is host-side numpy, negligible)."""
        if level == 0:
            return self.dec_consts
        cp = _chain_params(self.params, level)
        return bfv_tail.build_dec_tail_consts_padded(
            cp, 0, cp.r, pad_to=self.params.r)

    def _decrypt_program(self, sk, ct, level: int = 0):
        p = self.params
        lp = _chain_params(p, level)
        interp = self.interpret
        ms_spec, ftab_spec, _, dec_spec = self._specs()
        dec_consts = self._dec_consts_level(level)

        def dec(skk, ctt, ms, ftab, dc):
            x = fused_ops.half_polymul(ctt[1], skk, ftab,
                                       interpret=interp)
            xt, xg = bfv_tail.decrypt_tail_partial(x, ctt[0], dc,
                                                   interpret=interp)
            # split-halves psum: overflow-safe for any rns shard count
            xt, xg = bfv_tail.psum_behz_partials(xt, xg, "rns", lp)
            return bfv_tail.dec_round_from_sums(xt, xg, lp)

        fn = shard_map(dec, mesh=self.mesh,
                       in_specs=(P("rns", None), P(None, "rns", None),
                                 ms_spec, ftab_spec, dec_spec),
                       out_specs=P(),
                       check_vma=False)
        return jax.jit(fn), (sk, ct, self.ms, self.ftab, dec_consts)

    # -- modulus switching (level-aware, shard-geometry preserving) --------

    def mod_switch_to_next(self, ct, level: int = 0):
        """SEAL's mod_switch_to_next over the 'rns' mesh: every
        component of a padded (L, r, n) ciphertext at `level` is
        divided-and-rounded by the level's last live modulus
        q[r-1-level].  The padded width — and with it the shard
        geometry — is PRESERVED: the live width shrinks from r-level to
        r-level-1 and one more row becomes padding (the TPU-native
        answer to "mod_switch changes r": static shapes, static mesh;
        garbage rows cost compute, not communication).  One psum
        broadcasts the adjusted dropped residue (the same collective as
        encryption's modulus drop).  Decrypt with
        decrypt(..., level=level+1); bit-identical on live rows to the
        single-chip BFVContext.mod_switch_to_next chain."""
        from ..models.bfv import check_residues
        p = self.params
        live = p.r - 1 - level              # live ciphertext residues
        if live < 3:
            raise ValueError("modulus chain exhausted: need >= 3 live "
                             f"ciphertext moduli, have {live}")
        ct = check_residues("ct", ct, (ct.shape[0], p.r, p.n),
                            "SPMD ciphertexts use the padded (L, r, n) "
                            "reference layout")
        fn, args = self._mod_switch_program(ct, level)
        return fn(*args)

    def lowered_mod_switch(self, ct, level: int = 0):
        fn, args = self._mod_switch_program(ct, level)
        return fn.lower(*args)

    def _mod_switch_program(self, ct, level: int):
        p = self.params
        R = self.mesh.shape["rns"]
        rl = p.r // R
        last = p.r - 2 - level              # global row being dropped
        ms_spec, _, _, _ = self._specs()
        half_mod, invq_mont, qlast, half = _mod_switch_consts_padded(
            p, level)

        def msw(ctt, ms, hmod, invq):
            idx = jax.lax.axis_index("rns")
            gidx = idx * rl + jnp.arange(rl)
            own = (gidx == last)[:, None]
            ra = jnp.sum(jnp.where(own, ctt, U64(0)), axis=-2)  # (L, n)
            ra = jax.lax.psum(ra, "rns")
            ra = ra + U64(half)
            ra = ra - U64(qlast) * (ra >= U64(qlast)).astype(U64)
            tmp = modmath.mod_u64(ra[:, None, :], ms.q, ms.nu)
            tmp = tmp + ms.q * (tmp < hmod).astype(U64) - hmod
            v = ctt + ms.q * (ctt < tmp).astype(U64) - tmp
            return modmath.mont_mul(v, invq, ms.q, ms.qinv_neg)

        fn = shard_map(msw, mesh=self.mesh,
                       in_specs=(P(None, "rns", None), ms_spec,
                                 P("rns", None), P("rns", None)),
                       out_specs=P(None, "rns", None),
                       check_vma=False)
        return jax.jit(fn), (ct, self.ms, half_mod, invq_mont)


@functools.lru_cache(maxsize=None)
def _chain_params(params: BFVParams, level: int) -> BFVParams:
    """The params `level` steps down the modulus chain (cf.
    models.bfv.BFVContext.next_context)."""
    if level == 0:
        return params
    w = params.r - level
    if w < 2:
        raise ValueError(f"level {level} exhausts the {params.r}-modulus "
                         "chain")
    return BFVParams(name=f"{params.name}@L{w}", n=params.n,
                     q=params.q[:w], psi=params.psi[:w],
                     t=params.t, gamma=params.gamma)


@functools.lru_cache(maxsize=None)
def _mod_switch_consts_padded(params: BFVParams, level: int):
    """Per-level modulus-drop constants padded to r rows: (half_mod
    (r, 1), inv_qlast_mont (r, 1), q_last, half).  Rows at or beyond
    the dropped index get identity roles (their outputs are padding)."""
    from ..utils import hostmath as hm
    # padded row r-1 is the never-dropped special slot; the level's
    # last LIVE ciphertext residue is row r-2-level
    last = params.r - 2 - level
    qlast = params.q[last]
    half = qlast >> 1
    hmod, invq = [], []
    for i, q in enumerate(params.q):
        live = i < last
        hmod.append(half % q if live else 0)
        invq.append(hm.to_mont(pow(qlast, -1, q) if live else 1, q))
    col = lambda v: jnp.asarray(np.array(v, dtype=np.uint64).reshape(-1, 1))
    return col(hmod), col(invq), qlast, half


@jax.jit
def _padded_add_jit(a, b, ms):
    # exact mod-q add per residue row (garbage pad rows wrap harmlessly)
    s = a + b
    return s - ms.q * (s >= ms.q).astype(U64)


@jax.jit
def _padded_sub_jit(a, b, ms):
    return a + ms.q * (a < b).astype(U64) - b
