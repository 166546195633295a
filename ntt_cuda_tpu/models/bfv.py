"""BFV keygen / encryption / decryption pipelines (RNS form, SEAL 3.5
semantics).

TPU-native counterpart of the reference's scheme layer (bfv_keygen.cuh:95,
bfv_encryption.cuh:223, bfv_decryption.cuh:76).  Each operation is one
jitted XLA computation over (r, n) / (2, r, n) residue tensors; the
reference's stream/launch orchestration disappears into the XLA schedule.

Domain-state conventions preserved from the reference (SURVEY.md §3.5):
the uniform pk1 ("a") is sampled directly in the NTT domain, the secret
key lives in the NTT domain forever, pk0 is returned in the NTT domain,
and ciphertexts are coefficient-domain with the last RNS modulus dropped
(we return clean (2, r-1, n) tensors instead of the reference's in-place
padding layout, bfv_encryption.cuh:216-222).

Randomness: the Salsa20 keystream with the reference's fixed key/nonce and
byte-consumption layout (ops/salsa20.py, ops/sampling.py), so keygen and
encryption are deterministic functions of the parameter set, as in the
reference's `generate_random_default`.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import params as params_mod
from ..ops import behz, behz_pallas, bfv_tail, fused_ops, modmath, ntt, \
    ntt_pallas, poly, sampling
from ..utils import hostmath as hm

U64 = jnp.uint64


def _as_array(name: str, x):
    """jnp.asarray with the same actionable TypeError as check_residues
    (for call sites that must inspect the shape before knowing the full
    expected one, e.g. decrypt's variable component count)."""
    try:
        return jnp.asarray(x)
    except (TypeError, ValueError) as e:
        raise TypeError(f"{name}: expected an array, got "
                        f"{type(x).__name__} ({e})") from None


def check_residues(name: str, x, shape: tuple, hint: str = ""):
    """Validate a residue-tensor argument at the public API boundary:
    exact shape and an integer dtype, cast to the canonical u64.  Raises
    immediately with an actionable message instead of failing deep inside
    kernel reshapes (the reference has no such layer; its raw device
    pointers simply corrupt)."""
    try:
        x = jnp.asarray(x)
    except (TypeError, ValueError) as e:
        raise TypeError(f"{name}: expected an array, got "
                        f"{type(x).__name__} ({e})") from None
    if not jnp.issubdtype(x.dtype, jnp.integer):
        raise TypeError(f"{name}: expected an integer array (canonically "
                        f"uint64), got dtype {x.dtype}")
    if x.shape != shape:
        msg = f"{name}: expected shape {shape}, got {x.shape}"
        if hint:
            msg += f" — {hint}"
        raise ValueError(msg)
    return x.astype(U64)


def default_backend() -> str:
    """NTT backend selection: the fused Pallas kernel on TPU, the XLA
    lowering elsewhere (Pallas TPU kernels don't run on the CPU backend
    except in interpret mode)."""
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _fwd(x, tables, ftab, ms, backend: str):
    if backend == "xla":
        return ntt.ntt_forward(x, tables, ms)
    return ntt_pallas.ntt_forward(x, ftab,
                                  interpret=(backend == "pallas-interpret"))


def _inv(x, tables, ftab, ms, backend: str):
    if backend == "xla":
        return ntt.ntt_inverse(x, tables, ms)
    return ntt_pallas.ntt_inverse(x, ftab,
                                  interpret=(backend == "pallas-interpret"))


def _inv_mul(x, y, tables, ftab, ms, backend: str):
    """INTT(x (.) y) — fused kernel on the pallas backends (every dyadic
    multiply in the pipelines feeds an INTT; SURVEY.md §3)."""
    if backend == "xla":
        return ntt.ntt_inverse(ntt.dyadic_mul(x, y, ms), tables, ms)
    return ntt_pallas.ntt_inverse_mul(
        x, y, ftab, interpret=(backend == "pallas-interpret"))


def _r2b(x, mc, mpc, backend: str):
    """BEHZ q -> Bsk extension: single-pass Pallas kernel on the pallas
    backends (ops/behz_pallas.py — the XLA chain round-trips O(k^2)
    intermediates through HBM and measured ~half of EvalMult)."""
    if backend == "xla":
        return behz.rns_to_bsk(x, mc)
    return behz_pallas.rns_to_bsk(
        x, mpc, interpret=(backend == "pallas-interpret"))


def _snr(xq, xbsk, mc, mpc, backend: str):
    """BEHZ scale-and-round (fast_floor + bsk_to_q), kernelized like
    _r2b."""
    if backend == "xla":
        return behz.scale_and_round(xq, xbsk, mc)
    return behz_pallas.scale_and_round(
        xq, xbsk, mpc, interpret=(backend == "pallas-interpret"))


def _fwd_addneg(x, e, tables, ftab, ms, backend: str):
    """NTT(-(x + e)) — fused on the pallas backends (keygen's
    poly_add_negate_xq immediately feeds pk0's forward transform)."""
    if backend == "xla":
        return ntt.ntt_forward(poly.poly_add_negate(x, e, ms), tables, ms)
    return ntt_pallas.ntt_forward_addneg(
        x, e, ftab, interpret=(backend == "pallas-interpret"))


@dataclasses.dataclass(frozen=True)
class BFVContext:
    """Device-resident constants for one parameter set, plus jitted ops.

    Build once per (n, r) — the analog of demo.cu's host precompute +
    cudaMemcpyToSymbol setup (demo.cu:62-272).
    """

    params: params_mod.BFVParams
    ms_full: modmath.ModulusSet       # all r moduli
    ms_drop: modmath.ModulusSet       # first r-1 moduli
    ms_last: modmath.ModulusSet       # the dropped modulus only
    tables_full: ntt.NTTTables        # (r, n)
    tables_drop: ntt.NTTTables        # (r-1, n)
    dr_consts: poly.DivideRoundConsts
    msg_consts: poly.MessageConsts
    dec_consts: poly.DecryptConsts
    backend: str                       # "xla" | "pallas" | "pallas-interpret"
    ftab_full: ntt_pallas.FourStepTables | None
    ftab_drop: ntt_pallas.FourStepTables | None
    tail_consts: bfv_tail.TailConsts | None
    dec_tail_consts: bfv_tail.DecTailConsts | None
    uniform_spec: str = "int"          # "int" | "fp64" (reference-exact)
    fusion: str = "op"                 # "op" | "stage" (see build())
    compact_a: bool = False            # un-expanded stage-A tables (build())
    # lazily-built EvalMult state (aux-base consts + Bsk NTT tables);
    # a mutable cache on a frozen context, excluded from eq/hash
    _mult_cache: dict = dataclasses.field(default_factory=dict,
                                          compare=False, repr=False)

    @staticmethod
    def build(params: params_mod.BFVParams,
              backend: str | None = None,
              uniform_spec: str = "int",
              fusion: str = "auto",
              compact_a: bool = False) -> "BFVContext":
        """uniform_spec="fp64" makes keygen's uniform draw follow the
        reference's exact double-precision semantics (bfv_keygen.cuh:33-45,
        emulated bit-for-bit in integer arithmetic — ops/sampling.py
        uniform_ref).  The default "int" spec is the documented
        integer-exact deviation.

        fusion selects the pallas kernel schedule (bit-identical results):
        "op" runs each BFV op's dependent transform batches in ONE kernel
        with per-modulus twiddle residency (ops/fused_ops.py); "stage"
        runs the per-stage kernels (one kernel per transform batch).
        "auto" (default) picks by size from the round-4 same-process TPU
        A/B (scratch/ab_r4.log): op wins up to n=16384 (16k_5q decrypt
        2.1x, 88 vs 183 us — past the V100's 104 us), stage wins at
        n=32768 (the op kernels' ~9 MB/modulus fwd+inv table residency
        defeats Mosaic's grid pipelining there: 32k_9q keygen 815 vs
        731 us).

        compact_a stores the Pallas stage-A twiddle tables un-expanded
        ((4, n1, 128) planes, expanded per stage in-kernel) — 8x smaller
        per-modulus table residency at in-kernel expand cost.  Measured
        round 5 (scratch/compact_ab.log, same-process TPU A/B): it
        LOSES everywhere — 32k_9q op/compact 0.78-0.85x and
        stage/compact 0.84-0.87x of stage/expanded; 16k_5q op/compact
        encrypt 0.87x of op/expanded; 32k_16q 0.78-0.88x.  The expand
        work exceeds the residency win at every size, so the default
        stays False (expanded); the knob is kept for study.
        Bit-identical outputs either way (tests/test_compact_a.py);
        threaded through every table the context builds, including the
        lazily-built Bsk EvalMult tables."""
        if params.t % 2 == 0 and params.t & (params.t - 1):
            raise ValueError(
                f"t={params.t} is neither a power of two (reference "
                f"semantics) nor odd (batching-prime semantics); no "
                f"decrypt path supports it")
        explicit = backend is not None
        backend = backend or default_backend()
        if (params.t & (params.t - 1) and params.t >= (1 << 31)
                and backend != "xla"):
            # the pallas tails cover pow2 t (reference mask semantics)
            # and odd batching primes < 2^31 (Barrett-by-t,
            # ops/bfv_tail._t_strategy); larger odd t runs the portable
            # XLA pipelines
            if explicit:
                raise ValueError(
                    "pallas backends require a power-of-two t or an odd "
                    "t < 2^31; build with backend='xla' for larger "
                    "plaintext moduli")
            backend = "xla"
        if uniform_spec not in ("int", "fp64"):
            raise ValueError(f"unknown uniform_spec {uniform_spec!r}")
        if fusion == "auto":
            fusion = "op" if params.n <= 16384 else "stage"
        if fusion not in ("op", "stage"):
            raise ValueError(f"unknown fusion {fusion!r}")
        use_pallas = backend != "xla"
        compact_a = bool(compact_a)
        return BFVContext(
            uniform_spec=uniform_spec,
            fusion=fusion,
            compact_a=compact_a,
            params=params,
            ms_full=modmath.modulus_set(params),
            ms_drop=modmath.modulus_set(params, params.r - 1),
            ms_last=modmath.ModulusSet.from_moduli([params.q[-1]]),
            tables_full=ntt.tables_for(params),
            tables_drop=ntt.tables_for(params, params.r - 1),
            dr_consts=poly.DivideRoundConsts.build(params),
            msg_consts=poly.MessageConsts.build(params),
            dec_consts=poly.DecryptConsts.build(params),
            backend=backend,
            ftab_full=(ntt_pallas.tables_for(params, compact_a=compact_a)
                       if use_pallas else None),
            ftab_drop=(ntt_pallas.tables_for(params, params.r - 1,
                                             compact_a=compact_a)
                       if use_pallas else None),
            tail_consts=bfv_tail.TailConsts.build(params) if use_pallas else None,
            dec_tail_consts=(bfv_tail.DecTailConsts.build(params)
                             if use_pallas else None),
        )

    # -- public API ---------------------------------------------------------

    def keygen(self, nonce=0):
        """-> (sk (r, n), pk (2, r, n)), both NTT-domain.

        `nonce` (int or traced u64) selects the Salsa20 nonce; 0 is the
        reference's deterministic default.  Keygen nonces live in the
        bit-63-clear half of the nonce space (sampling.keygen_nonce) —
        structurally disjoint from every nonzero encryption nonce.
        Nonces must be < 2**63 (bit 63 is the domain-separation bit)."""
        sampling.check_user_nonce(nonce)
        return _keygen_jit(jnp.asarray(nonce, U64), self.ms_full,
                           self.tables_full, self.ftab_full,
                           self.params.n, self.params.r, self.backend,
                           self.uniform_spec, self.fusion)

    def encrypt(self, pk, m_poly, nonce=0):
        """pk (2, r, n) NTT-domain, m_poly (n,) in [0, t) ->
        ciphertext (2, r-1, n), coefficient domain.

        Pass a distinct `nonce` per message for fresh (u, e0, e1) draws;
        nonce 0 reproduces the reference's fixed-randomness pipeline.
        Nonzero encryption nonces are mapped into the bit-63-set half of
        the nonce space (sampling.encrypt_nonce), so they can never
        collide with a keygen stream; nonce 0 passes through for
        reference byte-compatibility (its keygen and encryption share
        the nonce-0 stream BY DESIGN — never use a nonce-0 pair for real
        data; see ops/sampling.py).  Nonces must be < 2**63 (bit 63 is
        the domain-separation bit)."""
        sampling.check_user_nonce(nonce)
        p = self.params
        pk = check_residues("pk", pk, (2, p.r, p.n),
                            "keygen returns the NTT-domain (2, r, n) pk")
        m_poly = check_residues("m_poly", m_poly, (p.n,),
                                f"one plaintext value in [0, t) per "
                                f"coefficient, n={p.n}")
        return _encrypt_jit(jnp.asarray(nonce, U64), pk, m_poly,
                            self.ms_full, self.ms_drop,
                            self.ms_last, self.tables_full, self.ftab_full,
                            self.dr_consts, self.msg_consts, self.tail_consts,
                            self.params.n, self.params.r, self.backend,
                            self.fusion)

    def encrypt_batch(self, pk, m_batch, nonces):
        """Throughput-mode encryption: J messages per kernel sweep.

        pk (2, r, n) NTT-domain, m_batch (J, n) in [0, t), nonces (J,)
        distinct per-message nonces -> (J, 2, r-1, n) ciphertexts.  On
        the pallas backends the whole batch runs as ONE kernel whose
        grid is modulus-major, so each modulus's twiddle set is fetched
        once for all J messages (the V100's Table 7 numbers are
        internally 18-36-transform batches; this is the TPU's own
        batched economics).  Bit-identical to encrypt() per message."""
        p = self.params
        pk = check_residues("pk", pk, (2, p.r, p.n),
                            "keygen returns the NTT-domain (2, r, n) pk")
        m_batch = jnp.asarray(m_batch)
        if m_batch.ndim != 2:
            raise ValueError(f"m_batch: expected (J, n), got {m_batch.shape}")
        J = m_batch.shape[0]
        m_batch = check_residues("m_batch", m_batch, (J, p.n))
        sampling.check_user_nonce(nonces)
        nonces = jnp.asarray(nonces, U64)
        if nonces.shape != (J,):
            raise ValueError(f"nonces: expected shape ({J},), got "
                             f"{nonces.shape}")
        return _encrypt_batch_jit(nonces, pk, m_batch, self.ms_full,
                                  self.ms_drop, self.ms_last,
                                  self.tables_full, self.ftab_full,
                                  self.dr_consts, self.msg_consts,
                                  self.tail_consts, p.n, p.r, J,
                                  self.backend, self.fusion)

    def decrypt(self, sk, ct):
        """sk (r, n) NTT-domain (first r-1 residues used; (r-1, n) also
        accepted), ct (L, r-1, n) -> plaintext (n,) in [0, t).

        L = 2 for fresh/relinearized ciphertexts; L >= 3 decrypts
        un-relinearized EvalMult outputs directly (c0 + c1*s + ... +
        c_{L-1}*s^{L-1}, the standard BFV extended-ciphertext form)."""
        p = self.params
        sk = self._sk_drop(sk)
        ct = _as_array("ct", ct)
        if ct.ndim != 3 or ct.shape[0] < 2:
            raise ValueError(f"ct: expected shape (L>=2, r-1, n), got "
                             f"{ct.shape}")
        L = ct.shape[0]
        ct = check_residues("ct", ct, (L, p.r - 1, p.n),
                            "encrypt returns (2, r-1, n), mul() (3, r-1, n)"
                            " — the last RNS modulus is dropped")
        if L == 2:
            return _decrypt_jit(sk, ct, self.ms_drop,
                                self.tables_drop, self.ftab_drop,
                                self.dec_consts, self.dec_tail_consts,
                                self.backend, self.fusion)
        return _decrypt_many_jit(sk, ct, self.ms_drop, self.tables_drop,
                                 self.ftab_drop, self.dec_consts,
                                 self.dec_tail_consts, self.backend)

    def decrypt_batch(self, sk, cts):
        """Throughput-mode decryption: cts (J, 2, r-1, n) -> (J, n).
        One modulus-major kernel sweep over all J messages on the pallas
        backends; bit-identical to decrypt() per message."""
        p = self.params
        sk = self._sk_drop(sk)
        cts = jnp.asarray(cts)
        if cts.ndim != 4:
            raise ValueError(f"cts: expected (J, 2, r-1, n), got {cts.shape}")
        J = cts.shape[0]
        cts = check_residues("cts", cts, (J, 2, p.r - 1, p.n))
        return _decrypt_batch_jit(sk, cts, self.ms_drop, self.tables_drop,
                                  self.ftab_drop, self.dec_consts,
                                  self.dec_tail_consts, self.backend,
                                  self.fusion)

    def add(self, ct_a, ct_b):
        """Homomorphic addition: decrypt(add(E(m1), E(m2))) == (m1 + m2) mod t.

        BFV ciphertexts are linear in the message — component-wise
        residue addition is the scheme's EvalAdd (beyond the reference,
        which stops at encrypt/decrypt; the noise of the sum is the sum
        of the operands' noises, so fresh encryptions are far inside the
        decryption budget).  Accepts (2, r-1, n) ciphertexts or
        (J, 2, r-1, n) batches (shapes must match)."""
        a, b = self._ct_pair("add", ct_a, ct_b)
        return _ct_add_jit(a, b, self.ms_drop)

    def sub(self, ct_a, ct_b):
        """Homomorphic subtraction: decrypts to (m1 - m2) mod t.
        Same shape/noise contract as add()."""
        a, b = self._ct_pair("sub", ct_a, ct_b)
        return _ct_sub_jit(a, b, self.ms_drop)

    def add_plain(self, ct, m_poly):
        """Ciphertext + plaintext: decrypts to (m_ct + m) mod t.

        Reuses encryption's Delta-scaling (poly.add_message — the
        reference's weird_m_stuff, bfv_encryption.cuh:193-213) on c0;
        c1 is unchanged, so no noise is added at all."""
        p = self.params
        ct = check_residues("ct", ct, (2, p.r - 1, p.n),
                            "encrypt returns (2, r-1, n)")
        m_poly = check_residues("m_poly", m_poly, (p.n,),
                                f"one plaintext value in [0, t) per "
                                f"coefficient, n={p.n}")
        return _add_plain_jit(ct, m_poly, self.msg_consts)

    def negate(self, ct):
        """Homomorphic negation: decrypts to (-m) mod t.  Component-wise
        modular negate (the reference's poly_negate semantics,
        poly_arithmetic.cuh:332-343, with canonical 0 -> 0).  Accepts
        (2, r-1, n) or (J, 2, r-1, n)."""
        p = self.params
        ct = _as_array("ct", ct)
        base = (2, p.r - 1, p.n)
        if ct.shape[-3:] != base or ct.ndim not in (3, 4):
            raise ValueError(f"ct: expected (2, r-1, n) or (J, 2, r-1, n),"
                             f" got {ct.shape}")
        ct = check_residues("ct", ct, ct.shape)
        return _ct_negate_jit(ct, self.ms_drop)

    def sub_plain(self, ct, m_poly):
        """Ciphertext - plaintext: decrypts to (m_ct - m) mod t.  The
        exact inverse of add_plain (same Delta-scaled embedding,
        subtracted from c0; no noise added)."""
        p = self.params
        ct = check_residues("ct", ct, (2, p.r - 1, p.n),
                            "encrypt returns (2, r-1, n)")
        m_poly = check_residues("m_poly", m_poly, (p.n,),
                                f"one plaintext value in [0, t) per "
                                f"coefficient, n={p.n}")
        return _sub_plain_jit(ct, m_poly, self.msg_consts)

    def mul_plain(self, ct, m_poly):
        """Ciphertext * plaintext in R_t = Z_t[x]/(x^n + 1): decrypts to
        the negacyclic product (m_ct * m) mod t.

        Both components are multiplied by m in the NTT domain
        (INTT(NTT(c_i) . NTT(m)) per kept residue — the fused
        inverse-mul kernel on the pallas backends).  Noise scales with
        the plaintext's size; monomials and small constants are
        noise-free multipliers, dense random plaintexts can exhaust a
        fresh ciphertext's budget."""
        p = self.params
        ct = check_residues("ct", ct, (2, p.r - 1, p.n),
                            "encrypt returns (2, r-1, n)")
        m_poly = check_residues("m_poly", m_poly, (p.n,),
                                f"one plaintext value in [0, t) per "
                                f"coefficient, n={p.n}")
        return _mul_plain_jit(ct, m_poly, self.ms_drop, self.tables_drop,
                              self.ftab_drop, self.backend)

    def mul(self, ct_a, ct_b, rlk=None):
        """Homomorphic ciphertext multiplication (BEHZ RNS EvalMult):
        decrypts to the negacyclic product (m1 * m2) mod t.

        The reference stops at encrypt/decrypt; this is the full RNS
        multiplication pipeline (Bajard-Eynard-Hasan-Zucca 2016, the
        SEAL 3.5 BFV evaluator semantics) built on the same fast
        base-conversion primitive as decryption
        (poly_arithmetic.cuh:217-251): extend both ciphertexts to the
        auxiliary base Bsk (ops/behz.py), tensor-product in NTT form
        over q AND Bsk, scale by t/q (fast_floor), and convert back
        (Shenoy-Kumaresan).

        Accepts (2, r-1, n) ciphertexts or (J, 2, r-1, n) batches.
        Returns the 3-component (..., 3, r-1, n) ciphertext, or a
        relinearized (..., 2, r-1, n) one when `rlk` (relin_keygen) is
        given.  decrypt() accepts both forms."""
        a, b = self._ct_pair("mul", ct_a, ct_b)
        st = self._mult_setup()
        ct3 = _mult_jit(a, b, st.mc, st.mpc, self.tables_drop,
                        self.ftab_drop, st.tables_bsk, st.ftab_bsk,
                        self.ms_drop, self.backend)
        if rlk is None:
            return ct3
        return self.relinearize(ct3, rlk)

    def square(self, ct, rlk=None):
        """Homomorphic squaring: mul(ct, ct) at ~half the transform cost
        (one operand's forwards over q and Bsk serve both sides, and the
        cross term is 2*a0*a1).  Bit-identical to mul(ct, ct)."""
        a, _ = self._ct_pair("square", ct, ct)
        st = self._mult_setup()
        ct3 = _square_jit(a, st.mc, st.mpc, self.tables_drop,
                          self.ftab_drop, st.tables_bsk, st.ftab_bsk,
                          self.ms_drop, self.backend)
        if rlk is None:
            return ct3
        return self.relinearize(ct3, rlk)

    def op_programs(self):
        """(kg_fn, enc_fn, dec_fn, enc_batch_fn, dec_batch_fn, bundles):
        the scheme ops as pure functions of their array arguments, for
        embedding inside an OUTER jit (e.g. a benchmark's chained
        fori_loop) without freezing the NTT table bundles into the
        compiled module as constants — a 32k module with inlined tables
        is ~50-170 MB, which costs minutes of remote-compile upload
        through the TPU relay (and the mul+relin one exceeds its upload
        limit outright; see mult_program).

        kg_fn(nonce_u64, bz) == keygen(nonce); enc_fn(nonce_u64, pk, m,
        bz) == encrypt(pk, m, nonce); dec_fn(sk, ct, bz) ==
        decrypt(sk, ct) for L=2 and a full (r, n) or dropped (r-1, n)
        sk; *_batch_fn mirror encrypt_batch/decrypt_batch.  No argument
        validation — callers hold the validated arrays."""
        p = self.params
        backend, fusion, us = self.backend, self.fusion, self.uniform_spec
        bundles = dict(
            msf=self.ms_full, msd=self.ms_drop, msl=self.ms_last,
            tf=self.tables_full, ff=self.ftab_full,
            td=self.tables_drop, fd=self.ftab_drop,
            dr=self.dr_consts, mg=self.msg_consts, tc=self.tail_consts,
            dc=self.dec_consts, dtc=self.dec_tail_consts)

        def kg_fn(nonce, bz):
            return _keygen_jit(nonce, bz["msf"], bz["tf"], bz["ff"],
                               p.n, p.r, backend, us, fusion)

        def enc_fn(nonce, pk, m_poly, bz):
            return _encrypt_jit(nonce, pk, m_poly, bz["msf"], bz["msd"],
                                bz["msl"], bz["tf"], bz["ff"], bz["dr"],
                                bz["mg"], bz["tc"], p.n, p.r, backend,
                                fusion)

        def dec_fn(sk, ct, bz):
            return _decrypt_jit(sk[: p.r - 1], ct, bz["msd"], bz["td"],
                                bz["fd"], bz["dc"], bz["dtc"], backend,
                                fusion)

        def enc_batch_fn(nonces, pk, m_batch, bz):
            return _encrypt_batch_jit(nonces, pk, m_batch, bz["msf"],
                                      bz["msd"], bz["msl"], bz["tf"],
                                      bz["ff"], bz["dr"], bz["mg"],
                                      bz["tc"], p.n, p.r,
                                      m_batch.shape[0], backend, fusion)

        def dec_batch_fn(sk, cts, bz):
            return _decrypt_batch_jit(sk[: p.r - 1], cts, bz["msd"],
                                      bz["td"], bz["fd"], bz["dc"],
                                      bz["dtc"], backend, fusion)

        return kg_fn, enc_fn, dec_fn, enc_batch_fn, dec_batch_fn, bundles

    def mult_program(self):
        """(mul_fn, square_fn, bundles) for embedding EvalMult inside an
        OUTER jit (e.g. a benchmark's chained fori_loop) without baking
        the table bundles in as module constants.

        Tracing mul() under an outer jit freezes the q-base AND Bsk NTT
        tables into the compiled module as literals; at n=32768 the
        result exceeds the TPU relay's remote-compile upload limit
        (HTTP 413 — why no 32k EvalMult number could ever be captured).
        The returned functions take the same bundles as runtime buffer
        arguments instead: mul_fn(a, b, rlk, bundles) ==
        mul(a, b, rlk=rlk) bit-for-bit, square_fn(a, rlk, bundles) ==
        square(a, rlk=rlk)."""
        st = self._mult_setup()
        backend = self.backend
        fusion = self.fusion
        bundles = dict(
            mc=st.mc, mpc=st.mpc, tq=self.tables_drop, fq=self.ftab_drop,
            tb=st.tables_bsk, fb=st.ftab_bsk, msd=self.ms_drop,
            msf=self.ms_full, msl=self.ms_last, tf=self.tables_full,
            ff=self.ftab_full, dr=self.dr_consts, tc=self.tail_consts,
            nub=self._nu_bank())

        def finish(ct3, rlk, bz):
            if rlk is None:
                return ct3
            cc = _keyswitch_jit(ct3[..., 2, :, :], rlk, bz["msf"],
                                bz["msd"], bz["msl"], bz["tf"], bz["ff"],
                                bz["dr"], bz["tc"], bz["nub"], backend,
                                fusion)
            return _ct_add_jit(ct3[..., :2, :, :], cc, bz["msd"])

        def mul_fn(a, b, rlk, bz):
            ct3 = _mult_jit(a, b, bz["mc"], bz["mpc"], bz["tq"], bz["fq"],
                            bz["tb"], bz["fb"], bz["msd"], backend)
            return finish(ct3, rlk, bz)

        def square_fn(a, rlk, bz):
            ct3 = _square_jit(a, bz["mc"], bz["mpc"], bz["tq"], bz["fq"],
                              bz["tb"], bz["fb"], bz["msd"], backend)
            return finish(ct3, rlk, bz)

        return mul_fn, square_fn, bundles

    def relin_keygen(self, sk, nonce=0):
        """Generate relinearization keys for mul(): (2, r-1, r, n),
        NTT-domain.

        Special-modulus key switching: the dropped last RNS modulus
        q_last (already the scheme's encryption special modulus,
        bfv_encryption.cuh:111-178) doubles as the key-switching
        modulus P.  Key j encrypts P * q-tilde_j * s^2 over the full
        base q, so switching divides the digit noise by P
        (divide_and_round_q_last — the exact same kernel as
        encryption's modulus drop).

        Draws run under a dedicated Salsa20 key byte
        (sampling.RELIN_KEY_BYTE), independent of every keygen/encrypt
        stream at any nonce.  Nonces must be < 2**63."""
        sampling.check_user_nonce(nonce)
        p = self.params
        sk = check_residues("sk", sk, (p.r, p.n),
                            "keygen returns the NTT-domain (r, n) sk")
        return _relin_keygen_jit(jnp.asarray(nonce, U64), sk, self.ms_full,
                                 self.tables_full, self.ftab_full,
                                 self._p_mont_bank(), p.n, p.r,
                                 self.backend)

    def relinearize(self, ct3, rlk):
        """(3, r-1, n) EvalMult output + relin keys -> (2, r-1, n).

        RNS-decomposes c2 into its residue digits, key-switches through
        rlk over the extended base (q, q_last), and divides by q_last
        (divide_and_round_q_last), folding c2*s^2 into (c0, c1) with
        only additive noise ~ k*n*B/1 (digit noise / P)."""
        p = self.params
        ct3 = _as_array("ct3", ct3)
        base = (3, p.r - 1, p.n)
        if ct3.shape[-3:] != base or ct3.ndim not in (3, 4):
            raise ValueError(f"ct3: expected (3, r-1, n) or (J, 3, r-1, n),"
                             f" got {ct3.shape}")
        ct3 = check_residues("ct3", ct3, ct3.shape)
        rlk = check_residues("rlk", rlk, (2, p.r - 1, p.r, p.n),
                             "relin_keygen returns (2, r-1, r, n)")
        cc = _keyswitch_jit(ct3[..., 2, :, :], rlk, self.ms_full,
                            self.ms_drop, self.ms_last, self.tables_full,
                            self.ftab_full, self.dr_consts,
                            self.tail_consts, self._nu_bank(),
                            self.backend, self.fusion)
        return _ct_add_jit(ct3[..., :2, :, :], cc, self.ms_drop)

    def galois_keygen(self, sk, elts, nonce=0):
        """Switching keys for the Galois automorphisms x -> x^g:
        {g: (2, r-1, r, n)} for each g in `elts` (odd, 0 < g < 2n).

        Beyond the reference (SEAL's galois_keys): enables homomorphic
        coefficient permutations via apply_galois().  Draws run under
        their own Salsa20 key byte (sampling.GALOIS_KEY_BYTE), with the
        stream region indexed by the ELEMENT VALUE — independent of
        keygen/encrypt/relin streams at any nonce, and safe to call
        repeatedly at one nonce with different element sets (a shared
        element reproduces its key; distinct elements never share
        randomness)."""
        sampling.check_user_nonce(nonce)
        p = self.params
        sk = check_residues("sk", sk, (p.r, p.n),
                            "keygen returns the NTT-domain (r, n) sk")
        elts = sorted({int(g) for g in elts})
        maps = [poly.galois_maps(p.n, g) for g in elts]  # validates each g
        perms = jnp.asarray(np.stack([m[0] for m in maps]))
        negs = jnp.asarray(np.stack([m[1] for m in maps]))
        keys = _galois_keygen_jit(jnp.asarray(nonce, U64), sk, perms, negs,
                                  self.ms_full, self.tables_full,
                                  self.ftab_full, self._p_mont_bank(),
                                  tuple(elts), p.n, p.r, self.backend)
        return {g: keys[t] for t, g in enumerate(elts)}

    def apply_galois(self, ct, g, gk):
        """Homomorphic automorphism: decrypts to tau_g(m), i.e.
        out[j] = ±m[(j * g^-1 mod 2n) mod n] with the negacyclic sign,
        reduced mod t.  `gk` is galois_keygen(...)[g].  Accepts
        (2, r-1, n) ciphertexts or (J, 2, r-1, n) batches."""
        p = self.params
        ct = _as_array("ct", ct)
        base = (2, p.r - 1, p.n)
        if ct.shape[-3:] != base or ct.ndim not in (3, 4):
            raise ValueError(f"ct: expected (2, r-1, n) or (J, 2, r-1, n)"
                             f" = (..., {base}), got {ct.shape}")
        ct = check_residues("ct", ct, ct.shape)
        gk = check_residues("gk", gk, (2, p.r - 1, p.r, p.n),
                            "pass one key from galois_keygen()")
        perm, neg = poly.galois_maps(p.n, int(g))
        return _apply_galois_jit(ct, jnp.asarray(perm), jnp.asarray(neg),
                                 gk, self.ms_full, self.ms_drop,
                                 self.ms_last, self.tables_full,
                                 self.ftab_full, self.dr_consts,
                                 self.tail_consts, self._nu_bank(),
                                 self.backend, self.fusion)

    def next_context(self) -> "BFVContext":
        """The context one level down the modulus chain: same scheme over
        q[:-1], with q[r-2] taking the dropped-special role.  Cached.
        Decryption there uses the same sk (its first r-2 residue rows)."""
        nxt = self._mult_cache.get("next_ctx")
        if nxt is None:
            p = self.params
            if p.r < 3:
                raise ValueError("modulus chain exhausted: r must be >= 3 "
                                 "to drop another modulus")
            np_ = params_mod.BFVParams(
                name=f"{p.name}@L{p.r - 1}", n=p.n, q=p.q[:-1],
                psi=p.psi[:-1], t=p.t, gamma=p.gamma)
            nxt = BFVContext.build(np_, backend=self.backend,
                                   uniform_spec=self.uniform_spec,
                                   fusion=self.fusion)
            self._mult_cache["next_ctx"] = nxt
        return nxt

    def mod_switch_to_next(self, ct):
        """Switch a ciphertext one level down the modulus chain
        (SEAL's mod_switch_to_next): (L, r-1, n) -> (L, r-2, n), each
        component divided-and-rounded by the last kept modulus — the
        exact same kernel as encryption's modulus drop
        (bfv_encryption.cuh:111-178).  The invariant noise is nearly
        preserved while ciphertexts shrink by one residue row; decrypt
        and further eval ops run under next_context()."""
        p = self.params
        ct = _as_array("ct", ct)
        if ct.ndim != 3 or ct.shape[0] < 2:
            raise ValueError(f"ct: expected shape (L>=2, r-1, n), got "
                             f"{ct.shape}")
        L = ct.shape[0]
        ct = check_residues("ct", ct, (L, p.r - 1, p.n))
        nxt = self.next_context()
        return _mod_switch_jit(ct, nxt.dr_consts, nxt.ms_drop, nxt.ms_last)

    def noise_budget(self, sk, ct) -> int:
        """Invariant noise budget in bits (SEAL's
        invariant_noise_budget): floor(log2(q / (2*|w|))) where
        w = [t*(c0 + c1 s + ...)]_q centered — the number of further
        noise-doubling operations the ciphertext survives; 0 means
        decryption is no longer guaranteed.

        The residue computation runs on device (the decrypt pipeline's
        front without the rounding tail); the exact centered CRT
        reconstruction and the max-norm run host-side in Python ints —
        this is a diagnostic, not a hot-path op."""
        p = self.params
        sk = self._sk_drop(sk)
        ct = _as_array("ct", ct)
        if ct.ndim != 3 or ct.shape[0] < 2:
            raise ValueError(f"ct: expected shape (L>=2, r-1, n), got "
                             f"{ct.shape}")
        L = ct.shape[0]
        ct = check_residues("ct", ct, (L, p.r - 1, p.n))
        t_mont = self._mult_cache.get("t_mont_drop")
        if t_mont is None:
            t_mont = jnp.asarray([[hm.to_mont(p.t % qj, qj)]
                                  for qj in p.q[:-1]], dtype=U64)
            self._mult_cache["t_mont_drop"] = t_mont
        w = np.asarray(_noise_poly_jit(sk, ct, t_mont, self.ms_drop,
                                       self.tables_drop, self.ftab_drop,
                                       self.backend))
        qs = [int(q) for q in p.q[: p.r - 1]]
        q_prod = 1
        for q in qs:
            q_prod *= q
        lifts = [(q_prod // q) * pow((q_prod // q) % q, -1, q)
                 for q in qs]
        # plain CPython big-int loop: measured 0.26 s at n=32768, r=15 —
        # FASTER than a vectorized numpy u32-limb CRT (1.3 s; big-int
        # multiply-by-constant is already optimal here).  Hoist the one
        # per-iteration big division.
        q_half = q_prod // 2
        max_w = 0
        for i in range(p.n):
            x = 0
            for j in range(len(qs)):
                x += int(w[j, i]) * lifts[j]
            x %= q_prod
            if x > q_half:
                x = q_prod - x
            if x > max_w:
                max_w = x
        if max_w == 0:
            return q_prod.bit_length() - 1
        budget = q_prod // (2 * max_w)
        return max(0, budget.bit_length() - 1)

    def rotate_rows(self, ct, steps, gks):
        """Cyclic slot rotation of both batching rows by `steps`
        (SEAL rotate_rows) — meaningful with a prime batching t and the
        BatchEncoder (models/encoder.py).  `gks` is the dict from
        galois_keygen and must contain encoder.rotation_element(n,
        steps)."""
        from . import encoder as encoder_mod
        g = encoder_mod.rotation_element(self.params.n, steps)
        if g not in gks:
            raise KeyError(
                f"gks lacks the rotation element {g} for steps={steps}; "
                f"generate with galois_keygen(sk, "
                f"[rotation_element(n, {steps})])")
        return self.apply_galois(ct, g, gks[g])

    def rotate_columns(self, ct, gks):
        """Swap the two batching rows (SEAL rotate_columns; Galois
        element 2n-1)."""
        from . import encoder as encoder_mod
        g = encoder_mod.column_element(self.params.n)
        if g not in gks:
            raise KeyError(f"gks lacks the column element {g}; generate "
                           f"with galois_keygen(sk, [2*n - 1])")
        return self.apply_galois(ct, g, gks[g])

    def _p_mont_bank(self):
        """(r, 1) bank of P * R mod q_i (P = q_last); the last row is 0
        (P === 0 mod q_last) and is never selected by the key-switch
        diagonal mask — padded so it broadcasts against (r, n) rows."""
        pm = self._mult_cache.get("p_mont")
        if pm is None:
            p = self.params
            pm = jnp.asarray([[hm.to_mont(p.q[-1] % qj, qj)]
                              for qj in p.q[:-1]] + [[0]], dtype=U64)
            self._mult_cache["p_mont"] = pm
        return pm

    def _nu_bank(self):
        """(r, 2) u32 floor(2^64/q_i) limb pairs (keyswitch_fused's
        digit-reduction bank); cached."""
        nb = self._mult_cache.get("nu_bank")
        if nb is None:
            rows = [((1 << 64) // q & 0xFFFFFFFF, ((1 << 64) // q) >> 32)
                    for q in self.params.q]
            nb = jnp.asarray(np.array(rows, dtype=np.uint32))
            self._mult_cache["nu_bank"] = nb
        return nb

    def _mult_setup(self) -> "_MultSetup":
        st = self._mult_cache.get("setup")
        if st is None:
            p = self.params
            aux = behz.AuxBase.build(p)
            mc = behz.MultConsts.build(p, aux)
            use_pallas = self.backend != "xla"
            st = _MultSetup(
                mc=mc,
                mpc=(behz_pallas.MultPallasConsts.build(p, aux)
                     if use_pallas else None),
                tables_bsk=ntt.NTTTables.build(aux.bsk, aux.bsk_psi, p.n),
                ftab_bsk=(ntt_pallas.FourStepTables.build(
                    aux.bsk, aux.bsk_psi, p.n, compact_a=self.compact_a)
                    if use_pallas else None),
                p_mont=self._p_mont_bank(),
            )
            self._mult_cache["setup"] = st
        return st

    def _ct_pair(self, op, ct_a, ct_b):
        p = self.params
        ct_a, ct_b = jnp.asarray(ct_a), jnp.asarray(ct_b)
        if ct_a.shape != ct_b.shape:
            raise ValueError(f"{op}: ciphertext shapes differ "
                             f"({ct_a.shape} vs {ct_b.shape})")
        base = (2, p.r - 1, p.n)
        if ct_a.shape[-3:] != base or ct_a.ndim not in (3, 4):
            raise ValueError(f"{op}: expected (2, r-1, n) or (J, 2, r-1, n) "
                             f"= (..., {base}), got {ct_a.shape}")
        ct_a = check_residues(f"{op} lhs", ct_a, ct_a.shape)
        ct_b = check_residues(f"{op} rhs", ct_b, ct_b.shape)
        return ct_a, ct_b

    def _sk_drop(self, sk):
        p = self.params
        sk = jnp.asarray(sk)
        if sk.ndim == 2 and sk.shape[0] >= p.r:
            # extra rows are the same s under higher-level moduli — a
            # full-chain sk decrypts at every level (mod_switch_to_next)
            sk = sk[: p.r - 1]
        return check_residues("sk", sk, (p.r - 1, p.n),
                              "keygen returns the NTT-domain (r, n) sk")

    def roundtrip_check(self, m_poly):
        """demo.cu-style end-to-end: decrypt(encrypt(m)) (demo.cu:274-311)."""
        sk, pk = self.keygen()
        ct = self.encrypt(pk, m_poly)
        return self.decrypt(sk, ct)


# ---------------------------------------------------------------------------
# Jitted pipelines (static over (n, r); retraced per parameter set).
# ---------------------------------------------------------------------------

@jax.jit
def _ct_add_jit(a, b, ms):
    # Exact mod-q add (not the reference's lazy strict-`>` quirk): sums
    # that land exactly on q must reduce to 0 so outputs stay canonical
    # [0, q) ciphertexts accepted by decrypt()/add() again.
    s = a + b
    return s - ms.q * (s >= ms.q).astype(U64)


@jax.jit
def _ct_sub_jit(a, b, ms):
    return poly.poly_sub(a, b, ms)


@jax.jit
def _add_plain_jit(ct, m_poly, mc):
    return ct.at[0].set(poly.add_message(ct[0], m_poly, mc))


@jax.jit
def _ct_negate_jit(ct, ms):
    return modmath.negate_mod(ct, ms.q)


@jax.jit
def _sub_plain_jit(ct, m_poly, mc):
    return ct.at[..., 0, :, :].set(
        poly.sub_message(ct[..., 0, :, :], m_poly, mc))


@functools.partial(jax.jit, static_argnames=("backend",))
def _mul_plain_jit(ct, m_poly, ms, tables, ftab, backend):
    # m's coefficients are < t < every q_i, so its residue rows are m
    # itself broadcast over the kept moduli.
    m_res = jnp.broadcast_to(m_poly[None, :], ct.shape[1:])
    fm = _fwd(m_res, tables, ftab, ms, backend)
    c0 = _inv_mul(_fwd(ct[0], tables, ftab, ms, backend), fm,
                  tables, ftab, ms, backend)
    c1 = _inv_mul(_fwd(ct[1], tables, ftab, ms, backend), fm,
                  tables, ftab, ms, backend)
    return jnp.stack([c0, c1])

@functools.partial(jax.jit,
                   static_argnames=("n", "r", "backend", "uniform_spec",
                                    "fusion"))
def _keygen_jit(nonce, ms, tables, ftab, n: int, r: int, backend: str,
                uniform_spec: str = "int", fusion: str = "op"):
    """keygen_rns (bfv_keygen.cuh:95-151)."""
    ks = "pallas" if backend == "pallas" else "xla"
    if backend != "xla" and fusion == "op":
        # whole post-draw pipeline in one twiddle-resident kernel, draws
        # in compact form (residue broadcasts happen in-kernel)
        s_b, a, e_d = sampling.keygen_draws_compact(
            n, r, ms, nonce=nonce, uniform_spec=uniform_spec, ks_impl=ks)
        sk, pk0 = fused_ops.keygen_fused(
            s_b, a, e_d, ftab, interpret=(backend == "pallas-interpret"))
        return sk, jnp.stack([pk0, a])
    if backend != "xla":
        # stage schedule, compact draws: s and e expand in-kernel
        # (ntt_forward_ternary / ntt_forward_addneg_gauss), so their
        # (r, n) u64 residue tensors never reach HBM — draw
        # generation+expansion measured 130 us of 613 us keygen at
        # 32k_9q on the expanded path (scratch/kg_profile32k.py)
        interp = backend == "pallas-interpret"
        s_b, a, e_d = sampling.keygen_draws_compact(
            n, r, ms, nonce=nonce, uniform_spec=uniform_spec, ks_impl=ks)
        sk = ntt_pallas.ntt_forward_ternary(s_b, ftab, interpret=interp)
        pk0 = ntt_pallas.ntt_inverse_mul(a, sk, ftab, interpret=interp)
        pk0 = ntt_pallas.ntt_forward_addneg_gauss(pk0, e_d, ftab,
                                                  interpret=interp)
        return sk, jnp.stack([pk0, a])
    s, a, e = sampling.keygen_draws(
        n, r, ms, nonce=nonce, uniform_spec=uniform_spec, ks_impl=ks)
    sk = _fwd(s, tables, ftab, ms, backend)             # s kept in NTT domain
    pk0 = _inv_mul(a, sk, tables, ftab, ms, backend)    # INTT(a (.) s-hat)
    pk0 = _fwd_addneg(pk0, e, tables, ftab, ms, backend)   # NTT(-(a*s + e))
    return sk, jnp.stack([pk0, a])


@functools.partial(jax.jit, static_argnames=("n", "r", "backend", "fusion"))
def _encrypt_jit(nonce, pk, m_poly, ms_full, ms_drop, ms_last, tables, ftab,
                 dr_consts, msg_consts, tail_consts, n: int, r: int,
                 backend: str, fusion: str = "op"):
    """encryption_rns (bfv_encryption.cuh:223-290).

    The reference transforms both ciphertext halves (2r forwards,
    bfv_encryption.cuh:268) but they hold the SAME polynomial u — its
    in-place buffers force the duplicate.  Here NTT(u) is computed once
    (r forwards) and broadcast into the dyadic against both pk halves:
    identical values, 25% fewer transforms per encryption."""
    interp = backend == "pallas-interpret"
    ks = "pallas" if backend == "pallas" else "xla"
    if backend != "xla" and fusion == "op":
        # the ENTIRE op after the draws is one twiddle-resident kernel;
        # draws stay compact (i32 planes), residues expand in-kernel
        u_b, e_d = sampling.encrypt_draws_compact(n, nonce=nonce,
                                                  ks_impl=ks)
        return fused_ops.encrypt_fused(u_b, pk, e_d, m_poly.astype(U64),
                                       ftab, tail_consts, interpret=interp)
    if backend != "xla":
        # stage schedule, compact draws: u's ternary expansion rides the
        # forward kernel, e's Gaussian expansion the fused tail
        u_b, e_d = sampling.encrypt_draws_compact(n, nonce=nonce,
                                                  ks_impl=ks)
        u_ntt = ntt_pallas.ntt_forward_ternary(u_b, ftab, interpret=interp)
        return bfv_tail.encrypt_fused(u_ntt, pk, e_d, m_poly.astype(U64),
                                      ftab, tail_consts, interpret=interp)
    u, e0, e1 = sampling.encrypt_draws(n, r, ms_full, nonce=nonce,
                                       ks_impl=ks)
    # xla / round-2 "stage" schedules share _encrypt_one_drawn with the
    # batched path (one post-draw body, not two copies)
    return _encrypt_one_drawn(u, jnp.stack([e0, e1]), pk, m_poly, ms_full,
                              ms_drop, ms_last, tables, ftab, dr_consts,
                              msg_consts, tail_consts, n, r, backend)


@functools.partial(jax.jit,
                   static_argnames=("n", "r", "J", "backend", "fusion"))
def _encrypt_batch_jit(nonces, pk, m_batch, ms_full, ms_drop, ms_last,
                       tables, ftab, dr_consts, msg_consts, tail_consts,
                       n: int, r: int, J: int, backend: str,
                       fusion: str = "op"):
    """J-message encryption: the J per-nonce keystreams run as ONE
    batched kernel (salsa20.keystream_block_words_batch) and the compute
    as one J-batched kernel sweep on the pallas backends.

    The fused op kernel is used regardless of the context's fusion
    schedule: it is the only J-batched sweep (the stage path loops per
    message, re-fetching every twiddle set J times), and it wins even
    at n=2^15 where the J=1 op schedule loses — measured round 5
    (scratch/batched32k.log): 32k_9q J=16 encrypt 553 us/msg fused vs
    650 us/msg per-message stage loop."""
    ks = "pallas" if backend == "pallas" else "xla"
    if backend != "xla":
        u_b, e_d = sampling.encrypt_draws_compact_batch(n, nonces,
                                                        ks_impl=ks)
        return fused_ops.encrypt_fused(u_b, pk, e_d, m_batch.astype(U64),
                                       ftab, tail_consts,
                                       interpret=(backend ==
                                                  "pallas-interpret"))
    u, e = sampling.encrypt_draws_batch(n, r, ms_full, nonces, ks_impl=ks)
    outs = [_encrypt_one_drawn(u[j], e[j], pk, m_batch[j], ms_full, ms_drop,
                               ms_last, tables, ftab, dr_consts, msg_consts,
                               tail_consts, n, r, backend)
            for j in range(J)]
    return jnp.stack(outs)


def _encrypt_one_drawn(u, e, pk, m_poly, ms_full, ms_drop, ms_last, tables,
                       ftab, dr_consts, msg_consts, tail_consts, n, r,
                       backend):
    """The post-draw encryption body (u (r, n), e (2, r, n) residues) —
    the ONE copy shared by _encrypt_jit and _encrypt_batch_jit on the
    xla and round-2 'stage' schedules."""
    u_ntt = _fwd(u, tables, ftab, ms_full, backend)
    if backend == "xla":
        c = jnp.broadcast_to(u_ntt, (2, r, n))
        c = _inv_mul(c, pk, tables, ftab, ms_full, backend)
        c = poly.poly_add(c, e, ms_full)
        c = poly.divide_and_round_q_last(c, dr_consts, ms_drop, ms_last)
        c0 = poly.add_message(c[0], m_poly, msg_consts)
        return jnp.stack([c0, c[1]])
    return bfv_tail.encrypt_fused(u_ntt, pk, e, m_poly.astype(U64),
                                  ftab, tail_consts,
                                  interpret=(backend == "pallas-interpret"))


@dataclasses.dataclass(frozen=True)
class _MultSetup:
    """Lazily-built EvalMult state for one context (BFVContext._mult_setup):
    BEHZ constants, NTT tables over the auxiliary base, and the
    key-switching scalar bank."""
    mc: behz.MultConsts
    mpc: object                        # behz_pallas.MultPallasConsts | None
    tables_bsk: ntt.NTTTables
    ftab_bsk: object                   # FourStepTables | None
    p_mont: jax.Array                  # (r-1, 1) q_last * R mod q_j


@functools.partial(jax.jit, static_argnames=("backend",))
def _mult_jit(a, b, mc, mpc, tables_q, ftab_q, tables_bsk, ftab_bsk, ms_q,
              backend: str):
    """BEHZ EvalMult core: (…, 2, k, n) x2 -> (…, 3, k, n).

    Tensor product over the combined base q ∪ Bsk in NTT form, then
    round(t/q * .) back into base q (behz.scale_and_round).  The base-q
    half multiplies the ORIGINAL residues (they are congruent mod q to
    the centered lifts Bsk sees — standard BEHZ)."""
    ab = _r2b(a, mc, mpc, backend)                   # (…, 2, k+1, n)
    bb = _r2b(b, mc, mpc, backend)
    # both operands' forwards in ONE kernel sweep per base (modulus-major
    # grid: each modulus's twiddles fetched once for all four polys)
    fq = _fwd(jnp.stack([a, b], axis=-4), tables_q, ftab_q, ms_q, backend)
    fb_ = _fwd(jnp.stack([ab, bb], axis=-4), tables_bsk, ftab_bsk,
               mc.ms_bsk, backend)

    def tensor(f, tables, ftab, ms):
        fa, fb = f[..., 0, :, :, :], f[..., 1, :, :, :]
        a0, a1 = fa[..., 0, :, :], fa[..., 1, :, :]
        b0, b1 = fb[..., 0, :, :], fb[..., 1, :, :]
        # c0 = INTT(a0 b0), c2 = INTT(a1 b1): one fused inverse-mul sweep
        outer = _inv_mul(jnp.stack([a0, a1], axis=-3),
                         jnp.stack([b0, b1], axis=-3),
                         tables, ftab, ms, backend)
        mid = modmath.add_mod(ntt.dyadic_mul(a0, b1, ms),
                              ntt.dyadic_mul(a1, b0, ms), ms.q)
        c1 = _inv(mid, tables, ftab, ms, backend)
        return jnp.stack([outer[..., 0, :, :], c1, outer[..., 1, :, :]],
                         axis=-3)

    pq = tensor(fq, tables_q, ftab_q, ms_q)
    pb = tensor(fb_, tables_bsk, ftab_bsk, mc.ms_bsk)
    return _snr(pq, pb, mc, mpc, backend)


@functools.partial(jax.jit, static_argnames=("backend",))
def _square_jit(a, mc, mpc, tables_q, ftab_q, tables_bsk, ftab_bsk, ms_q,
                backend: str):
    """EvalSquare: _mult_jit with one operand — half the forwards, and
    the cross term computed once and doubled (bit-identical to
    _mult_jit(a, a, ...) since the dyadic product is exact and
    commutative)."""
    ab = _r2b(a, mc, mpc, backend)
    fa_q = _fwd(a, tables_q, ftab_q, ms_q, backend)
    fa_b = _fwd(ab, tables_bsk, ftab_bsk, mc.ms_bsk, backend)

    def tensor(fa, tables, ftab, ms):
        a0, a1 = fa[..., 0, :, :], fa[..., 1, :, :]
        outer = _inv_mul(fa, fa, tables, ftab, ms, backend)  # a0^2, a1^2
        t = ntt.dyadic_mul(a0, a1, ms)
        c1 = _inv(modmath.add_mod(t, t, ms.q), tables, ftab, ms, backend)
        return jnp.stack([outer[..., 0, :, :], c1, outer[..., 1, :, :]],
                         axis=-3)

    pq = tensor(fa_q, tables_q, ftab_q, ms_q)
    pb = tensor(fa_b, tables_bsk, ftab_bsk, mc.ms_bsk)
    return _snr(pq, pb, mc, mpc, backend)


def _kskeygen_body(a, e, sk, target_hat, ms, tables, ftab, p_mont,
                   backend: str):
    """k switching keys encrypting `target_hat` (an NTT-domain secret
    polynomial — s^2 for relin, tau_g(s) for Galois) under sk:
    ksk0_j = NTT(-(a_j s + e_j)) + P*target at modulus row j
    (P = q_last; [P*q-tilde_j]_{q_i} = P*delta_ij, [.]_{q_last} = 0).
    Each key is exactly keygen's pk0 pipeline (bfv_keygen.cuh:120-145)
    plus one scalar multiply-add; all k keys' transforms run as TWO
    kernel sweeps (k-batched, each modulus's twiddles fetched once)."""
    k, r = a.shape[0], a.shape[1]
    x = _inv_mul(a, sk, tables, ftab, ms, backend)       # (k, r, n)
    x = _fwd_addneg(x, e, tables, ftab, ms, backend)
    term = modmath.mont_mul(target_hat, p_mont, ms.q, ms.qinv_neg)
    eye = (jnp.arange(k)[:, None] == jnp.arange(r)[None, :])[..., None]
    x = jnp.where(eye, modmath.add_mod(x, term, ms.q), x)
    return jnp.stack([x, a])                         # (2, k, r, n)


@functools.partial(jax.jit, static_argnames=("n", "r", "backend"))
def _relin_keygen_jit(nonce, sk, ms, tables, ftab, p_mont, n: int, r: int,
                      backend: str):
    """Relinearization keys: the switching-key body with target s^2."""
    k = r - 1
    ks = "pallas" if backend == "pallas" else "xla"
    a, e = sampling.relin_draws(n, r, k, ms, nonce=nonce, ks_impl=ks)
    hs2 = ntt.dyadic_mul(sk, sk, ms)                 # NTT-domain s^2
    return _kskeygen_body(a, e, sk, hs2, ms, tables, ftab, p_mont, backend)


@functools.partial(jax.jit, static_argnames=("elts", "n", "r", "backend"))
def _galois_keygen_jit(nonce, sk, perms, negs, ms, tables, ftab, p_mont,
                       elts: tuple, n: int, r: int, backend: str):
    """Galois switching keys for E elements: target tau_g(s), computed by
    INTT(sk) -> coefficient-domain automorphism -> forward NTT (one INTT
    shared by all elements)."""
    E = perms.shape[0]
    k = r - 1
    ks = "pallas" if backend == "pallas" else "xla"
    a, e = sampling.galois_draws(n, r, k, elts, ms, nonce=nonce, ks_impl=ks)
    s_coef = _inv(sk, tables, ftab, ms, backend)
    out = []
    for t in range(E):
        ts = poly.galois_apply(s_coef, perms[t], negs[t], ms)
        ts_hat = _fwd(ts, tables, ftab, ms, backend)
        out.append(_kskeygen_body(a[t], e[t], sk, ts_hat, ms, tables, ftab,
                                  p_mont, backend))
    return jnp.stack(out)                            # (E, 2, k, r, n)


@functools.partial(jax.jit, static_argnames=("backend", "fusion"))
def _apply_galois_jit(ct, perm, neg, gk, ms_full, ms_drop, ms_last, tables,
                      ftab, dr_consts, ks_consts, nub, backend: str,
                      fusion: str = "stage"):
    """tau_g on both ciphertext components (one gather + conditional
    negate), then key-switch the permuted c1 from tau_g(s) back to s."""
    tc = poly.galois_apply(ct, perm, neg, ms_drop)
    cc = _keyswitch_jit(tc[..., 1, :, :], gk, ms_full, ms_drop, ms_last,
                        tables, ftab, dr_consts, ks_consts, nub, backend,
                        fusion)
    c0 = modmath.add_mod(tc[..., 0, :, :], cc[..., 0, :, :], ms_drop.q)
    return jnp.stack([c0, cc[..., 1, :, :]], axis=-3)


@functools.partial(jax.jit, static_argnames=("backend", "fusion"))
def _keyswitch_jit(c2, rlk, ms_full, ms_drop, ms_last, tables, ftab,
                   dr_consts, ks_consts, nub, backend: str,
                   fusion: str = "stage"):
    """c2 (…, k, n) -> (…, 2, k, n) via the rlk digits.

    The RNS digits d_j = [c2]_{q_j} are lifted to the full base by plain
    u64 reduction (modmath.mod_u64 — each digit is one 60-bit residue),
    transformed, multiplied into both key rows, and the accumulated
    (…, 2, r, n) pair divided by q_last with encryption's own
    divide_and_round_q_last kernel.

    On the pallas backends the WHOLE switch runs as one kernel
    (fused_ops.keyswitch_fused): the (k, r, n) digit tensor and the
    accumulator chains never touch HBM.  Unlike the keygen/encrypt op
    kernels this fusion wins at EVERY size (32k_9q: 2167 vs 2548 us —
    scratch/ks_ab.py), so it ignores the fusion schedule."""
    if backend != "xla":
        return fused_ops.keyswitch_fused(
            c2, rlk, ftab, ks_consts, nub,
            interpret=(backend == "pallas-interpret"))
    k = c2.shape[-2]
    d = modmath.mod_u64(c2[..., :, None, :], ms_full.q, ms_full.nu)
    dhat = _fwd(d, tables, ftab, ms_full, backend)   # (…, k, r, n)
    acc0 = acc1 = None
    for j in range(k):
        dj = dhat[..., j, :, :]
        t0 = ntt.dyadic_mul(dj, rlk[0, j], ms_full)
        t1 = ntt.dyadic_mul(dj, rlk[1, j], ms_full)
        acc0 = t0 if acc0 is None else modmath.add_mod(acc0, t0, ms_full.q)
        acc1 = t1 if acc1 is None else modmath.add_mod(acc1, t1, ms_full.q)
    cc = _inv(jnp.stack([acc0, acc1], axis=-3), tables, ftab, ms_full,
              backend)
    return poly.divide_and_round_q_last(cc, dr_consts, ms_drop, ms_last)


def _spower_front(sk_drop, ct, ms, tables, ftab, backend: str):
    """x = INTT(sum_{i>=1} NTT(c_i) * s^i) — the decrypt front shared by
    extended decryption and the noise inspector.  The s-powers and the
    accumulation happen in the NTT domain, so one INTT serves all
    components."""
    L = ct.shape[0]
    acc = None
    pw = sk_drop
    for i in range(1, L):
        f = _fwd(ct[i], tables, ftab, ms, backend)
        t = ntt.dyadic_mul(f, pw, ms)
        acc = t if acc is None else modmath.add_mod(acc, t, ms.q)
        if i + 1 < L:
            pw = ntt.dyadic_mul(pw, sk_drop, ms)
    return _inv(acc, tables, ftab, ms, backend)


@functools.partial(jax.jit, static_argnames=("backend",))
def _decrypt_many_jit(sk_drop, ct, ms, tables, ftab, dec_consts,
                      dec_tail_consts, backend: str):
    """Extended-ciphertext decryption: c0 + sum_{i>=1} c_i * s^i, the
    tail being decryption's own (bfv_decryption.cuh:76-138)."""
    x = _spower_front(sk_drop, ct, ms, tables, ftab, backend)
    if backend == "xla":
        x = poly.poly_add(x, ct[0], ms)
        x = poly.poly_mul_scalar_mont(x, dec_consts.prod_t_gamma_mont, ms)
        x = poly.poly_mul_scalar_mont(x, dec_consts.inv_punctured_mont, ms)
        return poly.fast_convert_and_round(x, dec_consts)
    return bfv_tail.decrypt_tail(x, ct[0], dec_tail_consts,
                                 interpret=(backend == "pallas-interpret"))


@jax.jit
def _mod_switch_jit(ct, dr_consts, ms_drop, ms_last):
    return poly.divide_and_round_q_last(ct, dr_consts, ms_drop, ms_last)


@functools.partial(jax.jit, static_argnames=("backend",))
def _noise_poly_jit(sk_drop, ct, t_mont, ms, tables, ftab, backend: str):
    """w = [t * (c0 + sum_i c_i s^i)]_q residues — the decrypt front
    without the BEHZ rounding tail (noise_budget's device half)."""
    x = _spower_front(sk_drop, ct, ms, tables, ftab, backend)
    x = poly.poly_add(x, ct[0], ms)
    return modmath.mont_mul(x, t_mont, ms.q, ms.qinv_neg)


@functools.partial(jax.jit, static_argnames=("backend", "fusion"))
def _decrypt_jit(sk_drop, ct, ms, tables, ftab, dec_consts, dec_tail_consts,
                 backend: str, fusion: str = "op"):
    """decryption_rns (bfv_decryption.cuh:76-138)."""
    interp = backend == "pallas-interpret"
    if backend == "xla":
        x = _fwd(ct[1], tables, ftab, ms, backend)
        x = _inv_mul(x, sk_drop, tables, ftab, ms, backend)
        x = poly.poly_add(x, ct[0], ms)                 # poly_add_xq_d `>` quirk
        x = poly.poly_mul_scalar_mont(x, dec_consts.prod_t_gamma_mont, ms)
        x = poly.poly_mul_scalar_mont(x, dec_consts.inv_punctured_mont, ms)
        return poly.fast_convert_and_round(x, dec_consts)
    if fusion == "op":
        # front half = one kernel (the reference's half_poly_mul_device)
        x = fused_ops.half_polymul(ct[1], sk_drop, ftab, interpret=interp)
    else:
        x = _fwd(ct[1], tables, ftab, ms, backend)
        x = _inv_mul(x, sk_drop, tables, ftab, ms, backend)
    # NOTE: a fully fused back half exists (bfv_tail.decrypt_fused,
    # bit-exact, golden-tested) but measured ~15% SLOWER than the
    # kernel-pipeline on v5e (251 vs 218 us at 32k_9q — the fused
    # grid's larger per-step working set defeats Mosaic's pipelining),
    # so the tail stays its own kernel.
    return bfv_tail.decrypt_tail(x, ct[0], dec_tail_consts,
                                 interpret=interp)


@functools.partial(jax.jit, static_argnames=("backend", "fusion"))
def _decrypt_batch_jit(sk_drop, cts, ms, tables, ftab, dec_consts,
                       dec_tail_consts, backend: str, fusion: str = "op"):
    """J-message decryption: (J, 2, r-1, n) -> (J, n)."""
    interp = backend == "pallas-interpret"
    if backend != "xla":
        if fusion == "op":
            x = fused_ops.half_polymul(cts[:, 1], sk_drop, ftab,
                                       interpret=interp)
        else:
            x = _fwd(cts[:, 1], tables, ftab, ms, backend)
            x = _inv_mul(x, sk_drop, tables, ftab, ms, backend)
        return bfv_tail.decrypt_tail(x, cts[:, 0], dec_tail_consts,
                                     interpret=interp)
    outs = [_decrypt_jit(sk_drop, cts[j], ms, tables, ftab, dec_consts,
                         dec_tail_consts, backend, fusion)
            for j in range(cts.shape[0])]
    return jnp.stack(outs)
