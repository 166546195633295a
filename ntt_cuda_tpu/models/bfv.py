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

from .. import params as params_mod
from ..ops import bfv_tail, modmath, ntt, ntt_pallas, poly, sampling

U64 = jnp.uint64


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

    @staticmethod
    def build(params: params_mod.BFVParams,
              backend: str | None = None,
              uniform_spec: str = "int") -> "BFVContext":
        """uniform_spec="fp64" makes keygen's uniform draw follow the
        reference's exact double-precision semantics (bfv_keygen.cuh:33-45,
        emulated bit-for-bit in integer arithmetic — ops/sampling.py
        uniform_ref), so keygen output is byte-identical to a CUDA run
        under the fixed key.  The default "int" spec is the documented
        integer-exact deviation."""
        backend = backend or default_backend()
        if uniform_spec not in ("int", "fp64"):
            raise ValueError(f"unknown uniform_spec {uniform_spec!r}")
        use_pallas = backend != "xla"
        return BFVContext(
            uniform_spec=uniform_spec,
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
            ftab_full=ntt_pallas.tables_for(params) if use_pallas else None,
            ftab_drop=(ntt_pallas.tables_for(params, params.r - 1)
                       if use_pallas else None),
            tail_consts=bfv_tail.TailConsts.build(params) if use_pallas else None,
            dec_tail_consts=(bfv_tail.DecTailConsts.build(params)
                             if use_pallas else None),
        )

    # -- public API ---------------------------------------------------------

    def keygen(self, nonce=0):
        """-> (sk (r, n), pk (2, r, n)), both NTT-domain.

        `nonce` (int or traced u64) selects the Salsa20 nonce; 0 is the
        reference's deterministic default."""
        return _keygen_jit(jnp.asarray(nonce, U64), self.ms_full,
                           self.tables_full, self.ftab_full,
                           self.params.n, self.params.r, self.backend,
                           self.uniform_spec)

    def encrypt(self, pk, m_poly, nonce=0):
        """pk (2, r, n) NTT-domain, m_poly (n,) in [0, t) ->
        ciphertext (2, r-1, n), coefficient domain.

        Pass a distinct `nonce` per message for fresh (u, e0, e1) draws;
        nonce 0 reproduces the reference's fixed-randomness pipeline.
        NEVER reuse the keygen nonce here: keygen's `s` and encryption's
        `u` read the same keystream region, so equal nonces make u == s
        (see ops/sampling.py warning)."""
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
                            self.params.n, self.params.r, self.backend)

    def decrypt(self, sk, ct):
        """sk (r, n) NTT-domain (first r-1 residues used; (r-1, n) also
        accepted), ct (2, r-1, n) -> plaintext (n,) in [0, t)."""
        p = self.params
        sk = jnp.asarray(sk)
        if sk.ndim == 2 and sk.shape[0] == p.r:
            sk = sk[: p.r - 1]
        sk = check_residues("sk", sk, (p.r - 1, p.n),
                            "keygen returns the NTT-domain (r, n) sk")
        ct = check_residues("ct", ct, (2, p.r - 1, p.n),
                            "encrypt returns (2, r-1, n) — the last RNS "
                            "modulus is dropped")
        return _decrypt_jit(sk, ct, self.ms_drop,
                            self.tables_drop, self.ftab_drop,
                            self.dec_consts, self.dec_tail_consts,
                            self.backend)

    def roundtrip_check(self, m_poly):
        """demo.cu-style end-to-end: decrypt(encrypt(m)) (demo.cu:274-311)."""
        sk, pk = self.keygen()
        ct = self.encrypt(pk, m_poly)
        return self.decrypt(sk, ct)


# ---------------------------------------------------------------------------
# Jitted pipelines (static over (n, r); retraced per parameter set).
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("n", "r", "backend", "uniform_spec"))
def _keygen_jit(nonce, ms, tables, ftab, n: int, r: int, backend: str,
                uniform_spec: str = "int"):
    """keygen_rns (bfv_keygen.cuh:95-151)."""
    s, a, e = sampling.keygen_draws(
        n, r, ms, nonce=nonce, uniform_spec=uniform_spec,
        ks_impl="pallas" if backend == "pallas" else "xla")
    sk = _fwd(s, tables, ftab, ms, backend)             # s kept in NTT domain
    pk0 = _inv_mul(a, sk, tables, ftab, ms, backend)    # INTT(a (.) s-hat)
    pk0 = _fwd_addneg(pk0, e, tables, ftab, ms, backend)   # NTT(-(a*s + e))
    return sk, jnp.stack([pk0, a])


@functools.partial(jax.jit, static_argnames=("n", "r", "backend"))
def _encrypt_jit(nonce, pk, m_poly, ms_full, ms_drop, ms_last, tables, ftab,
                 dr_consts, msg_consts, tail_consts, n: int, r: int,
                 backend: str):
    """encryption_rns (bfv_encryption.cuh:223-290).

    The reference transforms both ciphertext halves (2r forwards,
    bfv_encryption.cuh:268) but they hold the SAME polynomial u — its
    in-place buffers force the duplicate.  Here NTT(u) is computed once
    (r forwards) and broadcast into the dyadic against both pk halves:
    identical values, 25% fewer transforms per encryption."""
    u, e0, e1 = sampling.encrypt_draws(
        n, r, ms_full, nonce=nonce,
        ks_impl="pallas" if backend == "pallas" else "xla")
    u_ntt = _fwd(u, tables, ftab, ms_full, backend)     # (r, n), once
    e = jnp.stack([e0, e1])
    if backend == "xla":
        c = jnp.broadcast_to(u_ntt, (2, r, n))
        c = _inv_mul(c, pk, tables, ftab, ms_full, backend)
        c = poly.poly_add(c, e, ms_full)                # `>` quirk preserved
        c = poly.divide_and_round_q_last(c, dr_consts, ms_drop, ms_last)
        c0 = poly.add_message(c[0], m_poly, msg_consts)
        return jnp.stack([c0, c[1]])
    # everything after NTT(u) runs in ONE kernel
    return bfv_tail.encrypt_fused(u_ntt, pk, e, m_poly.astype(U64),
                                  ftab, tail_consts,
                                  interpret=(backend == "pallas-interpret"))


@functools.partial(jax.jit, static_argnames=("backend",))
def _decrypt_jit(sk_drop, ct, ms, tables, ftab, dec_consts, dec_tail_consts,
                 backend: str):
    """decryption_rns (bfv_decryption.cuh:76-138)."""
    x = _fwd(ct[1], tables, ftab, ms, backend)
    x = _inv_mul(x, sk_drop, tables, ftab, ms, backend)
    if backend == "xla":
        x = poly.poly_add(x, ct[0], ms)                 # poly_add_xq_d `>` quirk
        x = poly.poly_mul_scalar_mont(x, dec_consts.prod_t_gamma_mont, ms)
        x = poly.poly_mul_scalar_mont(x, dec_consts.inv_punctured_mont, ms)
        return poly.fast_convert_and_round(x, dec_consts)
    # NOTE: a fully fused back half exists (bfv_tail.decrypt_fused,
    # bit-exact, golden-tested) but measured ~15% SLOWER than this
    # two-kernel pipeline on v5e (251 vs 218 us at 32k_9q — the fused
    # grid's larger per-step working set defeats Mosaic's pipelining),
    # so the pipeline stays.
    return bfv_tail.decrypt_tail(x, ct[0], dec_tail_consts,
                                 interpret=(backend == "pallas-interpret"))
