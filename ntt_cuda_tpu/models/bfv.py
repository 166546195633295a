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
from ..ops import modmath, ntt, poly, sampling

U64 = jnp.uint64


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

    @staticmethod
    def build(params: params_mod.BFVParams) -> "BFVContext":
        return BFVContext(
            params=params,
            ms_full=modmath.modulus_set(params),
            ms_drop=modmath.modulus_set(params, params.r - 1),
            ms_last=modmath.ModulusSet.from_moduli([params.q[-1]]),
            tables_full=ntt.tables_for(params),
            tables_drop=ntt.tables_for(params, params.r - 1),
            dr_consts=poly.DivideRoundConsts.build(params),
            msg_consts=poly.MessageConsts.build(params),
            dec_consts=poly.DecryptConsts.build(params),
        )

    # -- public API ---------------------------------------------------------

    def keygen(self):
        """-> (sk (r, n), pk (2, r, n)), both NTT-domain."""
        return _keygen_jit(self.ms_full, self.tables_full,
                           self.params.n, self.params.r)

    def encrypt(self, pk, m_poly):
        """pk (2, r, n) NTT-domain, m_poly (n,) in [0, t) ->
        ciphertext (2, r-1, n), coefficient domain."""
        return _encrypt_jit(pk, m_poly, self.ms_full, self.ms_drop,
                            self.ms_last, self.tables_full,
                            self.dr_consts, self.msg_consts,
                            self.params.n, self.params.r)

    def decrypt(self, sk, ct):
        """sk (r, n) NTT-domain (first r-1 residues used), ct (2, r-1, n)
        -> plaintext (n,) in [0, t)."""
        return _decrypt_jit(sk[: self.params.r - 1], ct, self.ms_drop,
                            self.tables_drop, self.dec_consts)

    def roundtrip_check(self, m_poly):
        """demo.cu-style end-to-end: decrypt(encrypt(m)) (demo.cu:274-311)."""
        sk, pk = self.keygen()
        ct = self.encrypt(pk, m_poly)
        return self.decrypt(sk, ct)


# ---------------------------------------------------------------------------
# Jitted pipelines (static over (n, r); retraced per parameter set).
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n", "r"))
def _keygen_jit(ms, tables, n: int, r: int):
    """keygen_rns (bfv_keygen.cuh:95-151)."""
    s, a, e = sampling.keygen_draws(n, r, ms)
    sk = ntt.ntt_forward(s, tables, ms)                 # s kept in NTT domain
    pk0 = ntt.dyadic_mul(a, sk, ms)                     # a (.) s-hat
    pk0 = ntt.ntt_inverse(pk0, tables, ms)
    pk0 = poly.poly_add_negate(pk0, e, ms)              # -(a*s + e)
    pk0 = ntt.ntt_forward(pk0, tables, ms)
    return sk, jnp.stack([pk0, a])


@functools.partial(jax.jit, static_argnames=("n", "r"))
def _encrypt_jit(pk, m_poly, ms_full, ms_drop, ms_last, tables,
                 dr_consts, msg_consts, n: int, r: int):
    """encryption_rns (bfv_encryption.cuh:223-290)."""
    u, e0, e1 = sampling.encrypt_draws(n, r, ms_full)
    c = jnp.stack([u, u])                               # (2, r, n)
    c = ntt.ntt_forward(c, tables, ms_full)
    c = ntt.dyadic_mul(c, pk, ms_full)
    c = ntt.ntt_inverse(c, tables, ms_full)
    c = poly.poly_add(c, jnp.stack([e0, e1]), ms_full)  # `>` quirk preserved
    c = poly.divide_and_round_q_last(c, dr_consts, ms_drop, ms_last)
    c0 = poly.add_message(c[0], m_poly, msg_consts)
    return jnp.stack([c0, c[1]])


@jax.jit
def _decrypt_jit(sk_drop, ct, ms, tables, dec_consts):
    """decryption_rns (bfv_decryption.cuh:76-138)."""
    x = ntt.ntt_forward(ct[1], tables, ms)
    x = ntt.dyadic_mul(x, sk_drop, ms)
    x = ntt.ntt_inverse(x, tables, ms)
    x = poly.poly_add(x, ct[0], ms)                     # poly_add_xq_d `>` quirk
    x = poly.poly_mul_scalar_mont(x, dec_consts.prod_t_gamma_mont, ms)
    x = poly.poly_mul_scalar_mont(x, dec_consts.inv_punctured_mont, ms)
    return poly.fast_convert_and_round(x, dec_consts)
