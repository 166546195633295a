"""Distribution converters: keystream bytes -> ternary / uniform / Gaussian
RNS residues.

TPU-native counterparts of the reference's fused multi-modulus samplers
(ternary_dist_xq / uniform_dist_xq / gaussian_dist_xq, bfv_keygen.cuh:14-79;
convert_ternary_gaussian_x2, bfv_encryption.cuh:17-109).  One invocation
produces the whole (r, n) residue tensor; the RNS broadcast of the
ternary/Gaussian draw (same entropy reused across moduli) is a broadcast
along the leading axis.

Spec deviations from the reference (documented, deliberate):

* **Uniform**: the reference computes `(double)u64 / UINT64_MAX * (q-1)`
  truncated (bfv_keygen.cuh:33-45).  TPU f64 is software-emulated and not
  IEEE-exact, so we define the uniform draw as the *integer-exact*
  `floor(u * (q-1) / 2^64)` — one mulhi.  Distributionally at least as
  uniform; deterministic across all backends.  `utils/golden.py`
  provides both specs.

* **Gaussian**: the reference uses CUDA's `normcdfinvf` (an fp32 vendor
  intrinsic with unpublished bit behavior).  We use
  `jax.scipy.special.ndtri` evaluated in f32.  Samples can differ from
  CUDA by +-1 only when |3.2 * z| lands within one ulp of an integer
  (~1e-7 of draws); the BFV pipeline is agnostic to this (any valid error
  sample decrypts).  sigma = 3.2, clamp +-19.2 (salsa_common.h:31,
  distributions.cuh:172-182) preserved exactly.

* **Ternary**: exact.  `b = int(byte / (255.0f/3)) - 1` has exact integer
  thresholds (85/170/255, since 255/3 = 85.0f and k*85/85.0f rounds
  exactly); byte == 255 yields b == 2 — a reference quirk we preserve
  bit-for-bit (bfv_keygen.cuh:29-30).

.. warning:: **Keygen and encryption must never share a nonce.**  Both
  pipelines read the ternary draw from the SAME keystream region (bytes
  [0, n) under the fixed key, exactly as the reference's
  generate_random_default does) — so with equal nonces the encryption
  ephemeral `u` is bit-identical to the secret key `s`, which is a
  key-recovery-grade hazard.  The reference only ever runs the fixed
  nonce-0 pipeline once per process (its bit-exactness contract, which
  nonce=0 here reproduces); any caller using the per-message nonce API
  for real encryption must draw keygen and encryption nonces from
  disjoint spaces (e.g. keygen nonce 0, encryption nonces >= 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import modmath, salsa20

U32 = jnp.uint32
U64 = jnp.uint64
F32 = jnp.float32


def ternary(bytes_u8: jax.Array, ms: modmath.ModulusSet) -> jax.Array:
    """(n,) bytes -> (r, n) ternary residues; same bytes for every modulus
    (ternary_dist_xq reads in[i % n])."""
    b = (bytes_u8.astype(jnp.int32) // 85) - 1  # in {-1, 0, 1, 2}
    b64 = b.astype(jnp.int64)
    out = jnp.where(b64 < 0, ms.q.astype(jnp.int64) + b64, jnp.broadcast_to(b64, (ms.r,) + b.shape))
    return out.astype(U64)


def uniform(u64s: jax.Array, ms: modmath.ModulusSet) -> jax.Array:
    """(r, n) u64 words -> (r, n) uniform residues in [0, q-1):
    floor(u * (q-1) / 2^64) (integer-exact spec; see module docstring)."""
    return modmath.mulhi_u64(u64s, ms.q - U64(1))


def gaussian(u32s: jax.Array, ms: modmath.ModulusSet) -> jax.Array:
    """(n,) u32 words -> (r, n) discrete-Gaussian residues; same draw for
    every modulus (gaussian_dist_xq reads in[i % n]).

    Pipeline (convert_gaussian, distributions.cuh:157-189): u32 -> f32,
    /2^32 (the literal 4294967295 rounds to 2^32 in f32), nudge away from
    exact 0/1 by FLT_EPSILON, inverse normal CDF, * 3.2, clamp +-19.2,
    truncate toward zero, negatives mapped to q + d.
    """
    d = u32s.astype(F32) * F32(2.0 ** -32)
    eps = F32(1.192092896e-07)
    d = jnp.where(d == 0, d + eps, d)
    d = jnp.where(d == 1, d - eps, d)
    z = jax.scipy.special.ndtri(d.astype(F32)).astype(F32)
    z = z * F32(3.2)
    z = jnp.clip(z, F32(-19.2), F32(19.2))
    dd = z.astype(jnp.int32)  # C-style truncation toward zero
    dd64 = dd.astype(jnp.int64)
    out = jnp.where(dd64 < 0, ms.q.astype(jnp.int64) + dd64,
                    jnp.broadcast_to(dd64, (ms.r,) + dd.shape))
    return out.astype(U64)


# ---------------------------------------------------------------------------
# Byte-consumption layouts of the two pipelines (offsets must match the
# reference exactly for reproducibility of keygen/encryption randomness).
# ---------------------------------------------------------------------------

def keygen_entropy_bytes(n: int, r: int) -> int:
    """generate_random_default size in keygen_rns (bfv_keygen.cuh:99):
    (1 + 8) * r * n + 4 * n bytes."""
    return 9 * r * n + 4 * n


def keygen_draws(n: int, r: int, ms: modmath.ModulusSet,
                 key_byte: int = salsa20.DEFAULT_KEY_BYTE, nonce=0):
    """Sample (s, a, e) for keygen with the reference's byte layout
    (bfv_keygen.cuh:120-122): ternary bytes at 0, uniform u64 lanes at
    byte offset n, gaussian u32 lanes at byte offset n + 8*r*n."""
    nbytes = keygen_entropy_bytes(n, r)
    bw = salsa20.keystream_block_words((nbytes + 63) // 64,
                                       key_byte=key_byte, nonce=nonce)
    s = ternary(salsa20.block_words_u8(bw, 0, n), ms)
    a = uniform(salsa20.block_words_u64(bw, n, r * n).reshape(r, n), ms)
    e = gaussian(salsa20.block_words_u32(bw, n + 8 * r * n, n), ms)
    return s, a, e


def encrypt_entropy_bytes(n: int) -> int:
    """generate_random_default size in encryption_rns
    (bfv_encryption.cuh:228): n + 2 * 4 * n bytes."""
    return 9 * n


def encrypt_draws(n: int, r: int, ms: modmath.ModulusSet,
                  key_byte: int = salsa20.DEFAULT_KEY_BYTE, nonce=0):
    """Sample (u, e0, e1) for encryption (convert_ternary_gaussian_x2,
    bfv_encryption.cuh:17-109): ternary bytes at 0, e0 u32 lanes at byte
    offset n, e1 u32 lanes at byte offset 5n."""
    nbytes = encrypt_entropy_bytes(n)
    bw = salsa20.keystream_block_words((nbytes + 63) // 64,
                                       key_byte=key_byte, nonce=nonce)
    u = ternary(salsa20.block_words_u8(bw, 0, n), ms)
    e0 = gaussian(salsa20.block_words_u32(bw, n, n), ms)
    e1 = gaussian(salsa20.block_words_u32(bw, 5 * n, n), ms)
    return u, e0, e1
