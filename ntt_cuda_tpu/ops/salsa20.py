"""Salsa20/20 keystream generator in u32 TPU lanes.

TPU-native redesign of the reference's CSPRNG (VecCrypt kernel,
distributions.cuh:48-155): one keystream block per SIMT thread there, one
block per vector lane here — the 20-round core is pure 32-bit add/xor/rotl,
ideal for the VPU.  Byte-exact against the reference (validated against the
ECRYPT published vectors and the integer golden model): fixed key
(32 bytes of 0x01 for `generate_random_default`, distributions.cuh:261),
zero nonce, sigma = "expand 32-byte k", 64-bit little-endian block counter
in state words 8/9.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32
U64 = jnp.uint64

SIGMA_WORDS = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)  # "expand 32-byte k"
DEFAULT_KEY_BYTE = 0x01  # generate_random_default (distributions.cuh:261)
STREAM_KEY_BYTE = 0x4D   # generate_random (distributions.cuh:232, memset 77)


def _key_words(key_byte: int) -> tuple[int, ...]:
    w = key_byte | (key_byte << 8) | (key_byte << 16) | (key_byte << 24)
    return (w,) * 8


def _rotl(x, c: int):
    return (x << U32(c)) | (x >> U32(32 - c))


def _double_round(x):
    # column round then row round (distributions.cuh:83-115)
    for a, b, c, d in ((0, 4, 8, 12), (5, 9, 13, 1), (10, 14, 2, 6), (15, 3, 7, 11),
                       (0, 1, 2, 3), (5, 6, 7, 4), (10, 11, 8, 9), (15, 12, 13, 14)):
        x[b] = x[b] ^ _rotl(x[a] + x[d], 7)
        x[c] = x[c] ^ _rotl(x[b] + x[a], 9)
        x[d] = x[d] ^ _rotl(x[c] + x[b], 13)
        x[a] = x[a] ^ _rotl(x[d] + x[c], 18)


def keystream_block_words(nblocks: int, key_byte: int = DEFAULT_KEY_BYTE,
                          nonce=0, rounds: int = 20, counter0=0,
                          impl: str | None = None) -> jax.Array:
    """Keystream in block-position layout: (16, nblocks) u32 — see
    _keystream_xla for the layout contract.

    impl: "pallas" (fused VMEM kernel — the default on TPU; XLA splits
    the 960-op round chain into many fusions whose boundaries stream the
    whole state through HBM, measured 139 us vs ~25 us for 43k blocks),
    "pallas-interpret", or "xla" (the default elsewhere).  All
    implementations are bit-identical (tests/test_sampling.py)."""
    if impl is None:
        import jax as _jax
        impl = "pallas" if _jax.default_backend() == "tpu" else "xla"
    nonce = jnp.asarray(nonce, U64)        # python ints >= 2^63 would
    counter0 = jnp.asarray(counter0, U64)  # overflow jit's i64 parsing
    if impl == "xla":
        return _keystream_xla(nblocks, key_byte=key_byte, nonce=nonce,
                              rounds=rounds, counter0=counter0)
    return _keystream_pallas(nblocks, key_byte=key_byte, nonce=nonce,
                             rounds=rounds, counter0=counter0,
                             interpret=(impl == "pallas-interpret"))


@functools.partial(jax.jit, static_argnames=("nblocks", "key_byte", "rounds"))
def _keystream_xla(nblocks: int, key_byte: int = DEFAULT_KEY_BYTE,
                   nonce=0, rounds: int = 20,
                   counter0=0) -> jax.Array:
    """Keystream in block-position layout: (16, nblocks) u32, row p =
    word p of every 64-byte block.  This is the generator's natural
    (compute) layout; stream word w lives at [w % 16, w // 16].  Consumers
    slice rows and transpose once, instead of materializing the canonical
    interleave-16 stream and de-interleaving it again (the latter costs
    ~900 us of pure relayout at keygen sizes on v5e).

    `nonce` may be a Python int or a traced u64 scalar (state words 6/7);
    the reference always uses 0, but a per-message nonce is how a caller
    gets fresh encryption randomness under the fixed key.  `counter0`
    (int or traced u64) offsets the block counter: counter mode means a
    shard can generate exactly its slice of the stream — block b here
    equals block counter0 + b of the full stream."""
    ctr = jnp.arange(nblocks, dtype=U64) + jnp.asarray(counter0, U64)
    kw = _key_words(key_byte)
    nonce = jnp.asarray(nonce, U64)
    j = [
        jnp.full((nblocks,), SIGMA_WORDS[0], U32),
        jnp.full((nblocks,), kw[0], U32), jnp.full((nblocks,), kw[1], U32),
        jnp.full((nblocks,), kw[2], U32), jnp.full((nblocks,), kw[3], U32),
        jnp.full((nblocks,), SIGMA_WORDS[1], U32),
        jnp.broadcast_to((nonce & U64(0xFFFFFFFF)).astype(U32), (nblocks,)),
        jnp.broadcast_to((nonce >> U64(32)).astype(U32), (nblocks,)),
        (ctr & U64(0xFFFFFFFF)).astype(U32),
        (ctr >> U64(32)).astype(U32),
        jnp.full((nblocks,), SIGMA_WORDS[2], U32),
        jnp.full((nblocks,), kw[4], U32), jnp.full((nblocks,), kw[5], U32),
        jnp.full((nblocks,), kw[6], U32), jnp.full((nblocks,), kw[7], U32),
        jnp.full((nblocks,), SIGMA_WORDS[3], U32),
    ]
    x = list(j)
    for _ in range(rounds // 2):
        _double_round(x)
    return jnp.stack([x[i] + j[i] for i in range(16)], axis=0)


# ---------------------------------------------------------------------------
# Pallas keystream generator: all 16 state planes live in VMEM/vregs for
# the whole 20-round chain; HBM sees only the one output write.
# ---------------------------------------------------------------------------

_CHUNK = 1024          # blocks per grid step, laid out (8, 128)


def _salsa_chunk(rounds: int, key_byte: int, nonce_lo, nonce_hi,
                 ctr0_lo, ctr0_hi, g):
    """One (8, 128)-lane chunk of keystream: 16 output planes for blocks
    [g*_CHUNK, (g+1)*_CHUNK) of the (nonce, counter0) stream."""
    kw = _key_words(key_byte)
    idx = (jax.lax.broadcasted_iota(U32, (8, 128), 0) * U32(128)
           + jax.lax.broadcasted_iota(U32, (8, 128), 1)
           + U32(g * _CHUNK))
    c_lo = ctr0_lo + idx
    carry = (c_lo < idx).astype(U32)
    c_hi = ctr0_hi + carry
    full = lambda v: jnp.full((8, 128), v, U32)
    j = [
        full(SIGMA_WORDS[0]),
        full(kw[0]), full(kw[1]), full(kw[2]), full(kw[3]),
        full(SIGMA_WORDS[1]),
        jnp.broadcast_to(nonce_lo, (8, 128)),
        jnp.broadcast_to(nonce_hi, (8, 128)),
        c_lo, c_hi,
        full(SIGMA_WORDS[2]),
        full(kw[4]), full(kw[5]), full(kw[6]), full(kw[7]),
        full(SIGMA_WORDS[3]),
    ]
    x = list(j)
    for _ in range(rounds // 2):
        _double_round(x)
    return [x[p] + j[p] for p in range(16)]


def _make_salsa_kernel(rounds: int, key_byte: int, with_u64: bool = False):
    def kernel(sc_ref, out_ref, *u64_refs):
        # sc_ref (SMEM): [nonce_lo, nonce_hi, counter0_lo, counter0_hi]
        planes = _salsa_chunk(rounds, key_byte, sc_ref[0], sc_ref[1],
                              sc_ref[2], sc_ref[3], pl.program_id(0))
        for p in range(16):
            out_ref[p, 0] = planes[p]
        if with_u64:
            # u64-lane limb planes: lane j of a block = words 2j | 2j+1
            # << 32.  The pairing is free here (all 16 word planes are
            # registers); doing it post-hoc from the (16, nb) layout is
            # a (nb, 8, 2) minor de-interleave XLA:TPU compiles to ~75
            # us of relayout at keygen spans (round-5 profile).
            lo_ref, hi_ref = u64_refs
            for j in range(8):
                lo_ref[j, 0] = planes[2 * j]
                hi_ref[j, 0] = planes[2 * j + 1]
    return kernel


@functools.partial(jax.jit, static_argnames=("nblocks", "key_byte",
                                             "rounds", "interpret",
                                             "with_u64"))
def _keystream_pallas(nblocks: int, key_byte: int = DEFAULT_KEY_BYTE,
                      nonce=0, rounds: int = 20, counter0=0,
                      interpret: bool = False, with_u64: bool = False):
    G = -(-nblocks // _CHUNK)
    nonce = jnp.asarray(nonce, U64)
    counter0 = jnp.asarray(counter0, U64)
    sc = jnp.stack([
        (nonce & U64(0xFFFFFFFF)).astype(U32),
        (nonce >> U64(32)).astype(U32),
        (counter0 & U64(0xFFFFFFFF)).astype(U32),
        (counter0 >> U64(32)).astype(U32),
    ])
    z = np.int32(0)
    out_specs = [pl.BlockSpec((16, 1, 8, 128),
                              lambda g, sc_: (z, g, z, z),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((16, G, 8, 128), jnp.uint32)]
    if with_u64:
        out_specs += [pl.BlockSpec((8, 1, 8, 128),
                                   lambda g, sc_: (z, g, z, z),
                                   memory_space=pltpu.VMEM)] * 2
        out_shape += [jax.ShapeDtypeStruct((8, G, 8, 128), jnp.uint32)] * 2
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    outs = pl.pallas_call(
        _make_salsa_kernel(rounds, key_byte, with_u64=with_u64),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[],
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        interpret=interpret,
        **kwargs,
    )(sc)
    if interpret:
        outs = jax.lax.optimization_barrier(tuple(outs))
    bw = outs[0].reshape(16, G * _CHUNK)[:, :nblocks]
    if not with_u64:
        return bw
    lo8 = outs[1].reshape(8, G * _CHUNK)[:, :nblocks]
    hi8 = outs[2].reshape(8, G * _CHUNK)[:, :nblocks]
    return bw, lo8, hi8


def keystream_block_words_batch(nblocks: int, nonces: jax.Array,
                                key_byte: int = DEFAULT_KEY_BYTE,
                                rounds: int = 20, counter0=0,
                                impl: str | None = None) -> jax.Array:
    """(J,) nonces -> (J, 16, nblocks) keystream planes, ONE kernel.

    The batched-encryption draw path: counter-mode streams are per-nonce,
    so J messages need J streams — but one pallas_call with a (J, G) grid
    (nonce row in scalar prefetch) instead of J dispatches.  Each row is
    bit-identical to keystream_block_words(nblocks, nonce=nonces[j])."""
    nonces = jnp.asarray(nonces, U64)
    counter0 = jnp.asarray(counter0, U64)
    if impl is None:
        import jax as _jax
        impl = "pallas" if _jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return jax.vmap(
            lambda nn: _keystream_xla(nblocks, key_byte=key_byte, nonce=nn,
                                      rounds=rounds, counter0=counter0)
        )(nonces)
    return _keystream_pallas_batch(nblocks, nonces, key_byte=key_byte,
                                   rounds=rounds, counter0=counter0,
                                   interpret=(impl == "pallas-interpret"))


@functools.partial(jax.jit, static_argnames=("nblocks", "key_byte",
                                             "rounds", "interpret"))
def _keystream_pallas_batch(nblocks: int, nonces: jax.Array,
                            key_byte: int = DEFAULT_KEY_BYTE,
                            rounds: int = 20, counter0=0,
                            interpret: bool = False) -> jax.Array:
    (J,) = nonces.shape
    G = -(-nblocks // _CHUNK)
    counter0 = jnp.asarray(counter0, U64)
    # sc rows: [nonce_lo, nonce_hi, counter0_lo, counter0_hi] per message
    sc = jnp.stack([
        (nonces & U64(0xFFFFFFFF)).astype(U32),
        (nonces >> U64(32)).astype(U32),
        jnp.broadcast_to((counter0 & U64(0xFFFFFFFF)).astype(U32), (J,)),
        jnp.broadcast_to((counter0 >> U64(32)).astype(U32), (J,)),
    ], axis=1)
    def kernel(sc_ref, out_ref):
        j = pl.program_id(0)
        planes = _salsa_chunk(rounds, key_byte, sc_ref[j, 0], sc_ref[j, 1],
                              sc_ref[j, 2], sc_ref[j, 3], pl.program_id(1))
        for p in range(16):
            out_ref[0, p, 0] = planes[p]

    z = np.int32(0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(J, G),
        in_specs=[],
        out_specs=[pl.BlockSpec((1, 16, 1, 8, 128),
                                lambda j, g, sc_: (j, z, g, z, z),
                                memory_space=pltpu.VMEM)],
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((J, 16, G, 8, 128), jnp.uint32)],
        interpret=interpret,
        **kwargs,
    )(sc)[0]
    if interpret:
        out = jax.lax.optimization_barrier(out)
    return out.reshape(J, 16, G * _CHUNK)[:, :, :nblocks]


def keystream_words(nblocks: int, key_byte: int = DEFAULT_KEY_BYTE,
                    nonce=0, rounds: int = 20) -> jax.Array:
    """Keystream as a flat u32 array of length nblocks*16, little-endian
    word order (byte k of the stream = byte k%4 of word k//4)."""
    bw = keystream_block_words(nblocks, key_byte=key_byte, nonce=nonce,
                               rounds=rounds)
    return bw.T.reshape(nblocks * 16)


def _tiled_T(sub: jax.Array) -> jax.Array:
    """(16, nb) -> (nb, 16) block-major words.  When nb is a multiple of
    128, express the transpose as a (16, G, 128) -> (G, 128, 16) axis
    permutation — XLA:TPU compiles that ~60x faster than the plain 2-D
    transpose (60 us -> 1 us for keygen's 36864-block span at n=2^15)."""
    nb = sub.shape[1]
    if nb % 128 == 0:
        G = nb // 128
        return sub.reshape(16, G, 128).transpose(1, 2, 0).reshape(nb, 16)
    return sub.T


def block_words_u32(bw: jax.Array, start: int, count: int) -> jax.Array:
    """`count` canonical-order stream words from byte offset `start`
    (start must be 64-byte block aligned)."""
    assert start % 64 == 0
    blk0 = start // 64
    nb = -(-count // 16)
    w = jax.lax.slice_in_dim(bw, blk0, blk0 + nb, axis=1)
    return _tiled_T(w).reshape(nb * 16)[:count]


def block_words_u8(bw: jax.Array, start: int, count: int) -> jax.Array:
    """`count` keystream bytes from block-aligned byte offset `start`."""
    w = block_words_u32(bw, start, -(-count // 4))
    b = jnp.stack([(w >> U32(8 * k)) & U32(0xFF) for k in range(4)], axis=1)
    return b.reshape(-1)[:count]


def block_words_u32_batch(bw: jax.Array, start: int, count: int) -> jax.Array:
    """Batched block_words_u32: (J, 16, nb_total) -> (J, count) canonical
    stream words from block-aligned byte offset `start`, per message."""
    assert start % 64 == 0
    J = bw.shape[0]
    blk0 = start // 64
    nb = -(-count // 16)
    w = jax.lax.slice_in_dim(bw, blk0, blk0 + nb, axis=2)   # (J, 16, nb)
    if nb % 128 == 0:
        G = nb // 128
        t = w.reshape(J, 16, G, 128).transpose(0, 2, 3, 1)
    else:
        t = w.transpose(0, 2, 1)
    return t.reshape(J, nb * 16)[:, :count]


def block_words_u8_batch(bw: jax.Array, start: int, count: int) -> jax.Array:
    """Batched block_words_u8: (J, 16, nb_total) -> (J, count) bytes."""
    w = block_words_u32_batch(bw, start, -(-count // 4))
    b = jnp.stack([(w >> U32(8 * k)) & U32(0xFF) for k in range(4)], axis=2)
    return b.reshape(w.shape[0], -1)[:, :count]


def keystream_block_words64(nblocks: int, key_byte: int = DEFAULT_KEY_BYTE,
                            nonce=0, rounds: int = 20, counter0=0,
                            impl: str | None = None):
    """keystream_block_words plus PRE-PAIRED u64 limb planes:
    (bw (16, nblocks), lo8 (8, nblocks), hi8 (8, nblocks)) where u64
    lane j of block b = lo8[j, b] | hi8[j, b] << 32.

    The pallas kernel emits the pairs directly (the 16 word planes are
    registers there); consumers use block_words_u64_planes, whose
    minor-8 axis permutation costs ~0.5 us where the (nb, 8, 2)
    de-interleave behind block_words_u64 costs ~75 us at keygen spans
    (round-5 profile, scratch/kg_profile32k.py methodology).
    Bit-identical streams either way."""
    if impl is None:
        import jax as _jax
        impl = "pallas" if _jax.default_backend() == "tpu" else "xla"
    nonce = jnp.asarray(nonce, U64)
    counter0 = jnp.asarray(counter0, U64)
    if impl == "xla":
        bw = _keystream_xla(nblocks, key_byte=key_byte, nonce=nonce,
                            rounds=rounds, counter0=counter0)
        # off-TPU the stride-2 major slice is fine (and interpret-mode
        # pallas would be slower, not faster)
        return bw, bw[0::2, :], bw[1::2, :]
    return _keystream_pallas(nblocks, key_byte=key_byte, nonce=nonce,
                             rounds=rounds, counter0=counter0,
                             interpret=(impl == "pallas-interpret"),
                             with_u64=True)


def block_words_u64_planes(lo8: jax.Array, hi8: jax.Array, start: int,
                           count: int) -> jax.Array:
    """`count` little-endian u64 lanes from block-aligned byte offset
    `start`, from keystream_block_words64's pre-paired limb planes —
    the fast path replacing block_words_u64's minor de-interleave."""
    assert start % 64 == 0 and count % 8 == 0
    blk0 = start // 64
    nb = count // 8
    lo = jax.lax.slice_in_dim(lo8, blk0, blk0 + nb, axis=1)
    hi = jax.lax.slice_in_dim(hi8, blk0, blk0 + nb, axis=1)

    def flat(p):
        # target order: u64 lane k = b*8 + j from p[j, b]; with
        # b = g*128 + l the (8, G, 128) -> (G, 128, 8) permutation is
        # the same fast form as _tiled_T
        if nb % 128 == 0:
            G = nb // 128
            return p.reshape(8, G, 128).transpose(1, 2, 0).reshape(-1)
        return p.T.reshape(-1)

    return flat(lo).astype(U64) | (flat(hi).astype(U64) << U64(32))


def block_words_u64(bw: jax.Array, start: int, count: int) -> jax.Array:
    """`count` little-endian u64 lanes from block-aligned byte offset
    `start` (count a multiple of 8, whole blocks).  Pairs adjacent block
    positions on the cheap major axis — one transpose instead of an
    interleave-16 plus a stride-2 de-interleave."""
    assert start % 64 == 0 and count % 8 == 0
    blk0 = start // 64
    nb = count // 8
    sub = jax.lax.slice_in_dim(bw, blk0, blk0 + nb, axis=1)   # (16, nb)
    w = _tiled_T(sub).reshape(nb, 8, 2)                       # u32 first
    return (w[..., 0].astype(U64)
            | (w[..., 1].astype(U64) << U64(32))).reshape(count)


def keystream_for_bytes(nbytes: int, **kw) -> jax.Array:
    """Keystream covering ceil(nbytes/64) blocks, as flat u32 words."""
    return keystream_words((nbytes + 63) // 64, **kw)


# ---------------------------------------------------------------------------
# Lane extraction: the reference reads the same byte stream as u8 / u32le /
# u64le at different offsets (bfv_keygen.cuh:120-122, bfv_encryption.cuh:247).
# Offsets used by the pipelines are always 4-byte-aligned.
# ---------------------------------------------------------------------------

def bytes_u8(ks: jax.Array, start: int, count: int) -> jax.Array:
    """count bytes from byte offset `start` (start % 4 == 0, count % 4 == 0)."""
    assert start % 4 == 0 and count % 4 == 0
    w = jax.lax.slice_in_dim(ks, start // 4, start // 4 + count // 4)
    b = jnp.stack([(w >> U32(8 * k)) & U32(0xFF) for k in range(4)], axis=1)
    return b.reshape(count)


def bytes_u32(ks: jax.Array, start: int, count: int) -> jax.Array:
    assert start % 4 == 0
    return jax.lax.slice_in_dim(ks, start // 4, start // 4 + count)


def bytes_u64(ks: jax.Array, start: int, count: int) -> jax.Array:
    assert start % 8 == 0
    w = jax.lax.slice_in_dim(ks, start // 4, start // 4 + 2 * count).reshape(count, 2)
    return w[:, 0].astype(U64) | (w[:, 1].astype(U64) << U64(32))
