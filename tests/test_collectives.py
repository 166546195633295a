"""Communication-structure assertions on the compiled HLO.

The SPMD designs claim: one psum in encrypt, one (stacked) psum in
decrypt, zero collectives in 1-D keygen, and exactly log2(C) ppermutes
per cross-shard transform.  Bit-exactness tests cannot catch GSPMD or
shard_map silently inserting extra all-gathers/reshards (they would be
correct but slow at scale) — so these tests compile the pipelines on the
virtual mesh and count the collective ops in the HLO itself.
"""

import re

import jax
import pytest

from ntt_cuda_tpu.parallel import mesh as mesh_mod, spmd, spmd2d
from ntt_cuda_tpu.utils import primegen

requires_8dev = pytest.mark.skipif(len(jax.devices()) < 8,
                                   reason="needs 8 devices")

COLLECTIVES = ("all-reduce", "all-gather", "all-to-all",
               "collective-permute", "reduce-scatter")


def _collective_counts(lowered):
    txt = lowered.compile().as_text()
    counts = {k: 0 for k in COLLECTIVES}
    # match op instructions ("= <shape> all-reduce(" or async "-start(");
    # "-done(" closers are skipped so async pairs count once
    pat = re.compile(r"=\s+\S+\s+(" + "|".join(COLLECTIVES) +
                     r")(?:-start)?\(")
    for m in pat.finditer(txt):
        counts[m.group(1)] += 1
    return counts


@pytest.fixture(scope="module")
def spmd_ctx():
    p = primegen.make_bfv_params(1024, 55, 8)
    return p, spmd.SpmdBFVContext.build(p)


@pytest.fixture(scope="module")
def spmd2d_ctx():
    p = primegen.make_bfv_params(1024, 55, 4)
    mesh = mesh_mod.make_mesh(rns=2, coef=4)
    return p, spmd2d.Spmd2DBFVContext.build(p, mesh)


@requires_8dev
@pytest.mark.slow
def test_spmd_keygen_has_zero_collectives(spmd_ctx):
    _, sctx = spmd_ctx
    counts = _collective_counts(sctx.lowered_keygen())
    assert counts == {k: 0 for k in COLLECTIVES}, counts


@requires_8dev
@pytest.mark.slow
def test_spmd_encrypt_has_exactly_one_psum(spmd_ctx):
    import jax.numpy as jnp
    p, sctx = spmd_ctx
    pk = jnp.zeros((2, p.r, p.n), jnp.uint64)
    m = jnp.zeros((p.n,), jnp.uint64)
    counts = _collective_counts(sctx.lowered_encrypt(pk, m))
    expect = {k: 0 for k in COLLECTIVES}
    expect["all-reduce"] = 1           # the adjusted-last-residue psum
    assert counts == expect, counts


@requires_8dev
def test_spmd_decrypt_has_exactly_one_psum(spmd_ctx):
    import jax.numpy as jnp
    p, sctx = spmd_ctx
    sk = jnp.zeros((p.r, p.n), jnp.uint64)
    ct = jnp.zeros((2, p.r, p.n), jnp.uint64)
    counts = _collective_counts(sctx.lowered_decrypt(sk, ct))
    expect = {k: 0 for k in COLLECTIVES}
    expect["all-reduce"] = 1           # the stacked BEHZ-partials psum
    assert counts == expect, counts


@requires_8dev
@pytest.mark.slow
def test_spmd2d_collective_budget(spmd2d_ctx):
    """(rns=2, coef=4) mesh: each cross-shard transform costs exactly
    log2(C)=2 collective-permutes; keygen runs 3 transforms (6 permutes,
    no psum), encrypt/decrypt 2 transforms + one psum each.  No
    all-gathers, no all-to-alls, no reduce-scatters anywhere."""
    import jax.numpy as jnp
    p, sctx = spmd2d_ctx
    pk = jnp.zeros((2, p.r, p.n), jnp.uint64)
    m = jnp.zeros((p.n,), jnp.uint64)
    sk = jnp.zeros((p.r, p.n), jnp.uint64)
    ct = jnp.zeros((2, p.r, p.n), jnp.uint64)

    kg = _collective_counts(sctx.lowered_keygen())
    assert kg["all-reduce"] == 0 and kg["collective-permute"] == 6, kg
    enc = _collective_counts(sctx.lowered_encrypt(pk, m))
    assert enc["all-reduce"] == 1 and enc["collective-permute"] == 4, enc
    dec = _collective_counts(sctx.lowered_decrypt(sk, ct))
    assert dec["all-reduce"] == 1 and dec["collective-permute"] == 4, dec
    for c in (kg, enc, dec):
        assert c["all-gather"] == 0 and c["all-to-all"] == 0 \
            and c["reduce-scatter"] == 0, c
