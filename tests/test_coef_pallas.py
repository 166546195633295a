"""Coefficient-sharded Pallas NTT vs the single-chip transform.

The hybrid (ppermute cross stages + fused per-shard kernel) must be
bit-exact equal to ops/ntt for any shard count; the per-shard twiddle
sub-tree gather is the delicate part.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ntt_cuda_tpu.ops import modmath, ntt
from ntt_cuda_tpu.parallel import coef_pallas, mesh as mesh_mod
from ntt_cuda_tpu.params import get_bfv_params, get_params

requires_8dev = pytest.mark.skipif(len(jax.devices()) < 8,
                                   reason="needs 8 virtual devices")


@requires_8dev
@pytest.mark.parametrize("C", [2, 4])
def test_coef_pallas_roundtrip_bitexact(rng, C):
    n = 2048
    q, psi, _, _, _ = get_params(n)
    tables = ntt.NTTTables.build([q], [psi], n)
    ms = modmath.ModulusSet.from_moduli([q])
    m = mesh_mod.make_mesh(rns=1, coef=C)
    ctx = coef_pallas.CoefShardedNTT.build([q], [psi], n, m, interpret=True)

    x = rng.integers(0, q, n, dtype=np.uint64)[None, :]
    ref_f = np.asarray(ntt.ntt_forward_jit(jnp.asarray(x), tables, ms))
    xs = jax.device_put(jnp.asarray(x),
                        mesh_mod.residue_sharding(m, shard_coef=True))
    got_f = ctx.forward(xs)
    np.testing.assert_array_equal(np.asarray(got_f), ref_f)

    got_rt = np.asarray(ctx.inverse(got_f))
    np.testing.assert_array_equal(got_rt, x)


@requires_8dev
def test_coef_pallas_rns_batch(rng):
    """(r, n) residue tensor over a 2x4 ('rns','coef') mesh."""
    p = get_bfv_params("4k_3q")
    n = p.n
    qs, psis = p.q[:2], p.psi[:2]
    tables = ntt.NTTTables.build(qs, psis, n)
    ms = modmath.ModulusSet.from_moduli(qs)
    m = mesh_mod.make_mesh(rns=2, coef=4)
    ctx = coef_pallas.CoefShardedNTT.build(qs, psis, n, m, interpret=True)
    x = np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in qs])
    ref = np.asarray(ntt.ntt_forward_jit(jnp.asarray(x), tables, ms))
    xs = jax.device_put(jnp.asarray(x),
                        mesh_mod.residue_sharding(m, shard_coef=True))
    got = np.asarray(ctx.forward(xs))
    np.testing.assert_array_equal(got, ref)


@requires_8dev
def test_coef_pallas_inverse_mul(rng):
    """Fused dyadic + local INTT + cross stages == dyadic_mul + ntt_inverse."""
    n = 2048
    q, psi, _, _, _ = get_params(n)
    tables = ntt.NTTTables.build([q], [psi], n)
    ms = modmath.ModulusSet.from_moduli([q])
    m = mesh_mod.make_mesh(rns=1, coef=4)
    ctx = coef_pallas.CoefShardedNTT.build([q], [psi], n, m, interpret=True)
    x = rng.integers(0, q, n, dtype=np.uint64)[None, :]
    y = rng.integers(0, q, n, dtype=np.uint64)[None, :]
    ref = np.asarray(ntt.ntt_inverse_jit(
        ntt.dyadic_mul(jnp.asarray(x), jnp.asarray(y), ms), tables, ms))
    sh = mesh_mod.residue_sharding(m, shard_coef=True)
    got = np.asarray(ctx.inverse_mul(jax.device_put(jnp.asarray(x), sh),
                                     jax.device_put(jnp.asarray(y), sh)))
    np.testing.assert_array_equal(got, ref)
