"""Compact-draw stage kernels (round 5): ntt_forward_ternary,
ntt_forward_addneg_gauss, and bfv_tail.encrypt_fused's compact-e path
must be bit-identical to expanded-residue pipelines (interpret mode).

These are the kernels behind the stage schedule's keygen/encrypt since
the (r, n) u64 draw tensors stopped being materialized; the golden
anchor for the whole path is tests/test_bfv.py (stage contexts) and
test_fused_ops.test_context_op_vs_stage_fusion."""

import numpy as np
import jax.numpy as jnp
import pytest

from ntt_cuda_tpu.ops import bfv_tail, modmath, ntt, ntt_pallas, sampling
from ntt_cuda_tpu.params import get_bfv_params

U64 = jnp.uint64


@pytest.fixture(scope="module")
def setup():
    p = get_bfv_params("4k_3q")
    ms = modmath.modulus_set(p)
    ftab = ntt_pallas.tables_for(p)
    tables = ntt.tables_for(p)
    return p, ms, ftab, tables


def test_forward_ternary_bitexact(rng, setup):
    p, ms, ftab, tables = setup
    u_b = jnp.asarray(rng.integers(-1, 3, p.n, dtype=np.int64)
                      .astype(np.int32))
    exp_res = sampling._residues(u_b, ms)          # (r, n) u64
    ref = ntt.ntt_forward_jit(exp_res, tables, ms)
    got = ntt_pallas.ntt_forward_ternary(u_b, ftab, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # batched form
    u2 = jnp.stack([u_b, -u_b])
    got2 = ntt_pallas.ntt_forward_ternary(u2, ftab, interpret=True)
    assert got2.shape == (2, p.r, p.n)
    np.testing.assert_array_equal(np.asarray(got2[0]), np.asarray(ref))


def test_forward_addneg_gauss_bitexact(rng, setup):
    p, ms, ftab, tables = setup
    x = jnp.asarray(np.stack([
        rng.integers(0, p.q[i], p.n, dtype=np.uint64)
        for i in range(p.r)]))
    e_d = jnp.asarray(rng.integers(-19, 17, p.n, dtype=np.int64)
                      .astype(np.int32))
    e_res = sampling._residues(e_d, ms)
    ref = ntt_pallas.ntt_forward_addneg(x, e_res, ftab, interpret=True)
    got = ntt_pallas.ntt_forward_addneg_gauss(x, e_d, ftab, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_encrypt_fused_compact_e_bitexact(rng, setup):
    p, ms, ftab, tables = setup
    tc = bfv_tail.TailConsts.build(p)
    u_ntt = jnp.asarray(np.stack([
        rng.integers(0, p.q[i], p.n, dtype=np.uint64)
        for i in range(p.r)]))
    pk = jnp.asarray(np.stack([np.stack([
        rng.integers(0, p.q[i], p.n, dtype=np.uint64)
        for i in range(p.r)]) for _ in range(2)]))
    m = jnp.asarray(rng.integers(0, p.t, p.n, dtype=np.uint64))
    e_d = jnp.asarray(rng.integers(-19, 17, (2, p.n), dtype=np.int64)
                      .astype(np.int32))
    e_res = sampling._residues(e_d, ms)            # (2, r, n)
    ref = bfv_tail.encrypt_fused(u_ntt, pk, e_res, m, ftab, tc,
                                 interpret=True)
    got = bfv_tail.encrypt_fused(u_ntt, pk, e_d, m, ftab, tc,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
