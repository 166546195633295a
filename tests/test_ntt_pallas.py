"""Fused four-step Pallas NTT vs the XLA/golden path (interpret mode on CPU).

The Pallas kernel must be bit-exact equal to ops/ntt (which is itself
bit-exact vs the reference's golden vectors)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ntt_cuda_tpu.ops import modmath, ntt, ntt_pallas
from ntt_cuda_tpu.params import get_bfv_params, get_params


@pytest.mark.parametrize("n", [2048, 4096])
def test_fwd_inv_single_modulus(rng, n):
    q, psi, _, _, _ = get_params(n)
    tables = ntt.NTTTables.build([q], [psi], n)
    ms = modmath.ModulusSet.from_moduli([q])
    ftab = ntt_pallas.FourStepTables.build([q], [psi], n)
    x = rng.integers(0, q, n, dtype=np.uint64)[None, :]
    ref_f = np.asarray(ntt.ntt_forward_jit(jnp.asarray(x), tables, ms))
    got_f = np.asarray(ntt_pallas.ntt_forward(jnp.asarray(x), ftab, interpret=True))
    np.testing.assert_array_equal(got_f, ref_f)
    ref_i = np.asarray(ntt.ntt_inverse_jit(jnp.asarray(x), tables, ms))
    got_i = np.asarray(ntt_pallas.ntt_inverse(jnp.asarray(x), ftab, interpret=True))
    np.testing.assert_array_equal(got_i, ref_i)


def test_rns_batch_and_ciphertext_shapes(rng):
    p = get_bfv_params("4k_3q")
    n, r = p.n, p.r
    tables = ntt.tables_for(p)
    ms = modmath.modulus_set(p)
    ftab = ntt_pallas.tables_for(p)
    x = np.stack([
        np.stack([rng.integers(0, p.q[i], n, dtype=np.uint64) for i in range(r)])
        for _ in range(2)])  # (2, r, n): both ciphertext halves
    ref = np.asarray(ntt.ntt_forward_jit(jnp.asarray(x), tables, ms))
    got = np.asarray(ntt_pallas.ntt_forward(jnp.asarray(x), ftab, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_30bit_family_pallas(rng):
    """Legacy 30-bit modulus family (old/ntt_30bit.cuh) through the fused
    Pallas kernel: same limb pipeline, q < 2^31."""
    n = 2048
    q, psi, _, _, _ = get_params(n, family="30bit")
    tables = ntt.NTTTables.build([q], [psi], n)
    ms = modmath.ModulusSet.from_moduli([q])
    ftab = ntt_pallas.FourStepTables.build([q], [psi], n)
    x = rng.integers(0, q, n, dtype=np.uint64)[None, :]
    ref_f = np.asarray(ntt.ntt_forward_jit(jnp.asarray(x), tables, ms))
    got_f = np.asarray(ntt_pallas.ntt_forward(jnp.asarray(x), ftab, interpret=True))
    np.testing.assert_array_equal(got_f, ref_f)
    y = rng.integers(0, q, n, dtype=np.uint64)[None, :]
    ref_im = np.asarray(ntt.ntt_inverse_jit(
        ntt.dyadic_mul(jnp.asarray(x), jnp.asarray(y), ms), tables, ms))
    got_im = np.asarray(ntt_pallas.ntt_inverse_mul(
        jnp.asarray(x), jnp.asarray(y), ftab, interpret=True))
    np.testing.assert_array_equal(got_im, ref_im)


def test_rejects_moduli_beyond_61_bits():
    """The loose-mulhi Shoup domain needs 8q < 2^64; table construction
    must refuse larger moduli instead of silently wrapping."""
    import pytest as _pytest
    from ntt_cuda_tpu.utils import primegen
    q = primegen.generate_moduli(2048, 62, 1)[0]
    psi = primegen.find_primitive_2n_root(q, 2048)
    with _pytest.raises(ValueError, match="2\\^61"):
        ntt_pallas.FourStepTables.build([q], [psi], 2048)
