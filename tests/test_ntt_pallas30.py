"""Single-limb 30-bit-family kernels vs the XLA path (interpret on CPU).

The 30-bit family (parameter.h getParams30, old/ntt_30bit.cuh) runs u32
coefficients; outputs must be bit-exact equal to the 64-bit XLA lowering
on the same moduli, including the n = 65536 size the 60-bit family lacks.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ntt_cuda_tpu.ops import modmath, ntt, ntt_pallas30
from ntt_cuda_tpu.params import get_params


@pytest.mark.parametrize("n", [2048, 8192, 32768])
def test_30bit_fwd_inv_vs_xla(rng, n):
    q, psi, _, _, _ = get_params(n, family="30bit")
    tables = ntt.NTTTables.build([q], [psi], n)
    ms = modmath.ModulusSet.from_moduli([q])
    t30 = ntt_pallas30.FourStepTables30.build([q], [psi], n)
    x = rng.integers(0, q, (1, n), dtype=np.uint64)
    ref_f = np.asarray(ntt.ntt_forward_jit(jnp.asarray(x), tables, ms))
    got_f = np.asarray(ntt_pallas30.ntt_forward(jnp.asarray(x), t30,
                                                interpret=True))
    np.testing.assert_array_equal(got_f, ref_f)
    ref_i = np.asarray(ntt.ntt_inverse_jit(jnp.asarray(ref_f), tables, ms))
    got_i = np.asarray(ntt_pallas30.ntt_inverse(jnp.asarray(ref_f), t30,
                                                interpret=True))
    np.testing.assert_array_equal(got_i, ref_i)
    np.testing.assert_array_equal(got_i, x)


def test_30bit_n65536_roundtrip(rng):
    """The size only the 30-bit family publishes (parameter.h:129-136)."""
    n = 65536
    q, psi, _, _, _ = get_params(n, family="30bit")
    t30 = ntt_pallas30.FourStepTables30.build([q], [psi], n)
    x = rng.integers(0, q, (1, n), dtype=np.uint64)
    f = ntt_pallas30.ntt_forward(jnp.asarray(x), t30, interpret=True)
    b = np.asarray(ntt_pallas30.ntt_inverse(f, t30, interpret=True))
    np.testing.assert_array_equal(b, x)


def test_30bit_u32_io_and_batch(rng):
    n = 4096
    q, psi, _, _, _ = get_params(n, family="30bit")
    t30 = ntt_pallas30.FourStepTables30.build([q], [psi], n)
    x = rng.integers(0, q, (3, 1, n), dtype=np.uint64).astype(np.uint32)
    got = ntt_pallas30.ntt_forward(jnp.asarray(x), t30, interpret=True)
    assert got.dtype == jnp.uint32
    tables = ntt.NTTTables.build([q], [psi], n)
    ms = modmath.ModulusSet.from_moduli([q])
    ref = np.asarray(ntt.ntt_forward_jit(
        jnp.asarray(x.astype(np.uint64).reshape(3, n)[:, None, :]
                    .reshape(3, 1, n)), tables, ms))
    np.testing.assert_array_equal(np.asarray(got).astype(np.uint64), ref)
