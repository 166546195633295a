"""compact_a=True (un-expanded stage-A twiddle tables, expanded per stage
in-kernel) must be bit-identical to the default expanded layout on every
kernel and through the whole fused BFV pipeline (interpret mode on CPU).

The compact layout exists to shrink per-modulus table residency 8x for
the whole-op fused kernels at n=2^15 (ntt_pallas._stage_rows); these
tests guard the "bit-identical outputs" contract stated there."""

import numpy as np
import jax.numpy as jnp
import pytest

from ntt_cuda_tpu.models import bfv
from ntt_cuda_tpu.ops import ntt_pallas
from ntt_cuda_tpu.params import get_bfv_params, get_params


def _tabs(n):
    q, psi, _, _, _ = get_params(n)
    exp = ntt_pallas.FourStepTables.build([q], [psi], n)
    cmp_ = ntt_pallas.FourStepTables.build([q], [psi], n, compact_a=True)
    return q, exp, cmp_


@pytest.mark.parametrize("n", [2048, 4096])
def test_kernels_compact_vs_expanded(rng, n):
    q, exp, cmp_ = _tabs(n)
    x = jnp.asarray(rng.integers(0, q, n, dtype=np.uint64)[None, :])
    y = jnp.asarray(rng.integers(0, q, n, dtype=np.uint64)[None, :])
    for fn in (ntt_pallas.ntt_forward, ntt_pallas.ntt_inverse):
        np.testing.assert_array_equal(
            np.asarray(fn(x, cmp_, interpret=True)),
            np.asarray(fn(x, exp, interpret=True)))
    np.testing.assert_array_equal(
        np.asarray(ntt_pallas.ntt_inverse_mul(x, y, cmp_, interpret=True)),
        np.asarray(ntt_pallas.ntt_inverse_mul(x, y, exp, interpret=True)))
    np.testing.assert_array_equal(
        np.asarray(ntt_pallas.ntt_forward_addneg(x, y, cmp_, interpret=True)),
        np.asarray(ntt_pallas.ntt_forward_addneg(x, y, exp, interpret=True)))


def test_compact_rejected_below_n1_4():
    # at n1 < 4 compact and expanded planes are shape-ambiguous and the
    # kernels' shape dispatch would silently mis-slice (ADVICE r4);
    # the guard fires on n alone, before any table math
    with pytest.raises(ValueError, match="compact_a"):
        ntt_pallas.FourStepTables.build([12289], [3], 256, compact_a=True)


def test_fused_pipeline_compact_vs_expanded(rng):
    """Whole fused-op pipeline (keygen_fused / encrypt_fused /
    half_polymul+decrypt tail) through BFVContext, compact vs default."""
    p = get_bfv_params("4k_3q")
    ctx = bfv.BFVContext.build(p, backend="pallas-interpret", fusion="op")
    ctx_c = bfv.BFVContext.build(p, backend="pallas-interpret", fusion="op",
                                 compact_a=True)
    assert ctx_c.ftab_full.ta.shape != ctx.ftab_full.ta.shape
    m = rng.integers(0, p.t, p.n, dtype=np.uint64)
    sk, pk = ctx.keygen(nonce=7)
    sk_c, pk_c = ctx_c.keygen(nonce=7)
    np.testing.assert_array_equal(np.asarray(sk_c), np.asarray(sk))
    np.testing.assert_array_equal(np.asarray(pk_c), np.asarray(pk))
    ct = ctx.encrypt(pk, m, nonce=3)
    ct_c = ctx_c.encrypt(pk_c, m, nonce=3)
    np.testing.assert_array_equal(np.asarray(ct_c), np.asarray(ct))
    np.testing.assert_array_equal(
        np.asarray(ctx_c.decrypt(sk_c, ct_c)), m % p.t)
