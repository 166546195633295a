"""Fused encrypt/decrypt tail kernels vs the ops/poly.py XLA chains.

Both kernels must be bit-identical to the unfused reference semantics
(including the strict-`>` add quirks) — the BFV golden-vector tests then
cover them end-to-end through the pallas-interpret backend.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ntt_cuda_tpu.ops import bfv_tail, modmath, poly
from ntt_cuda_tpu.params import get_bfv_params


@pytest.fixture(scope="module")
def p4k():
    return get_bfv_params("4k_3q")


def _rand_res(rng, qs, n):
    return jnp.asarray(np.stack(
        [rng.integers(0, q, n, dtype=np.uint64) for q in qs]))


def test_encrypt_tail_bitexact(p4k, rng):
    p = p4k
    n, r = p.n, p.r
    ms_full = modmath.modulus_set(p)
    ms_drop = modmath.modulus_set(p, r - 1)
    ms_last = modmath.ModulusSet.from_moduli([p.q[-1]])
    dr = poly.DivideRoundConsts.build(p)
    mc = poly.MessageConsts.build(p)
    tc = bfv_tail.TailConsts.build(p)
    c = jnp.stack([_rand_res(rng, p.q, n), _rand_res(rng, p.q, n)])
    e = jnp.stack([_rand_res(rng, p.q, n), _rand_res(rng, p.q, n)])
    m = jnp.asarray(rng.integers(0, p.t, n, dtype=np.uint64))

    ref = poly.poly_add(c, e, ms_full)
    ref = poly.divide_and_round_q_last(ref, dr, ms_drop, ms_last)
    ref = jnp.stack([poly.add_message(ref[0], m, mc), ref[1]])
    got = bfv_tail.encrypt_tail(c, e, m, tc, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_decrypt_tail_bitexact(p4k, rng):
    p = p4k
    n, rk = p.n, p.r - 1
    ms = modmath.modulus_set(p, rk)
    dc = poly.DecryptConsts.build(p)
    dt = bfv_tail.DecTailConsts.build(p)
    x = _rand_res(rng, p.q[:rk], n)
    c0 = _rand_res(rng, p.q[:rk], n)

    ref = poly.poly_add(x, c0, ms)
    ref = poly.poly_mul_scalar_mont(ref, dc.prod_t_gamma_mont, ms)
    ref = poly.poly_mul_scalar_mont(ref, dc.inv_punctured_mont, ms)
    ref = np.asarray(poly.fast_convert_and_round(ref, dc))
    got = np.asarray(bfv_tail.decrypt_tail(x, c0, dt, interpret=True))
    np.testing.assert_array_equal(got, ref)
