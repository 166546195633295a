"""The ablation-ladder designs (benchmarks/designs.py) stay bit-exact.

Each historical rung must equal the shipped kernel's outputs — the
ladder is only meaningful if every design computes the same transform.
"""

import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "benchmarks"))

import designs  # noqa: E402
from ntt_cuda_tpu.ops import ntt_pallas  # noqa: E402
from ntt_cuda_tpu.params import get_bfv_params  # noqa: E402


@pytest.mark.parametrize("design", ["RI", "CG", "RS"])
@pytest.mark.slow
def test_design_bitexact(rng, design):
    p = get_bfv_params("4k_3q")
    ftab = ntt_pallas.tables_for(p)
    tab = designs.compact_tables(p.q, p.psi, p.n,
                                 unscale_tci=design in ("RI", "CG"))
    x = jnp.asarray(np.stack(
        [rng.integers(0, p.q[i], p.n, dtype=np.uint64)
         for i in range(p.r)]))
    ref_f = np.asarray(ntt_pallas.ntt_forward(x, ftab, interpret=True))
    got_f = np.asarray(designs.transform(x, tab, design, inverse=False,
                                         interpret=True))
    np.testing.assert_array_equal(got_f, ref_f)
    ref_i = np.asarray(ntt_pallas.ntt_inverse(jnp.asarray(ref_f), ftab,
                                              interpret=True))
    got_i = np.asarray(designs.transform(jnp.asarray(ref_f), tab, design,
                                         inverse=True, interpret=True))
    np.testing.assert_array_equal(got_i, ref_i)
    np.testing.assert_array_equal(got_i, np.asarray(x))
