"""Multi-host runtime setup (DCN dimension of the device mesh).

The reference is single-process/single-GPU; this is the new-design
distributed backend called for by SURVEY.md §2.2: the standard JAX
multi-controller runtime (`jax.distributed.initialize`) plus helpers to
lay a ('rns', 'coef') mesh over a multi-host slice so that the
latency-sensitive coefficient-axis butterfly exchanges ride ICI within a
host's chips while the embarrassingly-parallel RNS axis spans hosts over
DCN (only BEHZ's psum and the last-residue broadcast cross it).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Start the JAX multi-controller runtime.

    On TPU pods all arguments are auto-detected from the environment; on
    CPU/GPU clusters pass them explicitly.  Call exactly once per process
    before any other JAX API."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def pod_mesh(rns: int | None = None, coef: int | None = None) -> Mesh:
    """('rns', 'coef') mesh over every device of the (multi-host) runtime.

    Defaults put the coef axis within hosts (ICI for butterfly
    all-to-alls) and the rns axis across hosts (DCN only carries the
    modulus-axis collectives).  Device order: jax.devices() enumerates
    all processes' devices host-major, so reshaping to
    (hosts*local/coef, coef) keeps each coef group within one host when
    coef <= local device count."""
    devs = np.array(jax.devices())
    total = devs.size
    if coef is None:
        coef = min(jax.local_device_count(), total)
    if rns is None:
        rns = total // coef
    if rns * coef != total:
        raise ValueError(f"rns*coef = {rns}*{coef} != {total} devices")
    return Mesh(devs.reshape(rns, coef), ("rns", "coef"))


def is_coordinator() -> bool:
    return jax.process_index() == 0
