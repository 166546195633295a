"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip hardware is not available in CI; sharding correctness is tested
on a virtual 8-device CPU mesh (the driver separately dry-run-compiles the
multi-chip path via __graft_entry__.dryrun_multichip).  Must run before
jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the tunneled TPU and overrides
# jax_platforms to "axon,cpu"; compiles through the tunnel take 20-60s, so
# the suite runs on the CPU backend (override must happen before first
# backend use).  Set NTT_TPU_TESTS=1 to run the opt-in TPU smoke tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xC0FFEE)
