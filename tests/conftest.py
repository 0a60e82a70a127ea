"""Test environment: CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a simulated mesh
(xla_force_host_platform_device_count=8), the capability the reference
entirely lacks (SURVEY.md §4).

Note: this machine's sitecustomize registers the tunneled single-TPU
"axon" PJRT plugin in every python process and force-sets
jax_platforms="axon,cpu", so we must override via jax.config (env vars are
ignored) BEFORE any backend is initialised.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must not grab the TPU tunnel"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
