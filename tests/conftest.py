"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's forced-dispatch testing strategy
(LIBDEFLATE_DISABLE_CPU_FEATURES in scripts/run_tests.sh:133-165): every
device code path — including multi-chip sharding — is exercised on one box by
forcing the platform, instead of requiring a pod.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon terminal plugin (sitecustomize) programmatically forces
# jax_platforms="axon,cpu" at interpreter start; override it back to CPU for
# deterministic, hardware-independent tests.
import jax

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:  # pragma: no cover
    pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0x1E35A7BD)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: interpret-mode Pallas kernel tests (dominate suite wall "
        "time); deselect with -m 'not slow' for the quick split",
    )
