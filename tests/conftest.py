"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's forced-dispatch testing strategy
(LIBDEFLATE_DISABLE_CPU_FEATURES in scripts/run_tests.sh:133-165): every
device code path — including multi-chip sharding — is exercised on one box by
forcing the platform, instead of requiring a pod.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0x1E35A7BD)
