"""Test configuration: force an 8-device virtual CPU mesh.

Sharding/multi-chip tests need multiple devices; real multi-chip TPU
hardware is not available in CI, so the suite runs on the CPU backend with
8 virtual host devices (and Pallas kernels in interpreter mode, mirroring
how the reference's CPU path shadows its GPU path — SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(12345)
