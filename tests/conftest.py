"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without hardware per SURVEY.md section 5
(the TPU analog of "test multi-node without a cluster").
Must run before jax initializes its backends, hence env vars set at import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
