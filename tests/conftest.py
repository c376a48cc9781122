"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without hardware per SURVEY.md section 5
(the TPU analog of "test multi-node without a cluster").

NOTE: this machine's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon (the TPU tunnel), so env vars set here are too late —
jax.config.update is the reliable switch (backends are still uninitialized
when conftest runs; verified).
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
