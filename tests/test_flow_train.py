"""FlowNet training: multiscale EPE descends when overfitting one pair set
with a constant ground-truth flow."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flowtrack_tpu.config import Config
from flowtrack_tpu.engine.flow_train import flow_train_step
from flowtrack_tpu.engine.train import create_train_state
from flowtrack_tpu.models.flownet import FlowNetS

pytestmark = pytest.mark.slow


def test_flow_overfit_constant_flow(rng):
    model = FlowNetS(dtype=jnp.float32)
    x = rng.normal(0, 0.3, (2, 64, 64, 6)).astype(np.float32)
    gt = np.zeros((2, 64, 64, 2), np.float32)
    gt[..., 0] = 4.0
    gt[..., 1] = -2.0
    batch = {"input": x, "flow": gt}

    cfg = Config()
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.asarray(x))
    # FlowNetS train=True returns the 5-level pyramid
    step = jax.jit(flow_train_step, static_argnums=())
    epes = []
    for _ in range(60):
        state, m = step(state, batch)
        epes.append(float(m["epe"]))
    assert epes[-1] < 0.5 * epes[0], epes[::15]
