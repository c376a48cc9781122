"""remat (jax.checkpoint) option: identical forward/gradients, less memory.

Equality is exact in fp32 on CPU — remat only changes WHEN activations are
(re)computed, never what."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flowtrack_tpu.config import ModelConfig
from flowtrack_tpu.engine.loss import joints_mse_loss
from flowtrack_tpu.models.pose_resnet import PoseResNet


@pytest.mark.slow
def test_remat_same_forward_and_grads(rng):
    base_cfg = ModelConfig(num_layers=18, image_size=(32, 32),
                           heatmap_size=(8, 8), dtype="float32")
    remat_cfg = ModelConfig(num_layers=18, image_size=(32, 32),
                            heatmap_size=(8, 8), dtype="float32", remat=True)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 17)), jnp.float32)

    m0 = PoseResNet(cfg=base_cfg)
    m1 = PoseResNet(cfg=remat_cfg)
    variables = jax.jit(m0.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)

    out0 = m0.apply(variables, x, train=False)
    out1 = m1.apply(variables, x, train=False)  # same params tree
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               atol=1e-6)

    def loss(m):
        def f(params):
            out, _ = m.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return joints_mse_loss(out, tgt)
        return f

    g0 = jax.grad(loss(m0))(variables["params"])
    g1 = jax.grad(loss(m1))(variables["params"])
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)
