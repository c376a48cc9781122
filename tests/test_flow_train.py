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


def test_flownetc_train_step_with_pallas_corr(rng, monkeypatch):
    """One FlowNetC flow_train_step riding the Pallas correlation path
    (custom VJP) must produce finite grads and the SAME post-step params as
    the XLA correlation path (VERDICT round-1 item 4 'done' criterion).
    interpret=True runs the same kernel logic on the CPU mesh."""
    import functools

    import flowtrack_tpu.models.flownet as flownet_mod
    from flowtrack_tpu.models.flownet import FlowNetC
    from flowtrack_tpu.ops.correlation import correlation

    monkeypatch.setattr(flownet_mod, "correlation",
                        functools.partial(correlation, interpret=True))

    x = rng.normal(0, 0.3, (1, 64, 64, 6)).astype(np.float32)
    gt = np.zeros((1, 64, 64, 2), np.float32)
    gt[..., 0] = 2.0
    batch = {"input": x, "flow": gt}
    cfg = Config()

    outs = {}
    for use_pallas in (False, True):
        model = FlowNetC(dtype=jnp.float32, max_displacement=4,
                         corr_stride2=2, use_pallas_corr=use_pallas)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   jnp.asarray(x))
        state, m = flow_train_step(state, batch)
        leaves = jax.tree.leaves(state.params)
        assert all(np.isfinite(np.asarray(p)).all() for p in leaves)
        outs[use_pallas] = (jax.tree.map(np.asarray, state.params),
                            float(m["loss"]))

    np.testing.assert_allclose(outs[True][1], outs[False][1], rtol=1e-5)
    flat_t = jax.tree_util.tree_flatten_with_path(outs[True][0])[0]
    flat_f = dict(jax.tree_util.tree_flatten_with_path(outs[False][0])[0])
    for path, v in flat_t:
        np.testing.assert_allclose(
            v, flat_f[path], rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


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


def test_cascade_train_step_runs(rng):
    """Cascade variants return ONE full-res flow (no pyramid); the train
    step must fine-tune them on plain EPE instead of crashing on the
    pyramid unpack (review finding)."""
    from flowtrack_tpu.models.flownet import FlowNet2CSS

    model = FlowNet2CSS(stages=1, dtype=jnp.float32)  # flownet2_cs
    x = rng.normal(0, 0.3, (1, 64, 64, 6)).astype(np.float32)
    gt = np.zeros((1, 64, 64, 2), np.float32)
    gt[..., 0] = 2.0
    batch = {"input": x, "flow": gt}

    cfg = Config()
    state = create_train_state(model, cfg, jax.random.PRNGKey(1),
                               jnp.asarray(x))
    state2, m = jax.jit(flow_train_step)(state, batch)
    assert np.isfinite(float(m["loss"])) and np.isfinite(float(m["epe"]))
    # parameters actually moved (gradients flowed through the cascade)
    before = jax.tree_util.tree_leaves(state.params)[0]
    after = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
