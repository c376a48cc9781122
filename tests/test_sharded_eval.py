"""Multi-chip sharding correctness (SURVEY.md section 5): the same batch
sharded over the 8-device mesh vs unsharded single-device must produce
identical results (the all-gather only moves data).

Equality strength (round-1 VERDICT item 6): the inference paths — forward
and decode — are per-example computations with NO cross-device reduction,
so they are asserted BITWISE equal. The train step is the one exception:
its gradient psum reduces across devices in a different order than the
single-device batch sum, so float32 summation-order noise of O(eps) is
mathematically expected there — that test keeps a 1e-6 tolerance and
documents why (it is a property of any data-parallel reduction, not a
sharding bug)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

from flowtrack_tpu.config import Config, ModelConfig
from flowtrack_tpu.engine.train import create_train_state, train_step
from flowtrack_tpu.ops.decode import get_final_preds
from flowtrack_tpu.parallel import (
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicated,
    shard_batch,
)


class Tiny(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(8, (3, 3), strides=(4, 4), padding="SAME")(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        return nn.Conv(17, (1, 1))(x)


def test_sharded_forward_matches_unsharded(rng):
    mesh = make_mesh()
    assert mesh.size == 8
    model = Tiny()
    x = rng.normal(size=(16, 32, 24, 3)).astype(np.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.asarray(x[:1]), train=False)

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    want = np.asarray(fwd(variables, jnp.asarray(x)))

    xs = jax.device_put(x, batch_sharding(mesh))
    vs = jax.device_put(variables, replicated(mesh))
    got = np.asarray(fwd(vs, xs))
    # no cross-device reduction in a batch-sharded forward -> bitwise
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_sharded_train_step_matches_unsharded(rng, ndev):
    """Gradient psum across the mesh == single-device gradient (the
    DataParallel equivalence), regression-pinned ACROSS mesh sizes 2/4/8
    (VERDICT round-2 item 7): the 1e-6 bound is a property of the
    reduction-order noise of ANY data-parallel psum, so it must hold at
    every mesh width, not just 8."""
    from dataclasses import replace

    mesh = make_mesh(num_devices=ndev)
    assert mesh.size == ndev
    cfg = Config(model=ModelConfig(image_size=(32, 24), heatmap_size=(8, 6)))
    # SGD: linear in the gradient, so cross-device reduction-order noise
    # stays tiny. (Adam's first step ~ sign(grad) amplifies epsilon-level
    # summation-order differences to O(lr) — not a sharding bug.)
    cfg = replace(cfg, train=replace(cfg.train, optimizer="sgd"))
    model = Tiny()
    x = rng.normal(size=(16, 32, 24, 3)).astype(np.float32)
    batch = {"input": x,
             "target": rng.uniform(0, 1, (16, 8, 6, 17)).astype(np.float32),
             "target_weight": np.ones((16, 17), np.float32)}
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.asarray(x[:1]))
    step = jax.jit(train_step, static_argnums=(2,))

    s_plain, m_plain = step(state, jax.tree.map(jnp.asarray, batch), True)
    s_shard, m_shard = step(
        jax.device_put(state, replicated(mesh)),
        shard_batch(mesh, batch), True)
    np.testing.assert_allclose(float(m_plain["loss"]),
                               float(m_shard["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_plain.params),
                    jax.tree.leaves(s_shard.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_sharded_decode_matches_unsharded(rng):
    mesh = make_mesh()
    hm = rng.uniform(0, 1, (16, 16, 12, 17)).astype(np.float32)
    centers = rng.uniform(50, 100, (16, 2)).astype(np.float32)
    scales = np.full((16, 2), 0.8, np.float32)
    decode = jax.jit(get_final_preds)
    want_p, want_v = decode(jnp.asarray(hm), jnp.asarray(centers),
                            jnp.asarray(scales))
    sh = batch_sharding(mesh)
    got_p, got_v = decode(jax.device_put(hm, sh),
                          jax.device_put(centers, sh),
                          jax.device_put(scales, sh))
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


@pytest.mark.smoke
def test_pad_to_multiple():
    x = np.arange(13 * 4).reshape(13, 4).astype(np.float64)
    padded, n = pad_to_multiple(x, 8)
    assert padded.shape == (16, 4) and n == 13
    # the original rows must stay at the FRONT with ZERO padding appended
    # trailing — clip_pipeline relies on real frames occupying [0, n)
    np.testing.assert_array_equal(padded[:13], x)
    np.testing.assert_array_equal(padded[13:], 0.0)
    same, n2 = pad_to_multiple(np.ones((16, 4)), 8)
    assert same.shape == (16, 4) and n2 == 16
