"""Checkpoint manager round-trips: save -> restore exact state, best
tracking, npz zoo format (SURVEY.md section 6.4)."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from flowtrack_tpu.config import Config
from flowtrack_tpu.engine.checkpoint import (
    CheckpointManager,
    load_npz_variables,
    save_npz_variables,
)
from flowtrack_tpu.engine.train import create_train_state, make_jit_train_step


class Tiny(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(4, (3, 3), padding="SAME")(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.Conv(17, (1, 1))(x)


def _state(rng):
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    return create_train_state(Tiny(), Config(), jax.random.PRNGKey(0),
                              jnp.asarray(x)), x


def test_save_restore_roundtrip(tmp_path, rng):
    state, x = _state(rng)
    batch = {"input": x,
             "target": rng.uniform(0, 1, (2, 8, 8, 17)).astype(np.float32),
             "target_weight": np.ones((2, 17), np.float32)}
    step = make_jit_train_step(donate=False)
    for _ in range(3):
        state, _ = step(state, batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, state, perf=0.5, wait=True)

    fresh, _ = _state(rng)
    restored, epoch = mgr.restore(fresh)
    assert epoch == 0
    assert int(restored.step) == 3
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # BN statistics must round-trip too — a restore that re-initializes
    # batch_stats would silently wreck eval parity on resume
    assert jax.tree.leaves(state.batch_stats), "Tiny model must have BN"
    for a, b in zip(jax.tree.leaves(state.batch_stats),
                    jax.tree.leaves(restored.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_best_tracking(tmp_path, rng):
    state, _ = _state(rng)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, state, perf=0.3, wait=True)
    mgr.save(1, state, perf=0.7, wait=True)
    mgr.save(2, state, perf=0.5, wait=True)
    assert mgr.best_epoch == 1
    restored, epoch = mgr.restore(state)
    assert epoch == 2  # latest by default
    mgr.close()


def test_npz_roundtrip(tmp_path, rng):
    state, _ = _state(rng)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    save_npz_variables(str(tmp_path / "w.npz"), variables)
    loaded = load_npz_variables(str(tmp_path / "w.npz"))
    flat_a = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(loaded)[0]
    assert len(flat_a) == len(flat_b)
    for (ka, va), (kb, vb) in zip(
            sorted(flat_a, key=lambda t: jax.tree_util.keystr(t[0])),
            sorted(flat_b, key=lambda t: jax.tree_util.keystr(t[0]))):
        # key paths must match pairwise — equal values under a flattened
        # (un-nested) tree would otherwise pass
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
