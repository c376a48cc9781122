"""Engine tests: JointsMSELoss vs torch oracle, accuracy metric, LR schedule,
train_step smoke on a tiny model (sharded over the 8-device CPU mesh)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import jax
import jax.numpy as jnp
from flax import linen as nn

from flowtrack_tpu.config import Config, ModelConfig, TrainConfig
from flowtrack_tpu.engine.loss import epe, joints_mse_loss, multiscale_epe
from flowtrack_tpu.engine.metrics import AverageMeter, heatmap_accuracy
from flowtrack_tpu.engine.train import (
    create_train_state,
    make_jit_train_step,
    make_lr_schedule,
)
from flowtrack_tpu.parallel import make_mesh, shard_batch


class TorchJointsMSELoss(tnn.Module):
    """Oracle written to the reference equation (SURVEY.md section 3)."""

    def __init__(self, use_target_weight):
        super().__init__()
        self.criterion = tnn.MSELoss()
        self.use_target_weight = use_target_weight

    def forward(self, output, target, target_weight):
        batch_size = output.size(0)
        num_joints = output.size(1)
        heatmaps_pred = output.reshape((batch_size, num_joints, -1)).split(1, 1)
        heatmaps_gt = target.reshape((batch_size, num_joints, -1)).split(1, 1)
        loss = 0
        for idx in range(num_joints):
            heatmap_pred = heatmaps_pred[idx].squeeze()
            heatmap_gt = heatmaps_gt[idx].squeeze()
            if self.use_target_weight:
                loss += 0.5 * self.criterion(
                    heatmap_pred.mul(target_weight[:, idx]),
                    heatmap_gt.mul(target_weight[:, idx]))
            else:
                loss += 0.5 * self.criterion(heatmap_pred, heatmap_gt)
        return loss / num_joints


@pytest.mark.parametrize("use_tw", [True, False])
@pytest.mark.smoke
def test_joints_mse_matches_torch(rng, use_tw):
    n, h, w, k = 4, 8, 6, 17
    pred = rng.normal(size=(n, h, w, k)).astype(np.float32)
    tgt = rng.normal(size=(n, h, w, k)).astype(np.float32)
    tw = rng.uniform(0, 1, size=(n, k)).astype(np.float32)

    got = float(joints_mse_loss(jnp.asarray(pred), jnp.asarray(tgt),
                                jnp.asarray(tw) if use_tw else None))
    oracle = TorchJointsMSELoss(use_tw)
    # torch layout NKHW flattened == our NHWK flattened per joint
    tp = torch.from_numpy(pred.transpose(0, 3, 1, 2))
    tt = torch.from_numpy(tgt.transpose(0, 3, 1, 2))
    want = float(oracle(tp, tt, torch.from_numpy(tw[:, :, None])))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_heatmap_accuracy_perfect_and_off(rng):
    n, h, w, k = 2, 64, 48, 17
    hm = np.zeros((n, h, w, k), np.float32)
    for i in range(n):
        for j in range(k):
            y, x = 10 + j, 20 + (j % 5)
            hm[i, y, x, j] = 1.0
    acc, per_joint, cnt = heatmap_accuracy(jnp.asarray(hm), jnp.asarray(hm))
    assert float(acc) == 1.0
    # shift preds in x by more than 0.5 * (h/10) = 3.2 px -> all wrong
    # (the normalizer is [h, w]/10 per AXIS ORDER of the pred coords —
    # the x shift compares against h/10; see
    # test_review_fixes.test_accuracy_norm_matches_reference_convention)
    hm2 = np.roll(hm, 4, axis=2)
    acc2, _, _ = heatmap_accuracy(jnp.asarray(hm2), jnp.asarray(hm))
    assert float(acc2) == 0.0


def test_lr_schedule_milestones():
    cfg = Config(train=TrainConfig(lr=1e-3, lr_factor=0.1, lr_steps=(90, 120)))
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    assert np.isclose(float(sched(0)), 1e-3)
    assert np.isclose(float(sched(899)), 1e-3)
    assert np.isclose(float(sched(900)), 1e-4)
    assert np.isclose(float(sched(1200)), 1e-5)


def test_epe_and_multiscale():
    a = jnp.zeros((1, 8, 8, 2))
    b = jnp.ones((1, 8, 8, 2)) * jnp.asarray([3.0, 4.0])
    assert np.isclose(float(epe(a, b)), 5.0)
    pyr = [jnp.zeros((1, 8 // f, 8 // f, 2)) for f in (1, 2, 4)]
    loss = multiscale_epe(pyr, b, weights=(1.0, 1.0, 1.0), div_flow=20.0)
    assert np.isclose(float(loss), 3 * 5.0 / 20.0, rtol=1e-5)


class TinyPose(nn.Module):
    """2-conv stand-in for PoseResNet; enough to exercise the step."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(8, (3, 3), strides=(4, 4), padding="SAME")(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        return nn.Conv(17, (1, 1))(x)


def test_train_step_runs_and_descends(rng):
    cfg = Config(model=ModelConfig(image_size=(32, 24), heatmap_size=(8, 6)))
    model = TinyPose()
    x = rng.normal(size=(8, 32, 24, 3)).astype(np.float32)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.asarray(x))
    tgt = rng.uniform(0, 1, size=(8, 8, 6, 17)).astype(np.float32)
    tw = np.ones((8, 17), np.float32)
    batch = {"input": x, "target": tgt, "target_weight": tw}

    mesh = make_mesh()  # 8 virtual CPU devices (conftest)
    assert mesh.size == 8
    batch = shard_batch(mesh, batch)
    step = make_jit_train_step(donate=False)
    losses = []
    for _ in range(5):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5


def test_average_meter():
    m = AverageMeter()
    m.update(1.0, 2)
    m.update(4.0, 1)
    assert np.isclose(m.avg, 2.0)
    assert m.val == 4.0
