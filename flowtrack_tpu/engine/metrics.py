"""Training-time heatmap accuracy (PCK-style) + meters.

Behavior contract (reference lineage: core/evaluate.py ``accuracy`` — the
per-batch metric printed during train/validate): decode argmax keypoints
from BOTH predicted and GT heatmaps, normalize distances by
(heatmap_size / 10), count a joint correct when dist < 0.5; joints whose GT
peak is absent (coords <= 1 after argmax) are ignored.
"""

from __future__ import annotations

import jax.numpy as jnp

from flowtrack_tpu.ops.decode import get_max_preds


def heatmap_accuracy(pred_hm, gt_hm, thr: float = 0.5):
    """pred_hm/gt_hm: (N, H, W, K) -> (avg_acc, per_joint_acc (K,), cnt).

    Pure jnp, jittable; runs on device inside the train step (the reference
    does this on CPU per batch).
    """
    n, h, w, k = pred_hm.shape
    pred, _ = get_max_preds(pred_hm)
    target, _ = get_max_preds(gt_hm)
    # parity quirk: the reference normalizes (x, y) by [h, w]/10 — h against
    # the x coordinate — and training logs are only comparable if we match
    # it (core/evaluate.py lineage)
    norm = jnp.array([h, w], jnp.float32) / 10.0

    dists = jnp.linalg.norm((pred - target) / norm, axis=-1)      # (N, K)
    visible = (target[..., 0] > 1.0) & (target[..., 1] > 1.0)     # (N, K)
    correct = (dists < thr) & visible

    cnt_per_joint = jnp.sum(visible, axis=0)                      # (K,)
    acc_per_joint = jnp.where(
        cnt_per_joint > 0,
        jnp.sum(correct, axis=0) / jnp.maximum(cnt_per_joint, 1),
        -1.0)
    valid = acc_per_joint >= 0
    avg = jnp.sum(jnp.where(valid, acc_per_joint, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)
    return avg, acc_per_joint, jnp.sum(cnt_per_joint)


class AverageMeter:
    """Running average (reference utility; host-side)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self):
        return self.sum / self.count if self.count else 0.0
