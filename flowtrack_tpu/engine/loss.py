"""Losses.

Behavior contract (SURVEY.md section 3 "JointsMSELoss" row; reference
lineage: core/loss.py):

  JointsMSELoss: split pred/GT heatmaps per joint, flatten spatially,
  0.5 * MSE per joint (mean over batch*pixels), optionally scaling both
  pred and GT by target_weight first; average over joints.

Plus the multi-scale EPE loss the FlowNet lineage trains with
(arXiv:1504.06852 section 3).
"""

from __future__ import annotations

import jax.numpy as jnp


def joints_mse_loss(pred, target, target_weight=None):
    """pred/target: (N, H, W, K); target_weight: (N, K) or None -> scalar.

    Matches the reference: mean over joints of
    0.5 * mean_{batch, pixels}((w*pred - w*gt)^2).
    """
    n, h, w, k = pred.shape
    pred = pred.astype(jnp.float32).reshape(n, h * w, k)
    target = target.astype(jnp.float32).reshape(n, h * w, k)
    if target_weight is not None:
        tw = target_weight.astype(jnp.float32).reshape(n, 1, k)
        pred = pred * tw
        target = target * tw
    # 0.5 * MSE per joint, then mean over joints == overall scaled mean
    per_joint = 0.5 * jnp.mean(jnp.square(pred - target), axis=(0, 1))  # (K,)
    return jnp.mean(per_joint)


def epe(flow_pred, flow_gt, mean=True):
    """Endpoint error: mean L2 norm of the flow residual. NHWC, C=2."""
    d = jnp.sqrt(jnp.sum(jnp.square(
        flow_pred.astype(jnp.float32) - flow_gt.astype(jnp.float32)),
        axis=-1))
    return jnp.mean(d) if mean else d


def multiscale_epe(flow_pyramid, flow_gt, weights=(0.005, 0.01, 0.02, 0.08, 0.32),
                   div_flow=20.0):
    """FlowNet multi-scale training loss over (flow2..flow6).

    flow_gt is full-resolution; each pyramid level compares against an
    average-pooled, downscaled GT (the lineage's MultiScale loss). The
    network predicts flow/div_flow, so GT is divided accordingly.
    """
    total = 0.0
    gt = flow_gt.astype(jnp.float32) / div_flow
    for lvl, (f, w) in enumerate(zip(flow_pyramid, weights)):
        factor = flow_gt.shape[1] // f.shape[1]
        n, h, w_, c = f.shape
        pooled = jnp.mean(
            gt.reshape(n, h, factor, w_, factor, c), axis=(2, 4))
        total = total + w * epe(f, pooled)
    return total
