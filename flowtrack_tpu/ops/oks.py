"""Object Keypoint Similarity (OKS), vectorized for device use.

Behavior contract (SURVEY.md section 3 "OKS-NMS" / "Greedy OKS matching"
rows; reference lineage: utils/nms.py ``oks_iou`` — the same formula as
pycocotools' computeOks restricted to labeled keypoints):

    e_k   = (dx_k^2 + dy_k^2) / var_k / (area_norm + eps) / 2
    OKS   = mean over counted keypoints of exp(-e_k)

with var_k = (2 * sigma_k)^2 and, for the oks_nms variant, the area
normalizer (a_g + a_d) / 2 + np.spacing(1) (the lineage's epsilon, ~2.2e-16
— it only guards exact div-by-zero, it does NOT inflate small-area OKS).

Visibility filter: the lineage computes ``ind = list(vg > thr) and
list(vd > thr)`` — Python's ``and`` on two non-empty lists returns the
SECOND operand, so the effective filter is by the CANDIDATE's visibility
``vd``, with no fallback (zero passing joints -> OKS 0). Replicated here
exactly (round-1 advisor finding).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from flowtrack_tpu.config import COCO_SIGMAS


def _vars(sigmas=None):
    s = jnp.asarray(sigmas if sigmas is not None else COCO_SIGMAS, jnp.float32)
    return (s * 2.0) ** 2


_SPACING = float(np.spacing(1))


def oks_one_to_many(g_xy, d_vis, g_area, d_xy, d_area, sigmas=None,
                    in_vis_thre=None):
    """OKS of one ground pose against N candidate poses (oks_iou twin).

    g_xy: (K, 2); d_vis: (N, K) or (K,) candidate visibilities (the lineage
    quirk filters by the CANDIDATE side, module docstring); g_area: scalar;
    d_xy: (N, K, 2); d_area: (N,). Returns (N,) OKS values.
    """
    var = _vars(sigmas)
    dx = d_xy[..., 0] - g_xy[None, :, 0]
    dy = d_xy[..., 1] - g_xy[None, :, 1]
    norm = (g_area + d_area)[:, None] / 2.0 + _SPACING
    e = (dx * dx + dy * dy) / var[None, :] / norm / 2.0
    sim = jnp.exp(-e)                                   # (N, K)
    if in_vis_thre is not None:
        mask = jnp.broadcast_to(
            (jnp.asarray(d_vis) > in_vis_thre), sim.shape
        ).astype(jnp.float32)
    else:
        mask = jnp.ones_like(sim)
    cnt = jnp.sum(mask, axis=-1)
    # zero counted joints -> OKS 0 (no fallback, lineage behavior)
    return jnp.where(cnt > 0,
                     jnp.sum(sim * mask, axis=-1) / jnp.maximum(cnt, 1.0),
                     0.0)


def oks_matrix(a_xy, a_area, b_xy, b_area, sigmas=None, b_conf=None,
               vis_thre=None):
    """Pairwise OKS matrix between pose sets a (M, K, 2) and b (N, K, 2).

    Area normalizer = (area_a[i] + area_b[j]) / 2 + np.spacing(1) (oks_nms
    convention). If ``b_conf``/(N, K) and ``vis_thre`` are given, only
    CANDIDATE (b-side) keypoints above the threshold are counted — the
    lineage's effective filter (module docstring); zero passing joints give
    OKS 0. Returns (M, N).
    """
    var = _vars(sigmas)
    dx = a_xy[:, None, :, 0] - b_xy[None, :, :, 0]      # (M, N, K)
    dy = a_xy[:, None, :, 1] - b_xy[None, :, :, 1]
    norm = (a_area[:, None] + b_area[None, :]) / 2.0 + _SPACING
    e = (dx * dx + dy * dy) / var[None, None, :] / norm[..., None] / 2.0
    sim = jnp.exp(-e)                                   # (M, N, K)
    if b_conf is not None and vis_thre is not None:
        mask = (b_conf > vis_thre).astype(jnp.float32)  # (N, K)
    else:
        mask = jnp.ones(b_xy.shape[:2], jnp.float32)    # (N, K)
    cnt = jnp.sum(mask, axis=-1)                        # (N,)
    out = jnp.sum(sim * mask[None, :, :], axis=-1) / jnp.maximum(cnt, 1.0)
    return jnp.where(cnt[None, :] > 0, out, 0.0)


def pose_area(xy, vis=None):
    """Bounding-box area of a pose (N, K, 2) -> (N,), over visible joints."""
    if vis is None:
        mins = jnp.min(xy, axis=-2)
        maxs = jnp.max(xy, axis=-2)
    else:
        big = jnp.asarray(1e9, xy.dtype)
        v = vis[..., None] > 0
        mins = jnp.min(jnp.where(v, xy, big), axis=-2)
        maxs = jnp.max(jnp.where(v, xy, -big), axis=-2)
    wh = jnp.maximum(maxs - mins, 0.0)
    return wh[..., 0] * wh[..., 1]


def oks_iou_np(g, d, a_g, a_d, sigmas=None, in_vis_thre=None):
    """Numpy twin with the reference's flat-keypoint layout: g is (3K,)
    [x1,y1,v1,...], d is (N, 3K). For host-side eval code + tests.

    Replicates the lineage's visibility quirk exactly: ``list(vg > t) and
    list(vd > t)`` evaluates to the vd list, so the filter is by the
    CANDIDATE's visibility, with no fallback (empty -> OKS 0)."""
    g = np.asarray(g, np.float64)
    if len(d) == 0:
        return np.zeros(0)
    d = np.asarray(d, np.float64).reshape(len(d), -1)
    sig = np.asarray(sigmas if sigmas is not None else COCO_SIGMAS)
    var = (sig * 2.0) ** 2
    xg, yg = g[0::3], g[1::3]
    ious = np.zeros(len(d))
    for i in range(len(d)):
        xd, yd, vd = d[i, 0::3], d[i, 1::3], d[i, 2::3]
        dx, dy = xd - xg, yd - yg
        e = (dx**2 + dy**2) / var / ((a_g + a_d[i]) / 2.0 + _SPACING) / 2.0
        if in_vis_thre is not None:
            e = e[vd > in_vis_thre]
        ious[i] = np.mean(np.exp(-e)) if len(e) else 0.0
    return ious
