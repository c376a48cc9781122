"""Object Keypoint Similarity (OKS), vectorized for device use.

Behavior contract (SURVEY.md section 3 "OKS-NMS" / "Greedy OKS matching"
rows; reference lineage: utils/nms.py ``oks_iou`` — the same formula as
pycocotools' computeOks restricted to labeled keypoints):

    e_k   = (dx_k^2 + dy_k^2) / var_k / (area_norm + eps) / 2
    OKS   = mean over counted keypoints of exp(-e_k)

with var_k = (2 * sigma_k)^2 and, for the oks_nms variant, the area
normalizer (a_g + a_d) / 2 + spacing (spacing = 1 in the lineage to avoid
div-by-zero). Keypoints counted: those with v > in_vis_thre if any, else all.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from flowtrack_tpu.config import COCO_SIGMAS


def _vars(sigmas=None):
    s = jnp.asarray(sigmas if sigmas is not None else COCO_SIGMAS, jnp.float32)
    return (s * 2.0) ** 2


def oks_one_to_many(g_xy, g_vis, g_area, d_xy, d_area, sigmas=None,
                    in_vis_thre=None):
    """OKS of one ground pose against N candidate poses (oks_iou twin).

    g_xy: (K, 2); g_vis: (K,); g_area: scalar; d_xy: (N, K, 2); d_area: (N,).
    Returns (N,) OKS values.
    """
    var = _vars(sigmas)
    dx = d_xy[..., 0] - g_xy[None, :, 0]
    dy = d_xy[..., 1] - g_xy[None, :, 1]
    norm = (g_area + d_area)[:, None] / 2.0 + 1.0
    e = (dx * dx + dy * dy) / var[None, :] / norm / 2.0
    sim = jnp.exp(-e)                                   # (N, K)
    if in_vis_thre is not None:
        mask = (g_vis > in_vis_thre).astype(jnp.float32)
        mask = jnp.where(jnp.sum(mask) > 0, mask, jnp.ones_like(mask))
    else:
        mask = jnp.ones_like(g_vis, jnp.float32)
    cnt = jnp.sum(mask)
    return jnp.sum(sim * mask[None, :], axis=-1) / jnp.maximum(cnt, 1.0)


def oks_matrix(a_xy, a_area, b_xy, b_area, sigmas=None, a_conf=None,
               vis_thre=None):
    """Pairwise OKS matrix between pose sets a (M, K, 2) and b (N, K, 2).

    Area normalizer = (area_a[i] + area_b[j]) / 2 + 1 (oks_nms convention).
    If ``a_conf``/(M, K) and ``vis_thre`` are given, only a-keypoints above
    the threshold are counted (falling back to all if none pass).
    Returns (M, N).
    """
    var = _vars(sigmas)
    dx = a_xy[:, None, :, 0] - b_xy[None, :, :, 0]      # (M, N, K)
    dy = a_xy[:, None, :, 1] - b_xy[None, :, :, 1]
    norm = (a_area[:, None] + b_area[None, :]) / 2.0 + 1.0
    e = (dx * dx + dy * dy) / var[None, None, :] / norm[..., None] / 2.0
    sim = jnp.exp(-e)                                   # (M, N, K)
    if a_conf is not None and vis_thre is not None:
        mask = (a_conf > vis_thre).astype(jnp.float32)  # (M, K)
        has = jnp.sum(mask, axis=-1, keepdims=True) > 0
        mask = jnp.where(has, mask, jnp.ones_like(mask))
    else:
        mask = jnp.ones(a_xy.shape[:2], jnp.float32)  # (M, K)
    cnt = jnp.maximum(jnp.sum(mask, axis=-1), 1.0)      # (M,)
    return jnp.sum(sim * mask[:, None, :], axis=-1) / cnt[:, None]


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
    [x1,y1,v1,...], d is (N, 3K). For host-side eval code + tests."""
    g = np.asarray(g, np.float64)
    if len(d) == 0:
        return np.zeros(0)
    d = np.asarray(d, np.float64).reshape(len(d), -1)
    sig = np.asarray(sigmas if sigmas is not None else COCO_SIGMAS)
    var = (sig * 2.0) ** 2
    xg, yg, vg = g[0::3], g[1::3], g[2::3]
    ious = np.zeros(len(d))
    for i in range(len(d)):
        xd, yd = d[i, 0::3], d[i, 1::3]
        dx, dy = xd - xg, yd - yg
        e = (dx**2 + dy**2) / var / ((a_g + a_d[i]) / 2.0 + 1.0) / 2.0
        if in_vis_thre is not None:
            ind = vg > in_vis_thre
            if not ind.any():
                ind = np.ones_like(vg, bool)
            e = e[ind]
        ious[i] = np.mean(np.exp(-e)) if len(e) else 0.0
    return ious
