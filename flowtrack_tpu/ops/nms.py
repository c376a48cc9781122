"""Greedy suppression on device: box IoU NMS + OKS-NMS.

Behavior contract (SURVEY.md section 3 "OKS-NMS" / "bbox NMS" rows;
reference lineage: utils/nms.py ``oks_nms`` and lib/nms cpu/gpu_nms):
classic greedy NMS — process candidates in descending score order, keep a
candidate iff its similarity (IoU / OKS) to every already-kept candidate is
<= threshold.

TPU-native design: the reference's Cython/CUDA NMS becomes a masked greedy
``lax.scan`` over a precomputed pairwise similarity matrix — static shapes,
no host sync. A ``valid`` mask supports padded candidate sets (ragged
persons-per-frame). Padding cannot perturb the greedy order because invalid
rows get score -inf and are never selected or allowed to suppress.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from flowtrack_tpu.ops.oks import oks_matrix, oks_iou_np


def iou_matrix(boxes_a, boxes_b):
    """Pairwise IoU. Boxes are (x1, y1, x2, y2). (M, 4) x (N, 4) -> (M, N).

    Uses the classic +1 pixel-area convention of the lineage's cpu_nms
    (areas = (x2 - x1 + 1) * (y2 - y1 + 1)).
    """
    ax1, ay1, ax2, ay2 = [boxes_a[:, i] for i in range(4)]
    bx1, by1, bx2, by2 = [boxes_b[:, i] for i in range(4)]
    area_a = (ax2 - ax1 + 1.0) * (ay2 - ay1 + 1.0)
    area_b = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0)
    ix1 = jnp.maximum(ax1[:, None], bx1[None, :])
    iy1 = jnp.maximum(ay1[:, None], by1[None, :])
    ix2 = jnp.minimum(ax2[:, None], bx2[None, :])
    iy2 = jnp.minimum(ay2[:, None], by2[None, :])
    iw = jnp.maximum(ix2 - ix1 + 1.0, 0.0)
    ih = jnp.maximum(iy2 - iy1 + 1.0, 0.0)
    inter = iw * ih
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def greedy_nms_from_matrix(sim, scores, thresh, valid=None):
    """Greedy NMS given a pairwise similarity matrix.

    Args:
      sim: (N, N) similarity (IoU or OKS).
      scores: (N,).
      thresh: suppress j if sim[i, j] > thresh for an already-kept i.
      valid: optional (N,) bool mask for padded entries.

    Returns keep: (N,) bool. Jit/vmap friendly (lax.scan, static shapes).
    """
    n = scores.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, jnp.float32)
    scores = jnp.asarray(scores, jnp.float32)
    if valid is not None:
        scores = jnp.where(valid, scores, neg_inf)

    def step(state, _):
        alive, keep = state  # alive: not yet kept nor suppressed
        any_alive = jnp.any(alive)
        s = jnp.where(alive, scores, neg_inf)
        # tie-break on equal scores by HIGHEST index — the host twins pin
        # argsort(kind="stable")[::-1], whose stable ascending sort puts
        # the last of equal scores first (the reference's plain argsort
        # is introsort: ARBITRARY on ties; we determinize so the numpy,
        # C++ and device backends all keep the same candidate); plain
        # argmax would keep the lowest index instead
        i = s.shape[0] - 1 - jnp.argmax(s[::-1])
        # once nothing is alive the state is a fixed point: keep[i] retains
        # its old value and alive stays all-False.
        keep = keep.at[i].set(keep[i] | any_alive)
        remove = (sim[i] > thresh) | (jnp.arange(n) == i)
        alive = alive & ~remove
        return (alive, keep), None

    init = (jnp.isfinite(scores), jnp.zeros(n, bool))
    (alive, keep), _ = jax.lax.scan(step, init, None, length=n)
    return keep


def nms_boxes(boxes, scores, thresh, valid=None):
    """Greedy IoU NMS over (N, 4) xyxy boxes -> (N,) keep mask."""
    return greedy_nms_from_matrix(iou_matrix(boxes, boxes), scores, thresh, valid)


def oks_nms(kpts_xy, scores, areas, thresh, valid=None, sigmas=None,
            conf=None, in_vis_thre=None):
    """Greedy OKS-NMS over pose candidates (reference ``oks_nms``).

    kpts_xy: (N, K, 2); scores: (N,); areas: (N,) -> (N,) keep mask.
    """
    sim = oks_matrix(kpts_xy, areas, kpts_xy, areas, sigmas=sigmas,
                     b_conf=conf, vis_thre=in_vis_thre)
    return greedy_nms_from_matrix(sim, scores, thresh, valid)


# ---------------------------------------------------------------------------
# Host (numpy) twins — used by the COCO evaluator and as test oracles.
# ---------------------------------------------------------------------------

def oks_nms_np(kpts_list, thresh, sigmas=None, in_vis_thre=None):
    """Reference-layout oks_nms: kpts_list is a list of dicts with
    'keypoints' (K, 3), 'score', 'area'. Returns kept indices (order =
    descending score)."""
    if len(kpts_list) == 0:
        return []
    scores = np.array([k["score"] for k in kpts_list])
    kpts = np.array([np.asarray(k["keypoints"]).reshape(-1) for k in kpts_list])
    areas = np.array([k["area"] for k in kpts_list])
    order = scores.argsort(kind="stable")[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        ious = oks_iou_np(kpts[i], kpts[order[1:]], areas[i], areas[order[1:]],
                          sigmas, in_vis_thre)
        order = order[1:][ious <= thresh]
    return keep


def nms_boxes_np(dets, thresh):
    """Greedy IoU NMS, numpy. dets: (N, 5) [x1, y1, x2, y2, score] ->
    kept indices."""
    if len(dets) == 0:
        return []
    x1, y1, x2, y2, scores = [dets[:, i] for i in range(5)]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort(kind="stable")[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][ovr <= thresh]
    return keep


def soft_oks_nms_np(kpts_list, thresh, max_dets=20, sigmas=None,
                    in_vis_thre=None):
    """Soft OKS-NMS (gaussian rescoring variant present in the lineage)."""
    if len(kpts_list) == 0:
        return [], []
    scores = np.array([k["score"] for k in kpts_list], dtype=np.float64)
    kpts = np.array([np.asarray(k["keypoints"]).reshape(-1) for k in kpts_list])
    areas = np.array([k["area"] for k in kpts_list])
    order = scores.argsort(kind="stable")[::-1]
    scores = scores[order]
    keep = np.zeros(max_dets, dtype=np.intp)
    keep_cnt = 0
    while order.size > 0 and keep_cnt < max_dets:
        i = order[0]
        ious = oks_iou_np(kpts[i], kpts[order[1:]], areas[i], areas[order[1:]],
                          sigmas, in_vis_thre)
        order = order[1:]
        sc = scores[1:] * np.exp(-(ious ** 2) / thresh)
        keep[keep_cnt] = i
        keep_cnt += 1
        resort = sc.argsort(kind="stable")[::-1]
        order = order[resort]
        scores = sc[resort]
    return list(keep[:keep_cnt]), None
