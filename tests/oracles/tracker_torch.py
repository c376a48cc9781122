"""Independent FlowTrack tracking-loop oracle (torch + numpy + cv2).

Re-implements the reference's per-frame video loop (SURVEY.md section 4.4)
from scratch against the documented conventions — crop via
cv2.getAffineTransform/warpAffine, torch pose forward, numpy decode
(argmax + quarter-pixel + inverse affine), rescoring, flow propagation,
unified IoU NMS over detections ∪ propagated boxes, pairwise OKS and the
greedy global-max id assignment — WITHOUT importing anything from
flowtrack_tpu. tests/test_tracking_oracle_parity.py runs this loop and the
production FlowTracker on identical inputs/weights and asserts the ids and
joints agree, pinning the glue semantics end-to-end (the per-component
goldens pin each op; this pins their composition).

Conventions mirrored (each cited to the module that documents it):
  * box -> center/scale: aspect-keeping, /200 pixel-std, 1.25 padding
    (pipeline.batched_box_to_center_scale docstring).
  * rescore = box_score * mean(maxvals > 0.2) (ops/decode.rescore).
  * decode: argmax, zero coords where maxval <= 0, +-0.25 px toward the
    larger neighbor inside the strict 1 < p < size-1 gate, inverse affine
    at heatmap scale (ops/decode docstrings).
  * OKS: e = d^2 / var / ((a_i + a_j)/2 + spacing(1)) / 2, var = (2s)^2,
    plain mean over all K (no visibility filter in track matching)
    (ops/oks.py docstring).
  * propagation: bilinear flow sample, edge-clamped; propagated box =
    pose bbox expanded 15% per side (tracking/tracker.py docstring).
  * unified NMS: +1-pixel-area IoU, score-ordered greedy
    (ops/nms.nms_boxes_np convention).
"""

from __future__ import annotations

import cv2
import numpy as np
import torch

COCO_SIGMAS_ORACLE = np.array(
    [.26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62, 1.07, 1.07,
     .87, .87, .89, .89], np.float64) / 10.0
PIXEL_STD_ORACLE = 200.0
IMAGENET_MEAN_O = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD_O = np.array([0.229, 0.224, 0.225], np.float32)


def box_to_cs(box_xywh, aspect_ratio, padding=1.25):
    x, y, w, h = [float(v) for v in box_xywh]
    center = np.array([x + w * 0.5, y + h * 0.5], np.float64)
    if w > aspect_ratio * h:
        h = w / aspect_ratio
    elif w < aspect_ratio * h:
        w = h * aspect_ratio
    scale = np.array([w, h], np.float64) / PIXEL_STD_ORACLE * padding
    return center, scale


def _third_point(a, b):
    d = a - b
    return b + np.array([-d[1], d[0]], np.float64)


def affine_trans(center, scale, out_wh, inv=False):
    """Lineage-style 3-point affine (rotation 0)."""
    src_w = scale[0] * PIXEL_STD_ORACLE
    dst_w, dst_h = out_wh
    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center
    src[1] = center + np.array([0, -src_w * 0.5])
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = [dst_w * 0.5, dst_h * 0.5 - dst_w * 0.5]
    src[2] = _third_point(src[0], src[1])
    dst[2] = _third_point(dst[0], dst[1])
    if inv:
        return cv2.getAffineTransform(dst, src)
    return cv2.getAffineTransform(src, dst)


def crop_person(image, center, scale, out_hw):
    h, w = out_hw
    trans = affine_trans(center, scale, (w, h))
    crop = cv2.warpAffine(image.astype(np.float32), trans, (w, h),
                          flags=cv2.INTER_LINEAR)
    return (crop / 255.0 - IMAGENET_MEAN_O) / IMAGENET_STD_O


def decode_heatmaps(hm, center, scale):
    """hm: (K, h, w) -> (joints (K, 2) image coords, maxvals (K,))."""
    k, hh, hw = hm.shape
    flat = hm.reshape(k, -1)
    idx = flat.argmax(axis=1)
    maxvals = flat.max(axis=1)
    px = (idx % hw).astype(np.float64)
    py = (idx // hw).astype(np.float64)
    px = np.where(maxvals > 0, px, 0.0)
    py = np.where(maxvals > 0, py, 0.0)
    for j in range(k):
        x, y = int(px[j]), int(py[j])
        if 1 < x < hw - 1 and 1 < y < hh - 1:
            px[j] += 0.25 * np.sign(hm[j, y, x + 1] - hm[j, y, x - 1])
            py[j] += 0.25 * np.sign(hm[j, y + 1, x] - hm[j, y - 1, x])
    trans = affine_trans(center, scale, (hw, hh), inv=True)
    pts = np.stack([px, py, np.ones_like(px)], axis=1)  # (K, 3)
    return (pts @ trans.T).astype(np.float64), maxvals


def rescore_oracle(box_score, maxvals, thr=0.2):
    vis = maxvals > thr
    if not vis.any():
        return 0.0
    return float(box_score) * float(maxvals[vis].mean())


def bilinear_flow_at(flow, pts):
    """flow (H, W, 2), pts (K, 2) xy -> (K, 2), edge-clamped bilinear."""
    h, w, _ = flow.shape
    x = np.clip(pts[:, 0], 0, w - 1)
    y = np.clip(pts[:, 1], 0, h - 1)
    x0 = np.clip(np.floor(x).astype(int), 0, w - 1)
    y0 = np.clip(np.floor(y).astype(int), 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    fx = x - x0
    fy = y - y0
    out = (flow[y0, x0] * ((1 - fx) * (1 - fy))[:, None]
           + flow[y0, x1] * (fx * (1 - fy))[:, None]
           + flow[y1, x0] * ((1 - fx) * fy)[:, None]
           + flow[y1, x1] * (fx * fy)[:, None])
    return out


def pose_bbox_expanded(joints, expand=0.15):
    mins = joints.min(axis=0)
    maxs = joints.max(axis=0)
    wh = np.maximum(maxs - mins, 0.0)
    mins = mins - wh * expand
    maxs = maxs + wh * expand
    return np.concatenate([mins, maxs])  # xyxy


def iou_plus1(a, b):
    """xyxy IoU with the lineage's +1-pixel area convention."""
    ix1 = max(a[0], b[0])
    iy1 = max(a[1], b[1])
    ix2 = min(a[2], b[2])
    iy2 = min(a[3], b[3])
    iw = max(0.0, ix2 - ix1 + 1.0)
    ih = max(0.0, iy2 - iy1 + 1.0)
    inter = iw * ih
    area_a = (a[2] - a[0] + 1.0) * (a[3] - a[1] + 1.0)
    area_b = (b[2] - b[0] + 1.0) * (b[3] - b[1] + 1.0)
    return inter / max(area_a + area_b - inter, 1e-12)


def greedy_box_nms(boxes_xyxy, scores, thr):
    # tie convention: HIGHEST index first — the literal semantics of the
    # lineage's `scores.argsort()[::-1]` under a stable sort, which the
    # production backends (numpy / C++ / device scan) all pin; the
    # previous `argsort(-scores, stable)` kept the LOWEST index and only
    # agreed with production by introsort accident on tie-free inputs
    order = np.asarray(scores).argsort(kind="stable")[::-1]
    keep = np.zeros(len(boxes_xyxy), bool)
    alive = list(order)
    while alive:
        i = alive.pop(0)
        keep[i] = True
        alive = [j for j in alive
                 if iou_plus1(boxes_xyxy[i], boxes_xyxy[j]) <= thr]
    return keep


def oks_pair(a, b, area_a, area_b):
    var = (COCO_SIGMAS_ORACLE * 2.0) ** 2
    d2 = ((a - b) ** 2).sum(axis=1)
    norm = (area_a + area_b) / 2.0 + np.spacing(1)
    return float(np.exp(-d2 / var / norm / 2.0).mean())


def pose_area_oracle(joints):
    wh = np.maximum(joints.max(axis=0) - joints.min(axis=0), 0.0)
    return float(wh[0] * wh[1])


def greedy_assign(sim, thr):
    """sim (M, N) -> assign (N,) row index or -1; global-max greedy."""
    sim = sim.copy()
    assign = np.full(sim.shape[1], -1, np.int64)
    for _ in range(min(sim.shape)):
        i, j = np.unravel_index(np.argmax(sim), sim.shape)
        if not sim[i, j] > thr:
            break
        assign[j] = i
        sim[i, :] = -np.inf
        sim[:, j] = -np.inf
    return assign


def upsample4_x20(flow_q):
    """(1, 2, h, w) torch quarter-res flow -> (H, W, 2) numpy, x20."""
    up = torch.nn.functional.interpolate(
        flow_q, scale_factor=4, mode="bilinear", align_corners=False)
    return (up[0] * 20.0).permute(1, 2, 0).numpy()


def track_sequence_oracle(frames, detections, pose_net, flow_net, *,
                          image_size=(64, 64), heatmap_down=4,
                          box_nms_thre=1.0, pose_score_thre=0.0,
                          track_oks_thre=0.5, box_expand=0.15,
                          in_vis_thre=0.2):
    """Reference tracking loop. frames: list of (H, W, 3) RGB float;
    detections: per-frame (boxes (D, 4) xywh, scores (D,)).

    Returns per-frame list of dicts {id, joints (K, 2), score}."""
    ih, iw = image_size
    aspect = iw / ih
    prev_frame = None
    tracks = []          # list of dicts {id, joints, score}
    next_id = 0
    out = []
    for (frame, (det_boxes, det_scores)) in zip(frames, detections):
        det_boxes = np.asarray(det_boxes, np.float32).reshape(-1, 4)
        det_scores = np.asarray(det_scores, np.float32).reshape(-1)

        flow = None
        prop_joints = []
        if prev_frame is not None and tracks:
            with torch.no_grad():
                pair = np.stack([prev_frame, frame])  # (2, H, W, 3)
                mean = pair.mean(axis=(0, 1, 2), keepdims=True)
                x = (pair - mean) / 255.0
                x6 = np.concatenate([x[0], x[1]], axis=-1)  # (H, W, 6)
                xt = torch.from_numpy(
                    x6.astype(np.float32)).permute(2, 0, 1)[None]
                flow = upsample4_x20(flow_net(xt))
            for t in tracks:
                prop_joints.append(
                    t["joints"] + bilinear_flow_at(flow, t["joints"]))

        # unified candidate boxes
        boxes = [b for b in det_boxes]
        scores = [s for s in det_scores]
        for pj, t in zip(prop_joints, tracks):
            bb = pose_bbox_expanded(pj, box_expand)
            boxes.append(np.array([bb[0], bb[1], bb[2] - bb[0],
                                   bb[3] - bb[1]], np.float32))
            scores.append(t["score"])
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        scores = np.asarray(scores, np.float32).reshape(-1)
        good = (boxes[:, 2] > 1) & (boxes[:, 3] > 1)
        boxes, scores = boxes[good], scores[good]
        if len(boxes) and box_nms_thre < 1.0:
            xyxy = np.concatenate(
                [boxes[:, :2], boxes[:, :2] + boxes[:, 2:]], axis=1)
            keep = greedy_box_nms(xyxy, scores, box_nms_thre)
            boxes, scores = boxes[keep], scores[keep]

        # pose on the union
        cands = []
        for box, bscore in zip(boxes, scores):
            center, scale = box_to_cs(box, aspect)
            crop = crop_person(frame, center, scale, (ih, iw))
            with torch.no_grad():
                xt = torch.from_numpy(
                    crop.astype(np.float32)).permute(2, 0, 1)[None]
                hm = pose_net(xt)[0].numpy()       # (K, h, w)
            joints, maxvals = decode_heatmaps(hm, center, scale)
            sc = rescore_oracle(bscore, maxvals, in_vis_thre)
            if sc >= pose_score_thre:
                cands.append({"joints": joints, "score": sc})

        # greedy OKS assignment vs flow-propagated tracks
        assign = np.full(len(cands), -1, np.int64)
        if tracks and cands and flow is not None:
            sim = np.zeros((len(tracks), len(cands)))
            for i, pj in enumerate(prop_joints):
                for j, c in enumerate(cands):
                    sim[i, j] = oks_pair(pj, c["joints"],
                                         pose_area_oracle(pj),
                                         pose_area_oracle(c["joints"]))
            assign = greedy_assign(sim, track_oks_thre)

        new_tracks = []
        for j, c in enumerate(cands):
            if assign[j] >= 0:
                tid = tracks[assign[j]]["id"]
            else:
                tid = next_id
                next_id += 1
            new_tracks.append({"id": tid, "joints": c["joints"],
                               "score": c["score"]})
        tracks = new_tracks
        prev_frame = frame
        out.append([dict(t) for t in tracks])
    return out
