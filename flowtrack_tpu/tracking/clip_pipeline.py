"""Whole-clip tracking pipeline — ONE jit-compiled program per clip.

The TPU-native answer to the reference's strictly sequential per-frame loop
(SURVEY.md section 6.7): the only true sequential dependency in FlowTrack is
the ID-assignment chain, which is tiny. Everything expensive is batched
across the clip:

  1. FlowNet on ALL (t-1, t) frame pairs in one batched call;
  2. pose on ALL persons of ALL frames in one batched call (fused matmul
     crop -> backbone with flip-test -> on-device decode -> rescore);
  3. a ``lax.scan`` over frames doing only the cheap part — propagate the
     previous tracks through the flow, OKS similarity, greedy masked-argmax
     assignment, id bookkeeping — entirely on device.

One host->device transfer of the clip in, one device->host transfer of
(joints, ids, scores) out. The host FlowTracker (tracker.py) remains the
full-featured streaming path (unified det+propagated box NMS for detector-
miss recovery); the clip pipeline trades that recovery for wall-clock — the
candidate set is the detector's, and unmatched tracks do not survive. Both
share the same matching semantics (greedy_match).

Shapes are static: F frames x P persons (padded, masked).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from flowtrack_tpu.config import (
    COCO_FLIP_PAIRS,
    IMAGENET_MEAN,
    IMAGENET_STD,
    Config,
)
from flowtrack_tpu.models.flownet import postprocess_flow, preprocess_pair
from flowtrack_tpu.ops.crop import crop_resize_normalize
from flowtrack_tpu.ops.decode import get_final_preds, rescore
from flowtrack_tpu.ops.heatmap import merge_flip_test
from flowtrack_tpu.ops.oks import oks_matrix, pose_area
from flowtrack_tpu.pipeline import batched_box_to_center_scale
from flowtrack_tpu.tracking.tracker import greedy_match, propagate_poses


def _assign_ids(assign, cand_valid, track_ids, next_id):
    """Vectorized id bookkeeping. assign: (P,) row index or -1.

    Matched candidates inherit the track id; valid unmatched candidates get
    fresh consecutive ids starting at next_id."""
    matched = assign >= 0
    inherited = track_ids[jnp.clip(assign, 0)]
    new_mask = (~matched) & cand_valid
    ranks = jnp.cumsum(new_mask.astype(jnp.int32)) - 1
    fresh = next_id + ranks
    ids = jnp.where(matched, inherited, jnp.where(new_mask, fresh, -1))
    return ids, next_id + jnp.sum(new_mask.astype(jnp.int32))


class ClipTracker:
    """Batched-clip FlowTrack. All frames must share one (H, W)."""

    def __init__(self, cfg: Config, pose_model, pose_vars, flow_model,
                 flow_vars, max_persons: Optional[int] = None):
        self.cfg = cfg
        self.max_persons = max_persons or cfg.track.max_persons
        img_h, img_w = cfg.model.image_size
        self.aspect_ratio = img_w / img_h
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        flip_test = cfg.test.flip_test
        thr = cfg.track.track_oks_thre
        div_flow = cfg.flow.div_flow

        def clip_fn(pose_vars, flow_vars, frames, centers, scales,
                    det_scores, det_valid):
            f, h, w, _ = frames.shape
            p = centers.shape[1]

            # ---- 1. flow on all pairs, one call. FlowNet needs /64 input
            # dims; resize the flow branch and rescale components back
            # (same convention as pipeline.FlowPredictor).
            net_h = -(-h // 64) * 64
            net_w = -(-w // 64) * 64
            if (net_h, net_w) != (h, w):
                flow_in = jax.image.resize(
                    frames.astype(jnp.float32), (f, net_h, net_w, 3),
                    "bilinear")
            else:
                flow_in = frames
            pairs = preprocess_pair(flow_in[:-1], flow_in[1:],
                                    cfg.flow.rgb_max)
            flow_q = flow_model.apply(flow_vars, pairs, train=False)
            # handles both output conventions (quarter-res/div_flow vs the
            # FlowNet2 cascade's final full-res flow)
            flows = postprocess_flow(flow_q, cfg.flow.variant, (h, w),
                                     div_flow)

            # ---- 2. pose on all persons of all frames, one call; crops
            # emitted in the model compute dtype (bf16) to halve the
            # crop->conv HBM traffic
            crop_dtype = jnp.dtype(cfg.model.dtype)
            crops = jax.vmap(
                lambda im, c, s: crop_resize_normalize(
                    im, c, s, (img_h, img_w), mean, std,
                    out_dtype=crop_dtype)
            )(frames, centers, scales)                       # (F, P, h, w, 3)
            crops = crops.reshape(f * p, img_h, img_w, 3)
            if flip_test:
                both = jnp.concatenate([crops, crops[:, :, ::-1, :]], axis=0)
                hm = pose_model.apply(pose_vars, both, train=False)
                hm = merge_flip_test(hm[: f * p], hm[f * p:],
                                     COCO_FLIP_PAIRS,
                                     shift=cfg.test.shift_heatmap)
            else:
                hm = pose_model.apply(pose_vars, crops, train=False)
            preds, maxvals = get_final_preds(
                hm, centers.reshape(f * p, 2), scales.reshape(f * p, 2),
                post_process=cfg.test.post_process)
            preds = preds.reshape(f, p, -1, 2)
            maxvals = maxvals.reshape(f, p, -1)
            scores = rescore(det_scores.reshape(f * p),
                             maxvals.reshape(f * p, -1),
                             cfg.test.in_vis_thre).reshape(f, p)
            valid = det_valid & (scores >= cfg.track.pose_score_thre)

            # ---- 3. sequential id chain (cheap), lax.scan over frames
            # frame 0 seeds the tracks
            ids0, next_id0 = _assign_ids(
                jnp.full((p,), -1, jnp.int32), valid[0],
                jnp.zeros((p,), jnp.int32), jnp.asarray(0, jnp.int32))

            def step(carry, xs):
                tj, tvalid, tids, nid = carry
                cj, cvalid, flow_t = xs
                prop = propagate_poses(tj, flow_t)
                sim = oks_matrix(prop, pose_area(prop), cj, pose_area(cj))
                assign = greedy_match(sim, thr, tvalid, cvalid)
                ids, nid = _assign_ids(assign, cvalid, tids, nid)
                return (cj, cvalid, jnp.maximum(ids, 0), nid), ids

            carry0 = (preds[0], valid[0], jnp.maximum(ids0, 0), next_id0)
            (_, _, _, _), ids_rest = jax.lax.scan(
                step, carry0, (preds[1:], valid[1:], flows))
            all_ids = jnp.concatenate([ids0[None], ids_rest], axis=0)
            return preds, maxvals, scores, all_ids, valid

        self._clip_fn = jax.jit(clip_fn)
        # clips are the data-parallel axis: vmap over a leading clip dim;
        # shard it across the mesh and XLA runs one clip per device group
        # (the multi-chip serving layout — SURVEY.md section 6.8)
        self._clips_fn = jax.jit(
            jax.vmap(clip_fn, in_axes=(None, None, 0, 0, 0, 0, 0)))
        self.pose_vars = pose_vars
        self.flow_vars = flow_vars

    def prepare(self, frames: np.ndarray, det_boxes: np.ndarray,
                det_scores: np.ndarray, det_valid: np.ndarray):
        """Host prep + H2D: returns the device-resident arg tuple for
        run_prepared. Split out so callers can overlap the transfer of clip
        t+1 with the compute of clip t (data/loader.device_prefetch style)."""
        f, p = det_scores.shape
        centers = np.zeros((f, p, 2), np.float32)
        scales = np.full((f, p, 2), 1e-3, np.float32)
        for t in range(f):
            # clamp only w/h (padded zero boxes would give zero scale);
            # x/y may legitimately be negative for off-edge detections
            boxes_t = np.concatenate(
                [det_boxes[t][:, :2],
                 np.maximum(det_boxes[t][:, 2:], 1e-3)], axis=1)
            c, s = batched_box_to_center_scale(boxes_t, self.aspect_ratio)
            centers[t], scales[t] = c, s
        return (jnp.asarray(frames), jnp.asarray(centers),
                jnp.asarray(scales),
                jnp.asarray(det_scores, jnp.float32),
                jnp.asarray(det_valid, bool))

    def run_prepared(self, device_args):
        """Device-side tracking of a prepared clip; returns device arrays."""
        return self._clip_fn(self.pose_vars, self.flow_vars, *device_args)

    def track_clips(self, frames: np.ndarray, det_boxes: np.ndarray,
                    det_scores: np.ndarray, det_valid: np.ndarray,
                    sharding=None):
        """Batched clips: frames (C, F, H, W, 3), det_* (C, F, P, ...).

        With ``sharding`` (e.g. parallel.batch_sharding(mesh)) the clip dim
        is split across devices — pure data parallelism, no collectives in
        the hot path. Returns the track_clip dict with a leading C dim."""
        c = frames.shape[0]
        prepped = [self.prepare(frames[i], det_boxes[i], det_scores[i],
                                det_valid[i]) for i in range(c)]
        args = [jnp.stack([p[j] for p in prepped]) for j in range(5)]
        if sharding is not None:
            args = [jax.device_put(a, sharding) for a in args]
        preds, maxvals, scores, ids, valid = self._clips_fn(
            self.pose_vars, self.flow_vars, *args)
        ids = np.asarray(ids)
        valid = np.asarray(valid)
        ids = np.where(valid, ids, -1)
        return {"joints": np.asarray(preds), "maxvals": np.asarray(maxvals),
                "scores": np.asarray(scores), "ids": ids, "valid": valid}

    def track_clip(self, frames: np.ndarray, det_boxes: np.ndarray,
                   det_scores: np.ndarray, det_valid: np.ndarray):
        """frames: (F, H, W, 3); det_boxes: (F, P, 4) xywh (padded);
        det_scores/det_valid: (F, P). Returns dict of numpy arrays:
        joints (F, P, K, 2), maxvals (F, P, K), scores (F, P), ids (F, P)
        (-1 = invalid), valid (F, P)."""
        preds, maxvals, scores, ids, valid = self.run_prepared(
            self.prepare(frames, det_boxes, det_scores, det_valid))
        ids = np.asarray(ids)
        valid = np.asarray(valid)
        ids = np.where(valid, ids, -1)
        return {"joints": np.asarray(preds), "maxvals": np.asarray(maxvals),
                "scores": np.asarray(scores), "ids": ids, "valid": valid}


def pad_detections(per_frame_boxes, per_frame_scores, max_persons: int):
    """Ragged per-frame detections -> (F, P, 4), (F, P), (F, P) padded."""
    f = len(per_frame_boxes)
    boxes = np.zeros((f, max_persons, 4), np.float32)
    scores = np.zeros((f, max_persons), np.float32)
    valid = np.zeros((f, max_persons), bool)
    for t in range(f):
        b = np.asarray(per_frame_boxes[t], np.float32).reshape(-1, 4)
        s = np.asarray(per_frame_scores[t], np.float32).reshape(-1)
        n = min(len(b), max_persons)
        if len(b) > max_persons:  # keep highest-scoring
            order = np.argsort(-s)[:max_persons]
            b, s = b[order], s[order]
        boxes[t, :n] = b[:n]
        scores[t, :n] = s[:n]
        valid[t, :n] = True
    return boxes, scores, valid
