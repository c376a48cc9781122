"""FlowTrack tracker: detect + flow-propagate -> unified NMS -> pose ->
greedy OKS matching -> track IDs.

Behavior contract (SURVEY.md section 4.4; reference lineage: tracking/ /
demo.py, algorithm per arXiv:1804.06208 section 4):

  * propagate: joints'_t = joints_{t-1} + flow(joints_{t-1}) (bilinear
    gather); propagated box = bbox(joints') expanded by 15%.
  * candidate boxes = NMS(detections U propagated boxes) — the "unified
    suppression" that recovers detector misses.
  * similarity(track i, candidate j) = OKS(flow-propagated pose_i, pose_j).
  * greedy assignment: repeatedly take the global max above the threshold,
    assign that track id, mask row+column; unmatched candidates start new
    tracks.

TPU-native design: propagation, box geometry, the similarity matrix and the
greedy assignment are all static-shape jnp (the greedy loop is a
``lax.scan`` of masked argmaxes — SURVEY.md section 3 "Greedy OKS
matching"); ragged person counts are padded to ``max_persons`` with validity
masks that cannot perturb the greedy order (invalid entries read -inf).
The host only supplies detection boxes and collects track ids per frame.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from flowtrack_tpu.config import Config
from flowtrack_tpu.ops.nms import iou_matrix, greedy_nms_from_matrix
from flowtrack_tpu.ops.oks import oks_matrix, pose_area
from flowtrack_tpu.ops.warp import flow_gather


# ---------------------------------------------------------------------------
# Device-side primitives
# ---------------------------------------------------------------------------

def propagate_poses(joints, flow):
    """joints: (M, K, 2) image coords; flow: (H, W, 2) -> (M, K, 2).

    joint' = joint + flow[joint] (bilinear; edge-clamped)."""
    return joints + flow_gather(flow, joints)


def boxes_from_poses(joints, expand: float = 0.15, conf=None,
                     conf_thre: float = 0.0):
    """(M, K, 2) -> (M, 4) xyxy boxes around the (confident) joints,
    expanded by ``expand`` on each side."""
    if conf is not None:
        ok = (conf > conf_thre)[..., None]
        big = jnp.asarray(1e9, joints.dtype)
        mins = jnp.min(jnp.where(ok, joints, big), axis=-2)
        maxs = jnp.max(jnp.where(ok, joints, -big), axis=-2)
    else:
        mins = jnp.min(joints, axis=-2)
        maxs = jnp.max(joints, axis=-2)
    wh = jnp.maximum(maxs - mins, 0.0)
    mins = mins - wh * expand
    maxs = maxs + wh * expand
    return jnp.concatenate([mins, maxs], axis=-1)


def greedy_match(sim, thr, row_valid=None, col_valid=None):
    """Greedy global-max assignment (SURVEY.md section 4.4 matching loop).

    sim: (M, N) track-to-candidate similarity. Returns (N,) int32: the row
    (track index) assigned to each column (candidate), -1 if none. Static
    shapes, lax.scan — jit/vmap safe.
    """
    m, n = sim.shape
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    sim = jnp.asarray(sim, jnp.float32)
    if row_valid is not None:
        sim = jnp.where(row_valid[:, None], sim, neg)
    if col_valid is not None:
        sim = jnp.where(col_valid[None, :], sim, neg)

    def step(state, _):
        s, assign = state
        idx = jnp.argmax(s)
        i, j = idx // n, idx % n
        ok = s[i, j] > thr
        assign = assign.at[j].set(jnp.where(ok, i, assign[j]))
        row_mask = jnp.arange(m) == i
        col_mask = jnp.arange(n) == j
        kill = row_mask[:, None] | col_mask[None, :]
        s = jnp.where(ok & kill, neg, s)
        # if nothing exceeded thr we are done; make the state a fixed point
        s = jnp.where(ok, s, jnp.full_like(s, neg))
        return (s, assign), None

    init = (sim, jnp.full((n,), -1, jnp.int32))
    # fully unrolled: the scan is short (min(m, n) ~ 9-16 slots in the
    # tracker paths) and runs INSIDE the per-frame id/recovery scans, so
    # each iteration otherwise pays a while-loop round trip per frame
    # per slot (device trace: the scans were 13% of the single-stream
    # clip program)
    (_, assign), _ = jax.lax.scan(step, init, None, length=min(m, n),
                                  unroll=True)
    return assign


@functools.partial(jax.jit, static_argnames=("expand",))
def propagate_and_boxes(track_joints, flow, expand: float):
    """Fused per-frame device step for the streaming tracker: propagate
    padded track poses through the flow and derive their expanded boxes in
    ONE jitted program (eager dispatch paid a retrace + two host round
    trips per frame)."""
    prop = propagate_poses(track_joints, flow)
    return prop, boxes_from_poses(prop, expand)


@jax.jit
def nms_boxes_padded(xyxy, scores, valid, thresh):
    """Jitted greedy IoU NMS over a PADDED candidate set (the streaming
    tracker buckets per-frame counts to max_persons multiples so the scan
    compiles once per bucket instead of per distinct N; thresh is traced).
    Padding is greedy-order-safe: invalid entries read -inf."""
    return greedy_nms_from_matrix(iou_matrix(xyxy, xyxy), scores, thresh,
                                  valid)


@functools.partial(jax.jit, static_argnames=("track_thr",))
def match_propagated(prop_joints, track_valid, cand_joints, cand_valid,
                     track_thr: float = 0.5):
    """Greedy OKS assignment given ALREADY-propagated track poses.

    prop_joints: (M, K, 2); cand_joints: (N, K, 2) -> assign (N,) int32
    row index or -1."""
    areas_t = pose_area(prop_joints)
    areas_c = pose_area(cand_joints)
    sim = oks_matrix(prop_joints, areas_t, cand_joints, areas_c)
    return greedy_match(sim, track_thr, track_valid, cand_valid)


@functools.partial(jax.jit, static_argnames=("track_thr",))
def match_step(track_joints, track_valid, cand_joints, cand_valid,
               flow, track_thr: float = 0.5):
    """One fused device step of the matcher: propagate tracks through the
    flow, build the OKS similarity matrix, greedy-assign.

    track_joints: (M, K, 2); cand_joints: (N, K, 2); flow: (H, W, 2).
    Returns (assign (N,) int32 row index or -1, propagated (M, K, 2))."""
    prop = propagate_poses(track_joints, flow)
    assign = match_propagated(prop, track_valid, cand_joints, cand_valid,
                              track_thr=track_thr)
    return assign, prop


# ---------------------------------------------------------------------------
# Host-side orchestration
# ---------------------------------------------------------------------------

@dataclass
class Track:
    track_id: int
    joints: np.ndarray          # (K, 2) image coords
    maxvals: np.ndarray         # (K,)
    score: float
    last_frame: int


@dataclass
class FlowTracker:
    """Sequential per-frame tracker (O(1) state: previous tracks + one flow).

    pose_fn(image, boxes (B, 4) xywh, scores (B,)) -> (joints (B, K, 2),
    maxvals (B, K), rescored (B,)) — typically pipeline.PosePredictor.
    flow_fn(prev_image, image) -> (H, W, 2) full-resolution flow, or None
    for the flow-free ablation (the paper's non-flow baseline: detector
    boxes only, greedy OKS matching on UNPROPAGATED poses).
    """

    cfg: Config
    pose_fn: Callable
    flow_fn: Optional[Callable] = None
    tracks: List[Track] = field(default_factory=list)
    next_id: int = 0
    _prev_image: Optional[np.ndarray] = None
    _frame: int = 0

    def reset(self):
        self.tracks = []
        self.next_id = 0
        self._prev_image = None
        self._frame = 0

    def step(self, image: np.ndarray, det_boxes: np.ndarray,
             det_scores: np.ndarray) -> List[Track]:
        """Process one frame. det_boxes: (D, 4) xywh; det_scores: (D,).
        Returns the updated live track list (also kept as state)."""
        tcfg = self.cfg.track
        flow = None
        if self.flow_fn is not None and self._prev_image is not None \
                and self.tracks:
            flow = np.asarray(self.flow_fn(self._prev_image, image))

        # --- propagated boxes from surviving tracks
        prop_boxes_xywh = np.zeros((0, 4), np.float32)
        prop_scores = np.zeros((0,), np.float32)
        k = self.cfg.model.num_joints
        track_joints = np.zeros((0, k, 2), np.float32)
        if self.tracks and flow is not None:
            track_joints = np.stack([t.joints for t in self.tracks])
            # pad the track dim to a max_persons bucket so the jitted
            # propagate+boxes program compiles once per bucket, not per
            # track count
            q = tcfg.max_persons
            m = len(self.tracks)
            mpad = -(-m // q) * q
            tj = np.zeros((mpad, k, 2), np.float32)
            tj[:m] = track_joints
            prop_d, pb_d = propagate_and_boxes(
                jnp.asarray(tj), jnp.asarray(flow), tcfg.box_expand)
            # one async-batched fetch, not two serialized forced
            # readbacks (a relay host charges a round trip per readback)
            prop, pb = jax.device_get([prop_d, pb_d])
            prop, pb = prop[:m], pb[:m]
            prop_boxes_xywh = np.concatenate(
                [pb[:, :2], pb[:, 2:] - pb[:, :2]], axis=1)
            prop_scores = np.array([t.score for t in self.tracks],
                                   np.float32)

        # --- unified suppression over det + propagated boxes
        det_boxes = np.asarray(det_boxes, np.float32).reshape(-1, 4)
        det_scores = np.asarray(det_scores, np.float32).reshape(-1)
        boxes = np.concatenate([det_boxes, prop_boxes_xywh], axis=0)
        scores = np.concatenate([det_scores, prop_scores], axis=0)
        good = (boxes[:, 2] > 1) & (boxes[:, 3] > 1)
        boxes, scores = boxes[good], scores[good]
        if len(boxes) and tcfg.box_nms_thre < 1.0:
            xyxy = np.concatenate(
                [boxes[:, :2], boxes[:, :2] + boxes[:, 2:]], axis=1)
            # bucket the candidate count (see propagate_and_boxes): one
            # compiled NMS scan per bucket instead of per distinct N
            q = tcfg.max_persons
            n = len(boxes)
            npad = -(-n // q) * q
            bx = np.zeros((npad, 4), np.float32)
            bx[:n] = xyxy
            sc = np.zeros((npad,), np.float32)
            sc[:n] = scores
            nv = np.zeros((npad,), bool)
            nv[:n] = True
            keep = np.asarray(nms_boxes_padded(
                jnp.asarray(bx), jnp.asarray(sc), jnp.asarray(nv),
                tcfg.box_nms_thre))[:n]
            boxes, scores = boxes[keep], scores[keep]

        # --- pose on the union
        if len(boxes):
            joints, maxvals, rescored = jax.device_get(
                list(self.pose_fn(image, boxes, scores)))
            ok = rescored >= tcfg.pose_score_thre
            joints, maxvals, rescored = joints[ok], maxvals[ok], rescored[ok]
        else:
            joints = np.zeros((0, k, 2), np.float32)
            maxvals = np.zeros((0, k), np.float32)
            rescored = np.zeros((0,), np.float32)

        # --- greedy OKS id assignment against flow-propagated tracks
        # (or the tracks as-is in the flow-free ablation: the paper's
        # non-flow baseline matches on UNPROPAGATED poses — skipping the
        # match entirely would mint fresh ids every frame).
        # Pad both sides to the static max_persons budget so match_step
        # compiles once per shape bucket instead of per (M, N) pair
        # (padding is greedy-order-safe: invalid entries read -inf,
        # tested); pmax is rounded up to a multiple of max_persons so
        # crowded frames don't recompile per person-count.
        assign = np.full((len(joints),), -1, np.int32)
        if len(self.tracks) and len(joints):
            if flow is None:
                prop = np.stack([t.joints for t in self.tracks])
            q = tcfg.max_persons
            pmax = -(-max(q, len(self.tracks), len(joints)) // q) * q
            # reuse the propagation already computed for the prop boxes —
            # no second flow_gather per frame
            tj = np.zeros((pmax, k, 2), np.float32)
            tj[: len(prop)] = prop
            tv = np.zeros((pmax,), bool)
            tv[: len(self.tracks)] = True
            cj = np.zeros((pmax, k, 2), np.float32)
            cj[: len(joints)] = joints
            cv = np.zeros((pmax,), bool)
            cv[: len(joints)] = True
            assign = np.asarray(match_propagated(
                jnp.asarray(tj), jnp.asarray(tv),
                jnp.asarray(cj), jnp.asarray(cv),
                track_thr=tcfg.track_oks_thre))[: len(joints)]

        new_tracks: List[Track] = []
        for j in range(len(joints)):
            if assign[j] >= 0:
                tid = self.tracks[assign[j]].track_id
            else:
                tid = self.next_id
                self.next_id += 1
            new_tracks.append(Track(tid, joints[j], maxvals[j],
                                    float(rescored[j]), self._frame))
        self.tracks = new_tracks
        self._prev_image = image
        self._frame += 1
        return new_tracks

    def track_sequence(self, frames, detections) -> List[List[Track]]:
        """frames: iterable of RGB images; detections: per-frame
        (boxes (D,4) xywh, scores (D,)). Returns per-frame track lists.

        With ``track.keyframe_interval`` = k > 1, detections are consumed
        only on every k-th frame; in between, tracks ride purely on the
        flow-propagated boxes (the paper's keyframe-detection variant)."""
        self.reset()
        k = max(1, self.cfg.track.keyframe_interval)
        out = []
        for t, (img, (boxes, scores)) in enumerate(zip(frames, detections)):
            if t % k != 0:
                boxes = np.zeros((0, 4), np.float32)
                scores = np.zeros((0,), np.float32)
            out.append(list(self.step(img, boxes, scores)))
        return out


def tracks_to_posetrack_json(per_frame_tracks, image_ids):
    """Serialize tracker output to PoseTrack-format annotations."""
    annotations = []
    for image_id, tracks in zip(image_ids, per_frame_tracks):
        for t in tracks:
            kp = []
            for (x, y), v in zip(t.joints, t.maxvals):
                kp += [float(x), float(y), float(v)]
            annotations.append({
                "image_id": int(image_id),
                "track_id": int(t.track_id),
                "keypoints": kp,
                "scores": [float(v) for v in t.maxvals],
                "score": float(t.score),
                "category_id": 1,
            })
    return annotations
