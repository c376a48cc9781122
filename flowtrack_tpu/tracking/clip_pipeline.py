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
(joints, ids, scores) out.

Detector-miss recovery (SURVEY.md section 4.4: "people missed by the
detector are still found") runs as a second, budgeted pose pass:

  3a. a cheap ``lax.scan`` over frames (no pose model) greedy-OKS-matches
      flow-propagated tracks against the detector candidates and emits a
      flow-propagated box for every unmatched track (up to
      ``track.max_recovered`` slots/frame, chained through up to
      ``track.max_miss_age`` consecutive misses);
  3b. the clip-wide top-``ceil(F * track.recover_budget)`` recovery boxes by
      track score are gathered into ONE dense crop batch, posed (with flip
      test), rescored, and scattered back — so the recovery pose cost is a
      fixed small fraction of the detector-pose cost instead of F x R;
  4.  the final id scan runs over the UNION candidate set (P detector slots
      + R recovery slots per frame).

Semantics vs the streaming FlowTracker (tracker.py): the streaming path
feeds ALL propagated boxes through a score-ordered unified NMS with the
detections; the clip path emits propagated boxes only for OKS-unmatched
tracks and suppresses them against overlapping valid detections
(IoU > track.box_nms_thre, detection wins) — for well-detected persons both
reduce to the same candidate set, and detector misses are recovered with
the same propagate->pose->match chain (MOTA-parity tested against the
streaming tracker on dropout scenarios).

Shapes are static: F frames x (P + max_recovered) persons (padded, masked).

Budgeted-recovery edge (deliberate trade, documented): when a clip's
recovery candidates EXCEED the clip-wide budget, dropping an intermediate
frame's candidate breaks that track's id chain (the later recovery gets a
fresh id) — a deviation from the unbudgeted streaming tracker that only
appears under budget pressure; the default ``recover_budget`` of one crop
per frame makes it unreachable for realistic miss rates. Stage 3a also
chains through candidates regardless of whether 3b's pose later rejects
them (3a is pose-free by design).

Cross-clip continuity (SURVEY.md section 4.4's sequential contract): a clip
may be SEEDED with the previous clip's final track state — last-frame union
poses, validity, scores, miss ages and GLOBAL ids plus the next-id counter.
The seed is the state AT the clip's first frame (consecutive clips overlap
by that one frame, utils/video.clip_spans), so both device scans start from
a frame-0 step with IDENTITY propagation (run outside the scans — no flow
needed): frame 0 re-matches the seed against its candidates
(identical frame -> OKS ~ 1 for re-detected persons) and, crucially, a seed
track UNDETECTED at the boundary frame emits a recovery candidate at frame
0 via the normal 3a/3b machinery — occlusion exactly at a clip boundary no
longer breaks the id (miss age is NOT re-incremented at the seeded overlap
frame: the previous clip already counted that physical frame's miss). With
an empty seed the maths reduce exactly to the unseeded clip (no valid seed
rows -> no frame-0 matches, no frame-0 recovery, fresh ids from 0).
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
    PIXEL_STD,
    Config,
)
from flowtrack_tpu.models.flownet import postprocess_flow, preprocess_pair
from flowtrack_tpu.ops.crop import crop_resize_normalize
from flowtrack_tpu.ops.decode import get_final_preds, rescore
from flowtrack_tpu.ops.heatmap import merge_flip_test
from flowtrack_tpu.ops.nms import iou_matrix
from flowtrack_tpu.ops.oks import oks_matrix, pose_area
from flowtrack_tpu.pipeline import batched_box_to_center_scale
from flowtrack_tpu.tracking.tracker import (
    boxes_from_poses,
    greedy_match,
    propagate_poses,
)

# Unroll factor for the two per-frame scans (recovery generation + id
# chain). Their bodies are tiny relative to the batched pose/flow passes,
# so the while-loop round trip per frame is measurable (device trace:
# "while" was 13.2% of the headline clip program); a modest unroll lets
# XLA pipeline consecutive frames. Env-overridable for on-chip A/B.
import os as _os
_SCAN_UNROLL = int(_os.environ.get("FLOWTRACK_SCAN_UNROLL", "4"))


def _box_xyxy_to_center_scale(boxes, aspect_ratio: float,
                              scale_padding: float = 1.25):
    """jnp twin of pipeline.batched_box_to_center_scale for xyxy boxes
    (aspect-keeping scale in PIXEL_STD units, 1.25 padding)."""
    w = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-3)
    h = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-3)
    centers = jnp.stack([boxes[:, 0] + w * 0.5, boxes[:, 1] + h * 0.5],
                        axis=1)
    wide = w > aspect_ratio * h
    h = jnp.where(wide, w / aspect_ratio, h)
    w = jnp.where(~wide & (w < aspect_ratio * h), h * aspect_ratio, w)
    scales = jnp.stack([w, h], axis=1) / PIXEL_STD * scale_padding
    return centers, scales


def _chunked_apply(fn, x, chunk: int):
    """Apply ``fn`` (batch-elementwise: per-item results independent of
    batch composition) to ``x`` in lax.map chunks of ``chunk`` leading
    items, with an un-chunked tail call for the remainder. Bounds peak
    activation memory at ~one chunk's worth; results identical to one
    call. chunk <= 0 or chunk >= len(x) degrades to a single call."""
    n = x.shape[0]
    if chunk <= 0 or n <= chunk:
        return fn(x)
    k = n // chunk
    main = jax.lax.map(fn, x[:k * chunk].reshape((k, chunk) + x.shape[1:]))
    main = main.reshape((k * chunk,) + main.shape[2:])
    if n % chunk:
        return jnp.concatenate([main, fn(x[k * chunk:])], axis=0)
    return main


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
        tcfg = cfg.track
        recover = tcfg.clip_recover and tcfg.max_recovered > 0
        self.num_slots = self.max_persons + (tcfg.max_recovered
                                             if recover else 0)
        crop_dtype = jnp.dtype(cfg.model.dtype)

        pose_chunk = tcfg.pose_chunk

        def pose_heatmaps(pose_vars, crops):
            """(M, h, w, 3) crops -> flip-merged heatmaps, one model call.
            With flip_test the double batch lives only inside this call."""
            m = crops.shape[0]
            if flip_test:
                both = jnp.concatenate([crops, crops[:, :, ::-1, :]], axis=0)
                hm = pose_model.apply(pose_vars, both, train=False)
                return merge_flip_test(hm[:m], hm[m:], COCO_FLIP_PAIRS,
                                       shift=cfg.test.shift_heatmap)
            return pose_model.apply(pose_vars, crops, train=False)

        def pose_on_crops(pose_vars, crops, centers_flat, scales_flat,
                          det_scores_flat):
            """crops (N, h, w, 3) -> decoded preds/maxvals/rescored (N, ...)
            with the fused flip-test double batch.

            track.pose_chunk > 0 runs the backbone via lax.map over
            fixed-size chunks (_chunked_apply): each crop's result is
            independent (inference BN is frozen), so chunking only caps
            the peak live activation memory — the lever that lets more
            independent streams batch into one serving program (bench
            BENCH_CLIPS) without exceeding HBM. Chunks still carry
            hundreds of crops so the MXU stays saturated."""
            hm = _chunked_apply(lambda c: pose_heatmaps(pose_vars, c),
                                crops, pose_chunk)
            preds, maxvals = get_final_preds(
                hm, centers_flat, scales_flat,
                post_process=cfg.test.post_process,
                blur_kernel=cfg.test.blur_kernel)
            scores = rescore(det_scores_flat, maxvals, cfg.test.in_vis_thre)
            return preds, maxvals, scores

        def recovery_pass(pose_vars, frames, preds, valid, scores,
                          det_boxes, flows, frame_valid, real_frames,
                          seed):
            """Stages 3a/3b (module docstring): emit flow-propagated boxes
            for OKS-unmatched tracks, pose the clip-wide top-budget boxes in
            one dense batch, scatter back to (F, R) candidate slots.

            The carry starts from ``seed`` = (joints, valid, scores, ages)
            over the T union slots — the previous clip's final state at
            this clip's frame 0, or the empty seed (docstring "Cross-clip
            continuity"). The seed is AT frame 0's own timestamp, so its
            step runs OUTSIDE the scan with identity propagation (no zero
            flow materialized, scan stays at F-1 steps — measured 5% of
            headline throughput vs the prepended-zero-flow formulation) and
            without the miss-age increment (the previous clip already
            counted that physical frame's miss).

            ``real_frames`` (TRACED int32 scalar, or None for a full
            clip) is the REAL frame count of a padded (ragged) clip: the
            static top-k is sized from the padded shape, but selections
            ranked past the real-count budget are invalidated, so a
            padded run poses exactly the crops an unpadded trace would
            (sizing the budget from the padded count would give it MORE
            recovery crops — review finding). Traced, not static, so all
            ragged lengths share ONE compiled program.
            """
            f, p = valid.shape
            r = tcfg.max_recovered
            t_slots = p + r
            budget = min(f * r,
                         max(r, int(np.ceil(f * tcfg.recover_budget))))
            neg = jnp.asarray(-jnp.inf, jnp.float32)

            def gen_core(carry, dj, dv, ds, dbox, prop, fv_t, inc_t):
                tj, tv, ts, ta = carry
                sim = oks_matrix(prop, pose_area(prop), dj, pose_area(dj))
                assign = greedy_match(sim, thr, tv, dv)          # (p,)
                row_matched = jnp.any(
                    (assign[None, :] == jnp.arange(t_slots)[:, None])
                    & (assign >= 0)[None, :], axis=1)
                miss = tv & ~row_matched & (ta < tcfg.max_miss_age)
                top_s, top_i = jax.lax.top_k(jnp.where(miss, ts, neg), r)
                # padded (invalid) frames must not emit candidates: they
                # would carry real track scores into the clip-wide budgeted
                # top_k and could evict genuine recoveries on real frames
                rec_v = jnp.isfinite(top_s) & fv_t
                rec_j = prop[top_i]
                rec_s = ts[top_i]
                rec_a = ta[top_i] + inc_t
                rec_box = boxes_from_poses(rec_j, tcfg.box_expand)  # xyxy
                if tcfg.box_nms_thre < 1.0:
                    # unified suppression, detection wins (module docstring)
                    iou = iou_matrix(rec_box, dbox)
                    rec_v &= ~jnp.any((iou > tcfg.box_nms_thre)
                                      & dv[None, :], axis=1)
                carry = (jnp.concatenate([dj, rec_j]),
                         jnp.concatenate([dv, rec_v]),
                         jnp.concatenate([ds, rec_s]),
                         jnp.concatenate([jnp.zeros((p,), jnp.int32),
                                          rec_a]))
                return carry, (rec_box, rec_v, rec_s, rec_a)

            def gen_step(carry, xs):
                dj, dv, ds, dbox, flow_t, fv_t = xs
                prop = propagate_poses(carry[0], flow_t)
                return gen_core(carry, dj, dv, ds, dbox, prop, fv_t,
                                jnp.asarray(1, jnp.int32))

            # frame 0: seed -> frame 0, identity propagation, no age bump
            carry0, (rb0, rv0, rs0, ra0) = gen_core(
                seed, preds[0], valid[0], scores[0], det_boxes[0], seed[0],
                frame_valid[0], jnp.asarray(0, jnp.int32))
            _, (rec_box, rec_v, rec_s, rec_ages) = jax.lax.scan(
                gen_step, carry0,
                (preds[1:], valid[1:], scores[1:], det_boxes[1:], flows,
                 frame_valid[1:]), unroll=_SCAN_UNROLL)
            rec_box = jnp.concatenate([rb0[None], rec_box])
            rec_v = jnp.concatenate([rv0[None], rec_v])
            rec_s = jnp.concatenate([rs0[None], rec_s])
            rec_ages = jnp.concatenate([ra0[None], rec_ages])

            # ---- 3b. clip-wide budgeted selection -> ONE dense pose batch
            k = preds.shape[2]
            flat_s = jnp.where(rec_v.reshape(-1),
                               rec_s.reshape(-1).astype(jnp.float32), neg)
            g_s, g_idx = jax.lax.top_k(flat_s, budget)
            sel_valid = jnp.isfinite(g_s)
            if real_frames is not None:
                # effective budget from the REAL frame count: top_k is
                # sorted descending, so masking by rank reproduces the
                # unpadded run's smaller-k selection exactly
                eff = jnp.minimum(
                    f * r,
                    jnp.maximum(r, jnp.ceil(
                        real_frames.astype(jnp.float32)
                        * tcfg.recover_budget).astype(jnp.int32)))
                sel_valid &= jnp.arange(budget) < eff
            sel_box = rec_box.reshape(-1, 4)[g_idx]
            sel_score = rec_s.reshape(-1)[g_idx]
            sel_frame = g_idx // r
            sel_c, sel_sc = _box_xyxy_to_center_scale(sel_box,
                                                      self.aspect_ratio)
            crops = jax.vmap(
                lambda im, c, s: crop_resize_normalize(
                    im, c[None], s[None], (img_h, img_w), mean, std,
                    out_dtype=crop_dtype)[0]
            )(frames[sel_frame], sel_c, sel_sc)          # (G, h, w, 3)
            preds2, maxvals2, scores2 = pose_on_crops(
                pose_vars, crops, sel_c, sel_sc, sel_score)
            valid2 = sel_valid & (scores2 >= tcfg.pose_score_thre)

            # scatter back into the static (F, R) recovery slots; invalid
            # selections (rank/finite-masked) write ZEROS so the padded
            # and unpadded programs (different static top-k widths)
            # produce identical arrays, not just identical valid masks
            rec_preds = jnp.zeros((f * r, k, 2)).at[g_idx].set(
                jnp.where(sel_valid[:, None, None], preds2, 0.0))
            rec_maxvals = jnp.zeros((f * r, k)).at[g_idx].set(
                jnp.where(sel_valid[:, None], maxvals2, 0.0))
            rec_scores = jnp.zeros((f * r,)).at[g_idx].set(
                jnp.where(sel_valid, scores2, 0.0))
            rec_valid = jnp.zeros((f * r,), bool).at[g_idx].set(valid2)
            return (rec_preds.reshape(f, r, k, 2),
                    rec_maxvals.reshape(f, r, k),
                    rec_scores.reshape(f, r),
                    rec_valid.reshape(f, r),
                    rec_ages)

        def clip_fn(pose_vars, flow_vars, frames, centers, scales,
                    det_scores, det_valid, det_boxes, frame_valid,
                    seed_joints, seed_valid, seed_scores, seed_ages,
                    seed_ids, next_id0, real_frames=None):
            f, h, w, _ = frames.shape
            p = centers.shape[1]

            # ---- 1. flow on all pairs, one call. FlowNet needs /64 input
            # dims; resize the flow branch and rescale components back
            # (same convention as pipeline.FlowPredictor).
            if f > 1:
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
                # track.flow_chunk: same memory cap for the flow net —
                # the FlowNet2-cascade config is HBM-bound on this chip
                # (63 full-res pairs in one batch)
                flow_q = _chunked_apply(
                    lambda p: flow_model.apply(flow_vars, p, train=False),
                    pairs, tcfg.flow_chunk)
                # handles both output conventions (quarter-res/div_flow vs
                # the FlowNet2 cascade's final full-res flow)
                flows = postprocess_flow(flow_q, cfg.flow.variant, (h, w),
                                         div_flow)
            else:
                flows = jnp.zeros((0, h, w, 2), jnp.float32)

            # ---- 2. pose on all detector persons of all frames, one call;
            # crops emitted in the model compute dtype (bf16) to halve the
            # crop->conv HBM traffic
            crops = jax.vmap(
                lambda im, c, s: crop_resize_normalize(
                    im, c, s, (img_h, img_w), mean, std,
                    out_dtype=crop_dtype)
            )(frames, centers, scales)                       # (F, P, h, w, 3)
            preds, maxvals, scores = pose_on_crops(
                pose_vars, crops.reshape(f * p, img_h, img_w, 3),
                centers.reshape(f * p, 2), scales.reshape(f * p, 2),
                det_scores.reshape(f * p))
            preds = preds.reshape(f, p, -1, 2)
            maxvals = maxvals.reshape(f, p, -1)
            scores = scores.reshape(f, p)
            valid = det_valid & (scores >= tcfg.pose_score_thre)

            # ---- 3. detector-miss recovery (second budgeted pose pass)
            if recover:
                rec_seed = (seed_joints, seed_valid,
                            seed_scores.astype(jnp.float32),
                            seed_ages.astype(jnp.int32))
                rec_preds, rec_maxvals, rec_scores, rec_valid, rec_ages = \
                    recovery_pass(pose_vars, frames, preds, valid, scores,
                                  det_boxes, flows, frame_valid,
                                  real_frames, rec_seed)
                preds = jnp.concatenate([preds, rec_preds], axis=1)
                maxvals = jnp.concatenate([maxvals, rec_maxvals], axis=1)
                scores = jnp.concatenate([scores, rec_scores], axis=1)
                valid = jnp.concatenate([valid, rec_valid], axis=1)
                ages = jnp.concatenate(
                    [jnp.zeros((f, p), jnp.int32), rec_ages], axis=1)
            else:
                ages = jnp.zeros((f, p), jnp.int32)
            t_slots = preds.shape[1]

            # ---- 4. sequential id chain (cheap), lax.scan over frames.
            # Frame 0 matches the SEED (identity propagation — the seed is
            # at frame 0's own timestamp) outside the scan; an empty seed
            # mints fresh ids exactly as an unseeded clip would.
            def step(carry, xs):
                tj, tvalid, tids, nid = carry
                cj, cvalid, flow_t = xs
                prop = propagate_poses(tj, flow_t)
                sim = oks_matrix(prop, pose_area(prop), cj, pose_area(cj))
                assign = greedy_match(sim, thr, tvalid, cvalid)
                ids, nid = _assign_ids(assign, cvalid, tids, nid)
                return (cj, cvalid, jnp.maximum(ids, 0), nid), ids

            sim0 = oks_matrix(seed_joints, pose_area(seed_joints),
                              preds[0], pose_area(preds[0]))
            assign0 = greedy_match(sim0, thr, seed_valid, valid[0])
            ids0, nid0 = _assign_ids(
                assign0, valid[0],
                jnp.maximum(seed_ids.astype(jnp.int32), 0),
                next_id0.astype(jnp.int32))
            carry0 = (preds[0], valid[0], jnp.maximum(ids0, 0), nid0)
            (_, _, _, nid_fin), ids_rest = jax.lax.scan(
                step, carry0, (preds[1:], valid[1:], flows),
                unroll=_SCAN_UNROLL)
            all_ids = jnp.concatenate([ids0[None], ids_rest], axis=0)
            # final live-track state = next clip's seed (global ids); for a
            # padded (ragged/frame-sharded) clip the last REAL frame is
            # real_frames - 1 (traced gather), not the padded tail (whose
            # frames are all invalid and would drop every live track)
            last = (real_frames if real_frames is not None else f) - 1
            seed_out = (preds[last], valid[last], scores[last], ages[last],
                        jnp.where(valid[last], all_ids[last], 0), nid_fin)
            return preds, maxvals, scores, all_ids, valid, seed_out

        # real_frames is a TRACED kwarg (omitted for full clips): every
        # ragged length shares one compiled "padded" program instead of
        # recompiling per distinct real count
        self._clip_fn = jax.jit(clip_fn)
        # clips are the data-parallel axis: vmap over a leading clip dim;
        # shard it across the mesh and XLA runs one clip per device group
        # (the multi-chip serving layout — SURVEY.md section 6.8)
        self._clips_fn = jax.jit(
            jax.vmap(clip_fn, in_axes=(None, None) + (0,) * 13))
        self.pose_vars = pose_vars
        self.flow_vars = flow_vars
        self.pose_model = pose_model
        self.flow_model = flow_model
        self.num_joints = cfg.model.num_joints

    def empty_seed(self):
        """Zero cross-clip seed (no live tracks, next global id = 0):
        (joints (T, K, 2), valid (T,), scores (T,), ages (T,), ids (T,),
        next_id scalar) over the T = P + max_recovered union slots."""
        t, k = self.num_slots, self.num_joints
        return (jnp.zeros((t, k, 2), jnp.float32),
                jnp.zeros((t,), bool),
                jnp.zeros((t,), jnp.float32),
                jnp.zeros((t,), jnp.int32),
                jnp.zeros((t,), jnp.int32),
                jnp.zeros((), jnp.int32))

    def prepare(self, frames: np.ndarray, det_boxes: np.ndarray,
                det_scores: np.ndarray, det_valid: np.ndarray,
                frame_valid: Optional[np.ndarray] = None,
                frame_offset: int = 0):
        """Host prep + H2D: returns the device-resident arg tuple for
        run_prepared. Split out so callers can overlap the transfer of clip
        t+1 with the compute of clip t (data/loader.device_prefetch style).

        ``frame_offset``: the clip's first frame's GLOBAL index — keyframe
        masking must follow the VIDEO's cadence, not restart per clip
        (track_video_clips passes each span's start)."""
        f, p = det_scores.shape
        if frame_valid is None:
            frame_valid = np.ones((f,), bool)
        k = max(1, self.cfg.track.keyframe_interval)
        if k > 1:
            # keyframe-detection mode: non-keyframe detections are masked;
            # persons survive those frames through the recovery slots
            # (requires track.max_miss_age >= k - 1 and enough
            # recover_budget; see module docstring stage 3a/3b)
            det_valid = det_valid & (
                (np.arange(f) + frame_offset)[:, None] % k == 0)
        centers = np.zeros((f, p, 2), np.float32)
        scales = np.full((f, p, 2), 1e-3, np.float32)
        boxes_xyxy = np.zeros((f, p, 4), np.float32)
        for t in range(f):
            # clamp only w/h (padded zero boxes would give zero scale);
            # x/y may legitimately be negative for off-edge detections
            boxes_t = np.concatenate(
                [det_boxes[t][:, :2],
                 np.maximum(det_boxes[t][:, 2:], 1e-3)], axis=1)
            c, s = batched_box_to_center_scale(boxes_t, self.aspect_ratio)
            centers[t], scales[t] = c, s
            boxes_xyxy[t] = np.concatenate(
                [boxes_t[:, :2], boxes_t[:, :2] + boxes_t[:, 2:]], axis=1)
        return (jnp.asarray(frames), jnp.asarray(centers),
                jnp.asarray(scales),
                jnp.asarray(det_scores, jnp.float32),
                jnp.asarray(det_valid, bool),
                jnp.asarray(boxes_xyxy),
                jnp.asarray(frame_valid, bool))

    def run_prepared(self, device_args, budget_frames=None, seed=None):
        """Device-side tracking of a prepared clip; returns device arrays
        (..., seed_out) where seed_out is the final live-track state to pass
        as ``seed`` for the NEXT (1-frame-overlapping) clip — cross-clip id
        continuity stays entirely on device. Dispatch is async — callers can
        prepare/dispatch the next clip before fetching
        (utils/video.track_video_clips overlaps this way).
        ``budget_frames``: real frame count when the clip was padded (see
        recovery_pass)."""
        if seed is None:
            seed = self.empty_seed()
        kw = {}
        if budget_frames is not None:
            kw["real_frames"] = jnp.asarray(budget_frames, jnp.int32)
        return self._clip_fn(self.pose_vars, self.flow_vars, *device_args,
                             *seed, **kw)

    @staticmethod
    def to_host(device_out):
        """Device result tuple -> the track_clip numpy dict (the trailing
        seed_out stays device-side; fetch it via device_out[5]).

        All five leaves are fetched via ONE jax.device_get so their host
        copies start async before any is awaited — on a relay host
        (~30 ms per forced readback, CLAUDE.md) the five round trips
        overlap instead of serializing."""
        preds, maxvals, scores, ids, valid, _seed = device_out
        preds, maxvals, scores, ids, valid = jax.device_get(
            [preds, maxvals, scores, ids, valid])
        ids = np.where(valid, ids, -1)
        return {"joints": preds, "maxvals": maxvals,
                "scores": scores, "ids": ids, "valid": valid}

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
        args = [jnp.stack([p[j] for p in prepped]) for j in range(7)]
        if sharding is not None:
            args = [jax.device_put(a, sharding) for a in args]
        # independent clips: every lane gets the empty seed (tiny arrays —
        # left uncommitted; jit lays them out to match the clip axis)
        args += [jnp.broadcast_to(s, (c,) + s.shape)
                 for s in self.empty_seed()]
        return self.to_host(self._clips_fn(
            self.pose_vars, self.flow_vars, *args))

    def track_clip(self, frames: np.ndarray, det_boxes: np.ndarray,
                   det_scores: np.ndarray, det_valid: np.ndarray,
                   frame_sharding=None, seed=None, frame_offset: int = 0,
                   return_seed: bool = False):
        """frames: (F, H, W, 3); det_boxes: (F, P, 4) xywh (padded);
        det_scores/det_valid: (F, P). Returns dict of numpy arrays over
        T = P + track.max_recovered candidate slots (the trailing slots are
        flow-recovered detector misses): joints (F, T, K, 2), maxvals
        (F, T, K), scores (F, T), ids (F, T) (-1 = invalid), valid (F, T).

        Clip chaining: pass ``return_seed=True`` to get ``(dict, seed)``
        where ``seed`` is the device-resident final track state to feed the
        NEXT (1-frame-overlapping) clip's ``seed=``, and ``frame_offset`` =
        this clip's first GLOBAL frame index so keyframe-detection cadence
        follows the video, not the clip (utils/video.track_video_clips does
        both automatically).

        ``frame_sharding`` (a NamedSharding over the FRAME axis, e.g.
        ``parallel.batch_sharding(mesh)``) splits ONE clip across the mesh
        — the sequence-dimension scaling analog (SURVEY.md section 6.7):
        the heavy batched flow/pose calls run frame-parallel and XLA
        inserts the (small) gathers the sequential id scan needs. The clip
        is padded to a mesh-size multiple with invalid frames (masked
        detections; trailing, so the id chain of real frames is
        unaffected) and outputs are sliced back."""
        from flowtrack_tpu.parallel import pad_to_multiple

        f = frames.shape[0]
        frame_valid = np.ones((f,), bool)
        if frame_sharding is not None:
            ndev = frame_sharding.mesh.size
            frames, _ = pad_to_multiple(np.asarray(frames), ndev)
            det_boxes, _ = pad_to_multiple(np.asarray(det_boxes), ndev)
            det_scores, _ = pad_to_multiple(np.asarray(det_scores), ndev)
            det_valid, _ = pad_to_multiple(
                np.asarray(det_valid, bool), ndev)
            frame_valid, _ = pad_to_multiple(frame_valid, ndev)
        args = self.prepare(frames, det_boxes, det_scores, det_valid,
                            frame_valid, frame_offset=frame_offset)
        if frame_sharding is not None:
            args = tuple(jax.device_put(a, frame_sharding) for a in args)
        padded = frames.shape[0] != f
        device_out = self.run_prepared(
            args, budget_frames=f if padded else None, seed=seed)
        out = self.to_host(device_out)
        if frame_sharding is not None:
            out = {k: v[:f] for k, v in out.items()}
        if return_seed:
            return out, device_out[5]
        return out


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
