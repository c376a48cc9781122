#!/usr/bin/env python
"""Clip-batched video tracking CLI — the TPU-native demo path.

video/frame-dir + detection json -> ClipTracker over overlapping clips with
cross-clip id stitching -> PoseTrack-style json (+ optional skeleton
renders). The streaming equivalent is tools/track.py (host FlowTracker with
unified det+propagated box NMS).
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import numpy as np
import jax
import jax.numpy as jnp

from flowtrack_tpu.config import apply_overrides, get_config
from flowtrack_tpu.engine.checkpoint import load_npz_variables
from flowtrack_tpu.models.flownet import get_flow_net
from flowtrack_tpu.models.pose_resnet import get_pose_net
from flowtrack_tpu.tracking.clip_pipeline import ClipTracker
from flowtrack_tpu.utils.logging import setup_logging
from flowtrack_tpu.utils.video import (
    LazyFrameSequence,
    SequentialVideoFrames,
    frame_paths,
    iter_video_frames,
    track_video_clips,
)
from flowtrack_tpu.utils.vis import draw_skeleton, save_image

log = logging.getLogger("flowtrack.track_video")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="flowtrack_posetrack")
    ap.add_argument("--pose-weights", required=True)
    ap.add_argument("--flow-weights", required=True)
    ap.add_argument("--video", required=True,
                    help="video file or directory of frames")
    ap.add_argument("--detections", required=True,
                    help="json: per-frame list of {bbox, score}")
    ap.add_argument("--out", default="output/video")
    ap.add_argument("--clip-len", type=int, default=16)
    ap.add_argument("--render", action="store_true")
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args()
    setup_logging()

    cfg = apply_overrides(get_config(args.cfg), args.opts)
    # lazy frame access: track_video_clips only touches the current clip
    # window (+ 1-clip lookahead), so host memory stays O(clip_len) for
    # long videos; frame dirs index randomly, video files decode forward
    if os.path.isdir(args.video):
        frames = LazyFrameSequence(frame_paths(args.video))
    else:
        try:
            frames = SequentialVideoFrames(args.video)
        except ValueError as e:  # no usable frame-count metadata
            log.warning("%s; loading eagerly", e)
            frames = np.stack(list(iter_video_frames(args.video)))
    with open(args.detections) as f:
        dets = json.load(f)  # list per frame: [{bbox, score}, ...]
    det_boxes = [[d["bbox"] for d in fr] for fr in dets]
    det_scores = [[d.get("score", 1.0) for d in fr] for fr in dets]
    assert len(det_boxes) == len(frames), \
        f"{len(det_boxes)} det frames vs {len(frames)} video frames"

    pose = get_pose_net(cfg.model)
    flow = get_flow_net(cfg.flow)
    pose_vars = jax.tree.map(jnp.asarray,
                             load_npz_variables(args.pose_weights))
    flow_vars = jax.tree.map(jnp.asarray,
                             load_npz_variables(args.flow_weights))
    tracker = ClipTracker(cfg, pose, pose_vars, flow, flow_vars)

    results = track_video_clips(tracker, frames, det_boxes, det_scores,
                                clip_len=args.clip_len)

    os.makedirs(args.out, exist_ok=True)
    out_json = []
    for t, poses in enumerate(results):
        for p in poses:
            kp = []
            for (x, y), v in zip(p["joints"], p["maxvals"]):
                kp += [float(x), float(y), float(v)]
            out_json.append({"frame": t, "track_id": p["track_id"],
                             "keypoints": kp, "score": p["score"]})
    with open(os.path.join(args.out, "tracks.json"), "w") as f:
        json.dump(out_json, f)
    log.info("%d frames, %d pose instances -> %s", len(frames),
             len(out_json), args.out)

    if args.render:
        for t, poses in enumerate(results):
            canvas = frames[t].astype(np.uint8).copy()
            for p in poses:
                draw_skeleton(canvas, p["joints"], p["maxvals"],
                              cfg.test.in_vis_thre, p["track_id"])
            save_image(os.path.join(args.out, f"{t:06d}.png"), canvas)
    print(json.dumps({"frames": len(frames), "instances": len(out_json),
                      "tracks": len({r['track_id'] for r in out_json})}))


if __name__ == "__main__":
    main()
