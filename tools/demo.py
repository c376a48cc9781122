#!/usr/bin/env python
"""Single-image pose demo (reference demo.py twin, SURVEY.md section 4.5).

boxes (json or GT) + image -> PosePredictor -> skeleton rendering.
"""

from __future__ import annotations

import argparse
import os
import json

import numpy as np
import jax
import jax.numpy as jnp

from flowtrack_tpu.config import apply_overrides, get_config
from flowtrack_tpu.data.pose_dataset import load_image
from flowtrack_tpu.engine.checkpoint import load_npz_variables
from flowtrack_tpu.pipeline import PosePredictor
from flowtrack_tpu.utils.vis import draw_skeleton, save_image
from flowtrack_tpu.utils.profiling import default_compile_cache_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="coco_res50_256x192")
    ap.add_argument("--weights", required=True, help=".npz flax variables")
    ap.add_argument("--image", required=True)
    ap.add_argument("--boxes", required=True,
                    help="json: [[x, y, w, h], ...] or detection dicts")
    ap.add_argument("--out", default="demo_out.png")
    ap.add_argument("opts", nargs="*")
    ap.add_argument("--compile-cache",
                    default=default_compile_cache_dir(),
                    help="persistent XLA compilation cache dir "
                         "(amortizes multi-minute first compiles "
                         "across CLI restarts)")
    args = ap.parse_args()
    if args.compile_cache:
        from flowtrack_tpu.utils.profiling import enable_compilation_cache
        enable_compilation_cache(args.compile_cache)

    cfg = apply_overrides(get_config(args.cfg), args.opts)
    img = load_image(args.image)
    with open(args.boxes) as f:
        raw = json.load(f)
    if raw and isinstance(raw[0], dict):
        boxes = np.asarray([d["bbox"] for d in raw], np.float32)
        scores = np.asarray([d.get("score", 1.0) for d in raw], np.float32)
    else:
        boxes = np.asarray(raw, np.float32).reshape(-1, 4)
        scores = np.ones(len(boxes), np.float32)

    variables = jax.tree.map(jnp.asarray, load_npz_variables(args.weights))
    predictor = PosePredictor(cfg, variables)
    joints, maxvals, rescored = predictor(img, boxes, scores)

    canvas = img.copy()
    for i in range(len(joints)):
        draw_skeleton(canvas, joints[i], maxvals[i],
                      thresh=cfg.test.in_vis_thre, track_id=i)
    save_image(args.out, canvas)
    print(json.dumps({"persons": len(joints),
                      "scores": [float(s) for s in rescored],
                      "out": args.out}))


if __name__ == "__main__":
    main()
