#!/usr/bin/env python
"""Optical-flow EPE evaluation CLI (Sintel/KITTI-style protocol).

frames dir + GT .flo dir -> FlowPredictor on consecutive pairs -> per-frame
EPE / 1px / 3px / Fl stats averaged over the dataset
(eval/flow_eval.py). The FlowNet lineage's benchmark-eval counterpart.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from flowtrack_tpu.config import apply_overrides, get_config
from flowtrack_tpu.data.pose_dataset import load_image
from flowtrack_tpu.engine.checkpoint import load_npz_variables
from flowtrack_tpu.eval.flow_eval import evaluate_flow_pairs, read_flo
from flowtrack_tpu.pipeline import FlowPredictor


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="flownet_s")
    ap.add_argument("--weights", required=True, help=".npz flax variables")
    ap.add_argument("--frames", required=True,
                    help="directory of ordered frames")
    ap.add_argument("--gt-flow", required=True,
                    help="directory of .flo files (one per pair, sorted)")
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args()

    cfg = apply_overrides(get_config(args.cfg), args.opts)
    variables = jax.tree.map(jnp.asarray, load_npz_variables(args.weights))
    predictor = FlowPredictor(cfg, variables)

    frame_files = sorted(
        f for f in os.listdir(args.frames)
        if f.lower().endswith((".png", ".jpg", ".jpeg")))
    flo_files = sorted(f for f in os.listdir(args.gt_flow)
                       if f.endswith(".flo"))
    assert len(flo_files) == len(frame_files) - 1, (
        f"{len(flo_files)} .flo files for {len(frame_files)} frames")

    preds, gts = [], []
    prev = load_image(os.path.join(args.frames, frame_files[0]))
    for i, flo in enumerate(flo_files):
        cur = load_image(os.path.join(args.frames, frame_files[i + 1]))
        preds.append(np.asarray(predictor(prev, cur)))
        gts.append(read_flo(os.path.join(args.gt_flow, flo)))
        prev = cur

    stats = evaluate_flow_pairs(preds, gts)
    print(json.dumps({"metric": "flow_epe", **stats}))


if __name__ == "__main__":
    main()
