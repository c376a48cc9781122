#!/usr/bin/env python
"""Optical-flow inference + EPE evaluation CLI (FlowNet lineage).

frames dir [+ GT .flo dir] -> FlowPredictor on consecutive pairs ->
per-frame EPE / 1px / 3px / Fl stats averaged over the dataset
(eval/flow_eval.py), and/or predicted flow dumped per pair. Mirrors the
flownet2-pytorch trainer's two modes: benchmark validation (--gt-flow)
and pure inference writing .flo outputs (--save-flo, optionally with
Middlebury color-wheel renders via --render).
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
from flowtrack_tpu.eval.flow_eval import (evaluate_flow_pairs, read_flo,
                                          write_flo)
from flowtrack_tpu.pipeline import FlowPredictor
from flowtrack_tpu.utils.profiling import default_compile_cache_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="flownet_s")
    ap.add_argument("--weights", required=True, help=".npz flax variables")
    ap.add_argument("--frames", required=True,
                    help="directory of ordered frames")
    ap.add_argument("--gt-flow", default=None,
                    help="directory of .flo files (one per pair, sorted); "
                         "omit for pure inference with --save-flo")
    ap.add_argument("--save-flo", default=None,
                    help="write predicted flow per pair as .flo here")
    ap.add_argument("--render", action="store_true",
                    help="with --save-flo: also write Middlebury "
                         "color-wheel .png renders")
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
    if not args.gt_flow and not args.save_flo:
        ap.error("nothing to do: pass --gt-flow (evaluate) and/or "
                 "--save-flo (inference)")

    cfg = apply_overrides(get_config(args.cfg), args.opts)
    variables = jax.tree.map(jnp.asarray, load_npz_variables(args.weights))
    predictor = FlowPredictor(cfg, variables)

    from flowtrack_tpu.utils.video import IMG_EXTS

    frame_files = sorted(
        f for f in os.listdir(args.frames)
        if f.lower().endswith(IMG_EXTS))
    if not frame_files:
        ap.error(f"no frame images ({'/'.join(IMG_EXTS)}) in {args.frames}")
    flo_files = None
    if args.gt_flow:
        flo_files = sorted(f for f in os.listdir(args.gt_flow)
                           if f.endswith(".flo"))
        assert len(flo_files) == len(frame_files) - 1, (
            f"{len(flo_files)} .flo files for {len(frame_files)} frames")
    if args.save_flo:
        os.makedirs(args.save_flo, exist_ok=True)

    preds, gts = [], []
    prev = load_image(os.path.join(args.frames, frame_files[0]))
    for i in range(len(frame_files) - 1):
        cur = load_image(os.path.join(args.frames, frame_files[i + 1]))
        pred = np.asarray(predictor(prev, cur))
        if args.save_flo:
            stem = os.path.splitext(frame_files[i])[0]
            write_flo(os.path.join(args.save_flo, f"{stem}.flo"), pred)
            if args.render:
                from flowtrack_tpu.utils.vis import flow_to_color, \
                    save_image

                save_image(os.path.join(args.save_flo, f"{stem}.png"),
                           flow_to_color(pred))
        if flo_files is not None:
            preds.append(pred)
            gts.append(read_flo(os.path.join(args.gt_flow, flo_files[i])))
        prev = cur

    out = {"metric": "flow_epe", "pairs": len(frame_files) - 1}
    if flo_files is not None:
        out.update(evaluate_flow_pairs(preds, gts))
    if args.save_flo:
        out["saved_to"] = args.save_flo
    print(json.dumps(out))


if __name__ == "__main__":
    main()
