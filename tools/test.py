#!/usr/bin/env python
"""Evaluate a pose model on COCO/MPII (reference CLI twin: ``test.py``).

The validate loop (SURVEY.md section 4.2) with everything on device:
batched crops -> forward with fused flip-test -> decode -> rescore; then
host-side OKS-NMS + COCO AP (in-repo evaluator).
"""

from __future__ import annotations

import argparse
import os
import logging

import numpy as np
import jax
import jax.numpy as jnp

from flowtrack_tpu.config import (
    COCO_FLIP_PAIRS,
    MPII_FLIP_PAIRS,
    apply_overrides,
    get_config,
)
from flowtrack_tpu.data import BatchLoader, COCODataset, MPIIDataset
from flowtrack_tpu.engine.checkpoint import load_npz_variables
from flowtrack_tpu.engine.train import pose_forward_args_fn
from flowtrack_tpu.models.pose_resnet import get_pose_net
from flowtrack_tpu.ops.decode import get_final_preds, rescore
from flowtrack_tpu.parallel import batch_sharding, make_mesh
from flowtrack_tpu.utils.logging import setup_logging
from flowtrack_tpu.utils.profiling import default_compile_cache_dir

log = logging.getLogger("flowtrack.test")


def build_val_dataset(cfg):
    """The validation dataset for cfg.data.dataset (mpii PCKh / posetrack
    with GT-box fallback / coco). Split out so epoch loops can build it
    once and pass it to run_validation per epoch."""
    if cfg.data.dataset == "mpii":
        return MPIIDataset(cfg, cfg.data.root, "valid", is_train=False)
    if cfg.data.dataset == "posetrack":
        from flowtrack_tpu.data import PoseTrackDataset

        if not cfg.test.bbox_file and not cfg.test.use_gt_bbox:
            # pose-mAP eval on PoseTrack falls back to GT boxes when
            # no detection file is configured (same as tools/track.py)
            from dataclasses import replace

            cfg = replace(cfg, test=replace(cfg.test, use_gt_bbox=True))
        return PoseTrackDataset(cfg, cfg.data.root, cfg.data.test_set,
                                is_train=False)
    return COCODataset(cfg, cfg.data.root, cfg.data.test_set,
                       is_train=False,
                       bbox_file=cfg.test.bbox_file or None)


def run_validation(cfg, model, variables, mesh=None, output_dir=None,
                   dataset=None, debug_dir=None):
    """Returns the eval stats dict (AP table for COCO, PCKh for MPII).
    ``debug_dir``: dump the first batch's crops with predicted skeletons
    + per-joint heatmap grids (the reference validate loop's
    save_debug_images)."""
    if dataset is None:
        dataset = build_val_dataset(cfg)
    flip_pairs = (MPII_FLIP_PAIRS if cfg.data.dataset == "mpii"
                  else COCO_FLIP_PAIRS)
    mesh = mesh or make_mesh(cfg.mesh.num_devices, cfg.mesh.data_axis)
    data_sh = batch_sharding(mesh)

    batch_size = cfg.test.batch_size * mesh.size
    loader = BatchLoader(dataset, batch_size, pad_to_batch=True)

    # variables are a jit ARGUMENT (closing over them bakes >100MB of
    # weights into the program — HTTP 413 on the TPU relay, CLAUDE.md)
    fwd = pose_forward_args_fn(model, cfg.test.flip_test, flip_pairs,
                               cfg.test.shift_heatmap)

    @jax.jit
    def step(variables, inp, center, scale, score):
        hm = fwd(variables, inp)
        preds, maxvals = get_final_preds(hm, center, scale,
                                         cfg.test.post_process,
                                         blur_kernel=cfg.test.blur_kernel)
        return preds, maxvals, rescore(score, maxvals, cfg.test.in_vis_thre)

    all_preds, all_maxvals, all_scores, all_ids = [], [], [], []
    dumped = False
    for batch in loader:
        n = int(batch["n_valid"])
        preds, maxvals, scores = step(
            variables,
            jax.device_put(batch["input"], data_sh),
            jax.device_put(batch["center"], data_sh),
            jax.device_put(batch["scale"], data_sh),
            jax.device_put(batch["score"], data_sh))
        if debug_dir and not dumped:
            from flowtrack_tpu.utils.vis import save_debug_images

            hm = np.asarray(jax.jit(fwd)(
                variables, jax.device_put(batch["input"], data_sh)))
            save_debug_images(np.asarray(batch["input"])[:n], hm[:n],
                              debug_dir, prefix=cfg.data.dataset)
            dumped = True
        all_preds.append(np.asarray(preds)[:n])
        all_maxvals.append(np.asarray(maxvals)[:n])
        all_scores.append(np.asarray(scores)[:n])
        all_ids.append(np.asarray(batch["image_id"])[:n])

    preds = np.concatenate(all_preds)
    maxvals = np.concatenate(all_maxvals)
    scores = np.concatenate(all_scores)
    ids = np.concatenate(all_ids)

    if cfg.data.dataset == "mpii":
        stats = dataset.evaluate(preds)
        log.info("PCKh@0.5: %s", stats)
        return stats
    stats, _ = dataset.evaluate(preds, maxvals, scores, ids,
                                output_dir=output_dir)
    dataset.print_eval(stats)
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="coco_res50_256x192")
    ap.add_argument("--weights", required=True,
                    help=".npz flax variables or torch .pth")
    ap.add_argument("--out", default="output/eval")
    ap.add_argument("--debug-dir", default=None,
                    help="dump first-batch debug images (crops with "
                         "predicted skeletons + heatmap grids)")
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
    setup_logging()

    cfg = apply_overrides(get_config(args.cfg), args.opts)
    model = get_pose_net(cfg.model)
    if args.weights.endswith(".npz"):
        variables = load_npz_variables(args.weights)
    else:
        from flowtrack_tpu.utils.torch_convert import (
            convert_pose_resnet,
            load_torch_file,
        )

        variables = convert_pose_resnet(load_torch_file(args.weights))
    variables = jax.tree.map(jnp.asarray, variables)
    run_validation(cfg, model, variables, output_dir=args.out,
                   debug_dir=args.debug_dir)


if __name__ == "__main__":
    main()
