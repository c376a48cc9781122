#!/usr/bin/env python
"""Train PoseResNet (reference CLI twin: ``python train.py --cfg ...``).

Epoch loop with Adam + milestone LR decay, on-device train_step, per-epoch
validation (COCO AP) and orbax checkpointing with best-model tracking
(SURVEY.md section 4.1 / section 6.4).
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from flowtrack_tpu.config import get_config, apply_overrides
from flowtrack_tpu.data import (BatchLoader, COCODataset, MPIIDataset,
                                PoseTrackDataset)
from flowtrack_tpu.engine.checkpoint import CheckpointManager
from flowtrack_tpu.engine.metrics import AverageMeter
from flowtrack_tpu.engine.train import (
    create_train_state,
    make_jit_train_step,
    make_lr_schedule,
)
from flowtrack_tpu.models.pose_resnet import get_pose_net
from flowtrack_tpu.parallel import batch_sharding, make_mesh, replicated
from flowtrack_tpu.utils.logging import MetricsWriter, setup_logging
from tools.test import build_val_dataset, run_validation
from flowtrack_tpu.utils.profiling import default_compile_cache_dir

log = logging.getLogger("flowtrack.train")


def make_dataset(cfg, is_train):
    if cfg.data.dataset == "coco":
        return COCODataset(cfg, cfg.data.root,
                           cfg.data.train_set if is_train else
                           cfg.data.test_set, is_train=is_train)
    if cfg.data.dataset == "mpii":
        return MPIIDataset(cfg, cfg.data.root,
                           "train" if is_train else "valid",
                           is_train=is_train)
    if cfg.data.dataset == "posetrack":
        # the reference's FlowTrack recipe: fine-tune the COCO-trained pose
        # model on PoseTrack frames (warm start via --init-weights)
        return PoseTrackDataset(cfg, cfg.data.root,
                                cfg.data.train_set if is_train else
                                cfg.data.test_set, is_train=is_train)
    raise KeyError(cfg.data.dataset)


def initial_variables(args, model, cfg, sample):
    """Optional warm start: --init-weights (full pose variables .npz — the
    COCO->PoseTrack fine-tune path) or --imagenet-backbone (torchvision
    ResNet .pth, or its converted .npz from
    ``tools/export_weights.py --kind backbone_imagenet``) overlaying
    backbone weights on a fresh init while the head stays random, as the
    reference does (SURVEY.md section 6.4 pretrained zoo)."""
    from flowtrack_tpu.engine.checkpoint import load_npz_variables

    if args.init_weights:
        return jax.tree.map(jnp.asarray,
                            load_npz_variables(args.init_weights))
    if not args.imagenet_backbone:
        return None
    from flowtrack_tpu.utils import torch_convert as tc

    fresh = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(cfg.train.seed), sample, train=False)
    if args.imagenet_backbone.endswith(".npz"):
        conv = load_npz_variables(args.imagenet_backbone)
        return jax.tree.map(jnp.asarray, tc.overlay_backbone(fresh, conv))
    import torch

    sd = tc.state_dict_to_numpy(
        torch.load(args.imagenet_backbone, map_location="cpu",
                   weights_only=True))
    return jax.tree.map(jnp.asarray,
                        tc.init_backbone_from_imagenet(fresh, sd))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="coco_res50_256x192")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--out", default=None, help="checkpoint dir override")
    ap.add_argument("--init-weights", default=None,
                    help="warm-start full pose variables (.npz) — the "
                         "COCO->PoseTrack fine-tune path")
    ap.add_argument("--imagenet-backbone", default=None,
                    help="torchvision ResNet .pth (or converted .npz): "
                         "ImageNet backbone init, head stays random")
    ap.add_argument("--tensorboard", default=None, metavar="DIR",
                    help="also mirror scalars to a TensorBoard event dir "
                         "(the reference logs TB scalars; SURVEY.md 6.5)")
    ap.add_argument("opts", nargs="*", help="dotted overrides k=v")
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
    ckpt_dir = args.out or cfg.train.checkpoint_dir
    mwriter = MetricsWriter(os.path.join(ckpt_dir, "metrics.jsonl"),
                            tensorboard_dir=args.tensorboard)

    mesh = make_mesh(cfg.mesh.num_devices, cfg.mesh.data_axis)
    data_sh = batch_sharding(mesh)
    repl = replicated(mesh)
    log.info("mesh: %s", mesh)

    train_ds = make_dataset(cfg, is_train=True)
    loader = BatchLoader(train_ds, cfg.train.batch_size * mesh.size,
                         shuffle=cfg.train.shuffle, drop_last=True,
                         seed=cfg.train.seed)
    steps_per_epoch = max(len(loader), 1)

    model = get_pose_net(cfg.model)
    sample = jnp.zeros((1, *cfg.model.image_size, 3), jnp.float32)
    state = create_train_state(model, cfg, jax.random.PRNGKey(cfg.train.seed),
                               sample, steps_per_epoch,
                               variables=initial_variables(args, model, cfg,
                                                           sample))
    state = jax.device_put(state, repl)

    mgr = CheckpointManager(ckpt_dir)
    start_epoch = 0
    best = 0.0
    if args.resume:
        state, epoch = mgr.restore(state)
        start_epoch = epoch + 1
        log.info("resumed from epoch %d", epoch)

    step_fn = make_jit_train_step(cfg.train.use_target_weight)

    val_ds = None

    for epoch in range(start_epoch, cfg.train.end_epoch):
        losses, accs, btime = AverageMeter(), AverageMeter(), AverageMeter()
        t0 = time.time()
        for i, batch in enumerate(loader):
            dev_batch = {
                "input": jax.device_put(batch["input"], data_sh),
                "target": jax.device_put(batch["target"], data_sh),
                "target_weight": jax.device_put(batch["target_weight"],
                                                data_sh),
            }
            state, metrics = step_fn(state, dev_batch)
            losses.update(float(metrics["loss"]), len(batch["input"]))
            accs.update(float(metrics["acc"]))
            btime.update(time.time() - t0)
            t0 = time.time()
            if i % cfg.train.print_freq == 0:
                log.info("epoch %d [%d/%d] loss %.5f (%.5f) acc %.3f "
                         "(%.3f) %.3fs/b", epoch, i, steps_per_epoch,
                         losses.val, losses.avg, accs.val, accs.avg,
                         btime.avg)

        perf = 0.0
        try:
            # build_val_dataset picks the right dataset class per
            # cfg.data.dataset (incl. posetrack with GT-box fallback),
            # cached across epochs; absent val data lands in the except
            # below, not a crash
            if val_ds is None:
                val_ds = build_val_dataset(cfg)
            stats = run_validation(cfg, model,
                                   {"params": state.params,
                                    "batch_stats": state.batch_stats},
                                   mesh=mesh, dataset=val_ds)
            perf = stats.get("AP", stats.get("Mean", 0.0))
        except Exception as e:  # validation data may be absent
            log.warning("validation skipped: %s", e)
        best = max(best, perf)
        mgr.save(epoch, state, perf=perf)
        # the REAL optimizer schedule, not a re-derivation of it
        lr = float(make_lr_schedule(cfg, steps_per_epoch)(int(state.step)))
        mwriter.write(epoch, train_loss=losses.avg, train_acc=accs.avg,
                      val_perf=perf, best_perf=best, lr=lr)
        log.info("epoch %d done: loss %.5f perf %.4f (best %.4f)",
                 epoch, losses.avg, perf, best)
    mwriter.close()
    mgr.wait()


if __name__ == "__main__":
    main()
