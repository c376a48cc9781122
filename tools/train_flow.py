#!/usr/bin/env python
"""Train/finetune a FlowNet on an optical-flow corpus (the reference
lineage's FlowNet-training counterpart: flownet2-pytorch ``main.py`` over
FlyingChairs/Sintel-style data).

Epoch loop over ``data/flow_dataset.FlowPairDataset`` batches; the jitted
step fuses device-side pair normalization (``preprocess_pair``) with the
multiscale-EPE train step (``engine/flow_train.flow_train_step``). Batches
are sharded over the data mesh (SPMD DP — the gradient psum is inserted by
XLA). Saves ``.npz`` flax variables consumable by ``tools/eval_flow.py``
and the tracking pipelines.

Lineage parity (flownet2-pytorch ``main.py``): ``--ckpt-dir`` turns on
per-epoch orbax checkpointing with best-by-val-EPE tracking and
``--resume``; ``--val-triplets``/``--val-frames``+``--val-gt-flow``
score a deterministic center-cropped validation EPE each epoch.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from flowtrack_tpu.config import apply_overrides, get_config
from flowtrack_tpu.data.flow_dataset import FlowPairDataset, flow_batches
from flowtrack_tpu.engine.checkpoint import save_npz_variables
from flowtrack_tpu.engine.flow_train import flow_train_step
from flowtrack_tpu.engine.metrics import AverageMeter
from flowtrack_tpu.engine.train import create_train_state
from flowtrack_tpu.models.flownet import get_flow_net, preprocess_pair
from flowtrack_tpu.parallel import batch_sharding, make_mesh, replicated
from flowtrack_tpu.utils.logging import MetricsWriter, setup_logging
from flowtrack_tpu.utils.profiling import default_compile_cache_dir

log = logging.getLogger("flowtrack.train_flow")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="flownet_s")
    ap.add_argument("--triplets", default=None,
                    help="FlyingChairs-style *_img1/_img2/_flow.flo dir")
    ap.add_argument("--frames", default=None,
                    help="Sintel-style ordered frames dir")
    ap.add_argument("--gt-flow", default=None,
                    help="Sintel-style per-pair .flo dir")
    ap.add_argument("--crop", type=int, nargs=2, default=(320, 448),
                    metavar=("H", "W"),
                    help="static /64-divisible train crop")
    ap.add_argument("--batch", type=int, default=8,
                    help="PER-DEVICE batch (global = batch x mesh size, "
                         "same convention as tools/train.py)")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--out", default="flownet_trained.npz")
    ap.add_argument("--ckpt-dir", default=None,
                    help="orbax checkpoint dir: per-epoch save, best "
                         "tracked by val EPE (or train EPE without a val "
                         "set); enables --resume")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--val-triplets", default=None,
                    help="validation FlyingChairs-style dir")
    ap.add_argument("--val-frames", default=None,
                    help="validation Sintel-style frames dir")
    ap.add_argument("--val-gt-flow", default=None,
                    help="validation per-pair .flo dir")
    ap.add_argument("--tensorboard", default=None, metavar="DIR",
                    help="also mirror scalars to a TensorBoard event dir")
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
    metrics = MetricsWriter(
        os.path.join(args.ckpt_dir or
                     os.path.dirname(os.path.abspath(args.out)) or ".",
                     "metrics.jsonl"),
        tensorboard_dir=args.tensorboard)
    ch, cw = args.crop
    if ch % 64 or cw % 64:
        raise SystemExit("--crop must be /64-divisible (FlowNet encoders)")
    ds = FlowPairDataset(root=args.triplets, frames_dir=args.frames,
                         flow_dir=args.gt_flow, crop_size=(ch, cw),
                         is_train=True)
    log.info("flow corpus: %d pairs, crop %dx%d", len(ds), ch, cw)

    mesh = make_mesh(cfg.mesh.num_devices, cfg.mesh.data_axis)
    data_sh = batch_sharding(mesh)
    global_batch = args.batch * mesh.size
    log.info("mesh: %s, global batch %d", mesh, global_batch)

    model = get_flow_net(cfg.flow)
    # lr milestones (cfg.train.lr_steps) are EPOCH-denominated; the
    # schedule needs the real steps/epoch or it would decay after N
    # optimizer steps instead of N epochs (review finding)
    steps_per_epoch = max(1, -(-len(ds) // global_batch))
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((1, ch, cw, 6)), steps_per_epoch)
    state = jax.device_put(state, replicated(mesh))
    div_flow = cfg.flow.div_flow
    rgb_max = cfg.flow.rgb_max

    @jax.jit
    def step(state, im1, im2, flow):
        batch = {"input": preprocess_pair(im1, im2, rgb_max),
                 "flow": flow}
        return flow_train_step(state, batch, div_flow=div_flow)

    val_ds = None
    if args.val_triplets or args.val_frames:
        val_ds = FlowPairDataset(root=args.val_triplets,
                                 frames_dir=args.val_frames,
                                 flow_dir=args.val_gt_flow,
                                 crop_size=(ch, cw), is_train=False)
        log.info("val corpus: %d pairs (center crop %dx%d)",
                 len(val_ds), ch, cw)

        from flowtrack_tpu.models.flownet import postprocess_flow

        variant = cfg.flow.variant

        @jax.jit
        def val_step(state, im1, im2, flow):
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            pred = model.apply(variables,
                               preprocess_pair(im1, im2, rgb_max),
                               train=False)
            up = postprocess_flow(pred, variant, (ch, cw), div_flow)
            # per-SAMPLE EPE: the host trims the short-batch padding
            # duplicates (repeated samples must not bias the metric)
            return jnp.mean(jnp.sqrt(jnp.sum((up - flow) ** 2, axis=-1)),
                            axis=(1, 2))

        def validate(state):
            m = AverageMeter()
            for b in flow_batches(val_ds, global_batch, shuffle=False,
                                  drop_last=False):
                epe = val_step(state,
                               jax.device_put(b["im1"], data_sh),
                               jax.device_put(b["im2"], data_sh),
                               jax.device_put(b["flow"], data_sh))
                real = np.asarray(epe)[:b["n_real"]]
                m.update(float(real.mean()), n=len(real))
            return m.avg

    mgr = start_epoch = None
    if args.ckpt_dir:
        from flowtrack_tpu.engine.checkpoint import CheckpointManager

        mgr = CheckpointManager(args.ckpt_dir)
        start_epoch = 0
        if args.resume:
            state, epoch = mgr.restore(state)
            start_epoch = epoch + 1
            log.info("resumed from epoch %d", epoch)

    meter = AverageMeter()
    for epoch in range(start_epoch or 0, args.epochs):
        t0 = time.time()
        meter.reset()
        for b in flow_batches(ds, global_batch, shuffle=True, seed=epoch,
                              drop_last=False):
            im1 = jax.device_put(b["im1"], data_sh)
            im2 = jax.device_put(b["im2"], data_sh)
            fl = jax.device_put(b["flow"], data_sh)
            state, m = step(state, im1, im2, fl)
            meter.update(float(m["epe"]), n=len(b["im1"]))
        line = {"epoch": epoch, "epe": round(meter.avg, 4),
                "seconds": round(time.time() - t0, 1)}
        if val_ds is not None:
            line["val_epe"] = round(validate(state), 4)
        log.info(json.dumps(line))
        metrics.write(epoch, **{k: v for k, v in line.items()
                                if k != "epoch"})
        if mgr is not None:
            # best = LOWEST epe; CheckpointManager tracks best by MAX perf
            mgr.save(epoch, state,
                     perf=-line.get("val_epe", line["epe"]))
    metrics.close()
    if mgr is not None:
        mgr.wait()

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    save_npz_variables(args.out, jax.tree.map(np.asarray, variables))
    log.info("saved %s", args.out)


if __name__ == "__main__":
    main()
