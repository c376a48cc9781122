#!/usr/bin/env python
"""Export the serving clip program as a compile-once artifact.

Traces + lowers ClipTracker's jitted clip program (optionally the
vmapped multi-stream serving layout) via ``jax.export`` and writes one
self-contained blob + a JSON sidecar describing its geometry. Artifacts
can be lowered for a DIFFERENT platform than the build host (e.g.
``--platforms tpu`` on a cpu box); a serving process reloads with
``flowtrack_tpu.aot.load_clip_program`` and never retraces.

  python tools/export_program.py --cfg flowtrack_posetrack \
      --pose-weights p.npz --flow-weights f.npz \
      --clip-len 64 --frame-size 256x192 --streams 6 \
      --platforms tpu,cpu --out clip_prog.bin
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from flowtrack_tpu import aot
from flowtrack_tpu.config import apply_overrides, get_config
from flowtrack_tpu.engine.checkpoint import load_npz_variables
from flowtrack_tpu.models.flownet import get_flow_net
from flowtrack_tpu.models.pose_resnet import get_pose_net
from flowtrack_tpu.tracking.clip_pipeline import ClipTracker


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="flowtrack_posetrack")
    ap.add_argument("--pose-weights", required=True)
    ap.add_argument("--flow-weights", required=True)
    ap.add_argument("--out", required=True, help="artifact path "
                    "(a .json sidecar is written next to it)")
    ap.add_argument("--clip-len", type=int, default=64)
    ap.add_argument("--frame-size", default="256x192",
                    help="video frame HxW the artifact is specialized to")
    ap.add_argument("--streams", type=int, default=None,
                    help="export the N-stream batched serving layout "
                         "instead of the single-clip program")
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering targets (tpu,cpu); "
                         "default: the current backend")
    ap.add_argument("--check", action="store_true",
                    help="reload the artifact and run zero inputs through "
                         "it (needs the current platform in --platforms)")
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args()

    h, w = (int(v) for v in args.frame_size.lower().split("x"))
    platforms = tuple(args.platforms.split(",")) if args.platforms else None

    cfg = apply_overrides(get_config(args.cfg), args.opts)
    pose = get_pose_net(cfg.model)
    flow = get_flow_net(cfg.flow)
    pose_vars = jax.tree.map(jnp.asarray,
                             load_npz_variables(args.pose_weights))
    flow_vars = jax.tree.map(jnp.asarray,
                             load_npz_variables(args.flow_weights))
    tracker = ClipTracker(cfg, pose, pose_vars, flow, flow_vars)

    blob = aot.export_clip_program(tracker, args.clip_len, (h, w),
                                   streams=args.streams,
                                   platforms=platforms)
    with open(args.out, "wb") as f:
        f.write(blob)
    sidecar = os.path.splitext(args.out)[0] + ".json"
    with open(sidecar, "w") as f:
        f.write(aot.artifact_meta(tracker, args.clip_len, (h, w),
                                  args.streams, platforms))

    checked = False
    if args.check:
        call = aot.load_clip_program(blob)
        specs = aot.clip_arg_specs(tracker, args.clip_len, (h, w),
                                   args.streams)
        zeros = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), tuple(specs))
        out = call(*zeros)
        ids = np.asarray(out[3])
        checked = ids.shape[-2] == args.clip_len
    print(json.dumps({"out": args.out, "sidecar": sidecar,
                      "bytes": len(blob),
                      "platforms": list(platforms) if platforms else None,
                      "streams": args.streams, "checked": checked}))


if __name__ == "__main__":
    main()
