#!/usr/bin/env python
"""Convert reference torch checkpoints <-> flax npz zoo files.

The migration tool (SURVEY.md section 6.4): PoseResNet pose checkpoints,
FlowNetS/C/SD/FlowNet2 flow checkpoints, and torchvision ImageNet
backbones (head left at random init). ``--reverse`` goes the other way —
flax .npz (e.g. TPU-trained) back to a torch .pth the reference stack
loads with strict=True.

  python tools/export_weights.py --kind pose --pth model_best.pth --out pose.npz
  python tools/export_weights.py --kind flownet_s --pth FlowNet2-S.pth --out flow.npz
  python tools/export_weights.py --kind pose --reverse --npz pose.npz --out pose.pth
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from flowtrack_tpu.engine.checkpoint import save_npz_variables
from flowtrack_tpu.utils import torch_convert as tc

CONVERTERS = {
    "pose": tc.convert_pose_resnet,
    "backbone_imagenet": tc.convert_resnet_backbone,
    "flownet_s": tc.convert_flownet_s,
    "flownet_c": tc.convert_flownet_c,
    "flownet_sd": tc.convert_flownet_sd,
    "flownet_fusion": tc.convert_flownet_fusion,
    "flownet2": tc.convert_flownet2,
    "flownet2_cs": tc.convert_flownet2_cs,
    "flownet2_css": tc.convert_flownet2_css,
}


REVERSERS = {
    "pose": tc.reverse_pose_resnet,
    "flownet_s": tc.reverse_flownet,
    "flownet_c": tc.reverse_flownet,
    "flownet_sd": tc.reverse_flownet,
    "flownet_fusion": tc.reverse_flownet,
    "flownet2": tc.reverse_flownet2,
    "flownet2_cs": tc.reverse_flownet2,
    "flownet2_css": tc.reverse_flownet2,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", required=True, choices=sorted(CONVERTERS))
    ap.add_argument("--pth", help="torch checkpoint in (forward mode)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--npz", help="flax npz in (with --reverse)")
    ap.add_argument("--reverse", action="store_true",
                    help="convert the OTHER way: flax .npz -> torch .pth "
                         "(deploy TPU-trained weights on the torch stack)")
    args = ap.parse_args()

    if args.reverse:
        if args.kind not in REVERSERS:
            ap.error(f"--reverse unsupported for kind {args.kind!r}")
        if not args.npz:
            ap.error("--reverse needs --npz")
        import torch

        from flowtrack_tpu.engine.checkpoint import load_npz_variables

        variables = load_npz_variables(args.npz)
        sd = {k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in REVERSERS[args.kind](variables).items()}
        torch.save(sd, args.out)
        print(json.dumps({"kind": args.kind, "out": args.out,
                          "reverse": True, "num_arrays": len(sd)}))
        return
    if not args.pth:
        ap.error("forward mode needs --pth")
    sd = tc.load_torch_file(args.pth)
    variables = CONVERTERS[args.kind](sd)
    save_npz_variables(args.out, variables)
    n_params = sum(v.size for v in _leaves(variables))
    print(json.dumps({"kind": args.kind, "out": args.out,
                      "num_arrays": sum(1 for _ in _leaves(variables)),
                      "num_params": int(n_params)}))


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
