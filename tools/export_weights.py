#!/usr/bin/env python
"""Convert reference torch checkpoints -> flax npz zoo files.

The one-way migration tool (SURVEY.md section 6.4): PoseResNet pose
checkpoints, FlowNetS/C/SD/FlowNet2 flow checkpoints, and torchvision
ImageNet backbones (head left at random init).

  python tools/export_weights.py --kind pose --pth model_best.pth --out pose.npz
  python tools/export_weights.py --kind flownet_s --pth FlowNet2-S.pth --out flow.npz
"""

from __future__ import annotations

import argparse
import json

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", required=True, choices=sorted(CONVERTERS))
    ap.add_argument("--pth", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

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
