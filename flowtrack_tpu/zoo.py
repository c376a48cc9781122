"""Model zoo registry: one name -> (config, builder, torch converter).

The migration map for reference users: each entry names the reference
checkpoint it ingests (via tools/export_weights.py or directly through the
converter) and the preset that reproduces its architecture.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from flowtrack_tpu.config import get_config
from flowtrack_tpu.models.flownet import get_flow_net
from flowtrack_tpu.models.pose_resnet import get_pose_net
from flowtrack_tpu.utils import torch_convert as tc


@dataclass(frozen=True)
class ZooEntry:
    name: str
    config_name: str
    build: Callable              # cfg -> flax module
    convert: Callable            # torch state_dict -> flax variables
    reference_checkpoint: str    # what the reference calls it


def _pose_builder(cfg):
    return get_pose_net(cfg.model)


def _flow_builder(cfg):
    return get_flow_net(cfg.flow)


ZOO = {
    e.name: e for e in [
        ZooEntry("pose_resnet_50_256x192", "coco_res50_256x192",
                 _pose_builder, tc.convert_pose_resnet,
                 "pose_resnet_50_256x192.pth (COCO)"),
        ZooEntry("pose_resnet_50_384x288", "coco_res50_384x288",
                 _pose_builder, tc.convert_pose_resnet,
                 "pose_resnet_50_384x288.pth (COCO)"),
        ZooEntry("pose_resnet_101_256x192", "coco_res101_256x192",
                 _pose_builder, tc.convert_pose_resnet,
                 "pose_resnet_101_256x192.pth (COCO)"),
        ZooEntry("pose_resnet_101_384x288", "coco_res101_384x288",
                 _pose_builder, tc.convert_pose_resnet,
                 "pose_resnet_101_384x288.pth (COCO)"),
        ZooEntry("pose_resnet_152_256x192", "coco_res152_256x192",
                 _pose_builder, tc.convert_pose_resnet,
                 "pose_resnet_152_256x192.pth (COCO)"),
        ZooEntry("pose_resnet_152_384x288", "coco_res152_384x288",
                 _pose_builder, tc.convert_pose_resnet,
                 "pose_resnet_152_384x288.pth (COCO)"),
        ZooEntry("flownet_s", "flownet_s",
                 _flow_builder, tc.convert_flownet_s,
                 "FlowNet2-S_checkpoint.pth.tar"),
        ZooEntry("flownet_c", "flownet_c",
                 _flow_builder, tc.convert_flownet_c,
                 "FlowNet2-C_checkpoint.pth.tar"),
        ZooEntry("flownet2", "flownet_s",  # cfg variant overridden below
                 _flow_builder, tc.convert_flownet2,
                 "FlowNet2_checkpoint.pth.tar"),
        ZooEntry("flownet2_cs", "flownet_s",
                 _flow_builder, tc.convert_flownet2_cs,
                 "FlowNet2-CS_checkpoint.pth.tar"),
        ZooEntry("flownet2_css", "flownet_s",
                 _flow_builder, tc.convert_flownet2_css,
                 "FlowNet2-CSS_checkpoint.pth.tar"),
    ]
}


def load_zoo_model(name: str, torch_state_dict=None, npz_path=None):
    """-> (module, config, variables-or-None).

    Provide EITHER a torch state_dict (converted on the fly) or an npz path
    (engine/checkpoint.load_npz_variables), or neither for architecture
    only."""
    entry = ZOO[name]
    cfg = get_config(entry.config_name)
    if name in ("flownet2", "flownet2_cs", "flownet2_css"):
        from dataclasses import replace

        cfg = replace(cfg, flow=replace(cfg.flow, variant=name))
    module = entry.build(cfg)
    variables = None
    if torch_state_dict is not None:
        variables = entry.convert(torch_state_dict)
    elif npz_path is not None:
        from flowtrack_tpu.engine.checkpoint import load_npz_variables

        variables = load_npz_variables(npz_path)
    return module, cfg, variables
