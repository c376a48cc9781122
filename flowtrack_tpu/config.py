"""Typed experiment configuration.

TPU-native replacement for the reference's yaml-+ argparse config system
(reference: experiments/*.yaml + lib/core/config.py lineage; exact paths
unverifiable — reference mount empty, see SURVEY.md section 0/section 3 "Config" row).

We use frozen dataclasses so configs are hashable and can be closed over by
jit without retracing surprises. ``load_yaml``/``apply_overrides`` keep the
reference's UX (yaml files + dotted CLI overrides like TEST.FLIP_TEST=False).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, replace
from typing import Any, Tuple


# COCO 17-keypoint skeleton constants (values from the COCO keypoint task
# definition; same constants the reference hard-codes per SURVEY.md section 3).
COCO_NUM_JOINTS = 17
COCO_FLIP_PAIRS: Tuple[Tuple[int, int], ...] = (
    (1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12), (13, 14), (15, 16),
)
# OKS per-keypoint falloff constants (sigmas), from pycocotools cocoeval.
COCO_SIGMAS: Tuple[float, ...] = (
    0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079, 0.072, 0.072,
    0.062, 0.062, 0.107, 0.107, 0.087, 0.087, 0.089, 0.089,
)

# PoseTrack uses 15 joints (no ears); keep the COCO ordering convention used
# by the FlowTrack lineage: posetrack json still carries 17 slots.
POSETRACK_NUM_JOINTS = 15

# MPII 16-joint constants (SURVEY.md section 3 "MPII dataset" row).
MPII_NUM_JOINTS = 16
MPII_FLIP_PAIRS: Tuple[Tuple[int, int], ...] = (
    (0, 5), (1, 4), (2, 3), (10, 15), (11, 14), (12, 13),
)

PIXEL_STD = 200.0  # box scale is expressed in units of 200 px (reference convention)

# ImageNet normalization (reference: (x/255 - mean) / std).
IMAGENET_MEAN: Tuple[float, float, float] = (0.485, 0.456, 0.406)
IMAGENET_STD: Tuple[float, float, float] = (0.229, 0.224, 0.225)


@dataclass(frozen=True)
class ModelConfig:
    """PoseResNet architecture knobs (reference: models/pose_resnet.py lineage)."""

    num_layers: int = 50                      # 50 | 101 | 152
    num_joints: int = COCO_NUM_JOINTS
    image_size: Tuple[int, int] = (256, 192)  # (H, W); ref uses (W, H) in yaml
    heatmap_size: Tuple[int, int] = (64, 48)  # input / 4
    num_deconv_layers: int = 3
    num_deconv_filters: Tuple[int, ...] = (256, 256, 256)
    num_deconv_kernels: Tuple[int, ...] = (4, 4, 4)
    final_conv_kernel: int = 1
    deconv_with_bias: bool = False
    sigma: float = 2.0                        # GT gaussian sigma (3.0 at 384x288)
    dtype: str = "bfloat16"                   # compute dtype on TPU (params fp32)
    remat: bool = False                       # jax.checkpoint each resnet stage
                                              # (trade FLOPs for HBM in training)


@dataclass(frozen=True)
class FlowConfig:
    """FlowNet knobs (reference: models/flownet/* lineage)."""

    variant: str = "flownet_s"   # flownet_s | flownet_c | flownet2 stages
    div_flow: float = 20.0       # network predicts flow/20
    rgb_max: float = 255.0
    batch_norm: bool = False
    # Correlation layer (FlowNetC): kernel 1, max_displacement 20,
    # stride1 1, stride2 2, pad 20 -> 21x21=441 channels.
    corr_max_displacement: int = 20
    corr_stride2: int = 2
    use_pallas_corr: bool = False  # Pallas cost-volume kernel (TPU) vs XLA
    use_pallas_warp: bool = False  # Pallas warp kernel vs XLA slice-gather
    # which Pallas warp kernel: "shift" = shift-accumulate (VPU,
    # value-exact vs XLA), "matmul" = one-hot-matrix MXU contraction
    # (f32 HIGHEST, ~1 ulp) — ops/warp.py
    pallas_warp_impl: str = "shift"
    dtype: str = "bfloat16"
    # FlowNet2 cascade inter-stage tensor dtype (full-res upsampled flows,
    # warped frames, brightness errors): float32 = exact reference glue;
    # bfloat16 halves the cascade's largest HBM intermediates (serving
    # memory cap; EPE drift bounded by test)
    glue_dtype: str = "float32"


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 32
    lr: float = 1e-3
    lr_factor: float = 0.1
    lr_steps: Tuple[int, ...] = (90, 120)
    end_epoch: int = 140
    optimizer: str = "adam"
    # augmentation (reference COCODataset defaults)
    flip_prob: float = 0.5
    rot_factor: float = 40.0
    scale_factor: float = 0.3
    use_target_weight: bool = True
    checkpoint_dir: str = "output/checkpoints"
    print_freq: int = 100
    seed: int = 0
    shuffle: bool = True


@dataclass(frozen=True)
class TestConfig:
    batch_size: int = 64
    flip_test: bool = True
    shift_heatmap: bool = True     # 1-px right shift of flipped heatmaps
    post_process: bool = True      # quarter-pixel offset decode
    blur_kernel: int = 0           # optional gaussian blur before decode (DARK-style off)
    oks_thre: float = 0.9          # OKS-NMS threshold
    in_vis_thre: float = 0.2       # keypoint visibility threshold for rescoring
    nms_thre: float = 1.0          # bbox NMS threshold over det+prop boxes
    image_thre: float = 0.0        # detection box score threshold
    use_gt_bbox: bool = False
    soft_nms: bool = False
    bbox_file: str = ""            # precomputed person detections json


@dataclass(frozen=True)
class TrackConfig:
    """FlowTrack video pipeline knobs (reference tracker, SURVEY.md section 4.4)."""

    track_oks_thre: float = 0.5    # greedy matching similarity threshold
    box_nms_thre: float = 0.5      # unified det+propagated box suppression
    box_expand: float = 0.15       # propagated-box expansion
    max_persons: int = 32          # static pad for ragged persons-per-frame
    pose_score_thre: float = 0.3   # drop low-score candidates before matching
    keyframe_interval: int = 1     # run detector every k frames (1 = every frame)
    # --- detector-miss recovery in the batched ClipTracker fast path
    # (SURVEY.md section 4.4 "people missed by the detector are still
    # found"; the streaming FlowTracker always has it).
    clip_recover: bool = True      # enable flow-propagated candidate recovery
    max_recovered: int = 4         # static per-frame recovery candidate slots
    recover_budget: float = 1.0    # avg recovered pose crops per frame; the
                                   # clip-wide pose budget is ceil(F * this)
    max_miss_age: int = 3          # consecutive detector misses a track may
                                   # bridge via propagation-only boxes
    pose_chunk: int = 0            # ClipTracker: run the pose backbone in
                                   # lax.map chunks of this many crops
                                   # (0 = one call). Caps peak activation
                                   # memory so more streams batch into one
                                   # program; per-crop results unchanged
    flow_chunk: int = 0            # same for the flow net (pairs per
                                   # chunk) — the FlowNet2 cascade is the
                                   # HBM-bound config


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "coco"          # coco | posetrack | mpii
    root: str = "data/coco"
    train_set: str = "train2017"
    test_set: str = "val2017"
    data_format: str = "jpg"


@dataclass(frozen=True)
class MeshConfig:
    """SPMD layout. The reference's only parallelism is single-process
    DataParallel; the TPU-native equivalent is batch sharding over a 1-D
    mesh of chips on ICI (SURVEY.md section 6.8)."""

    data_axis: str = "data"
    num_devices: int = 0           # 0 = use all available


@dataclass(frozen=True)
class Config:
    name: str = "coco_res50_256x192"
    model: ModelConfig = field(default_factory=ModelConfig)
    flow: FlowConfig = field(default_factory=FlowConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    test: TestConfig = field(default_factory=TestConfig)
    track: TrackConfig = field(default_factory=TrackConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)


def _nested_replace(obj: Any, dotted: str, value: Any) -> Any:
    head, _, rest = dotted.partition(".")
    if not rest:
        cur = getattr(obj, head)
        if cur is not None and not isinstance(value, type(cur)):
            if isinstance(cur, bool):
                value = str(value).lower() in ("1", "true", "yes")
            elif isinstance(cur, int):
                value = int(value)
            elif isinstance(cur, float):
                value = float(value)
            elif isinstance(cur, tuple):
                value = tuple(type(cur[0])(v) for v in str(value).split(","))
        return replace(obj, **{head: value})
    return replace(obj, **{head: _nested_replace(getattr(obj, head), rest, value)})


def apply_overrides(cfg: Config, overrides) -> Config:
    """Apply dotted overrides: ['test.flip_test=false', 'model.num_layers=152']."""
    for item in overrides or ():
        key, _, val = item.partition("=")
        cfg = _nested_replace(cfg, key.strip().lower(), val.strip())
    return cfg


def load_yaml(path: str) -> Config:
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    cfg = Config()
    for section, values in raw.items():
        section = section.lower()
        if section == "name":
            cfg = replace(cfg, name=values)
            continue
        sub = getattr(cfg, section)
        kw = {}
        for k, v in values.items():
            k = k.lower()
            if isinstance(v, list):
                v = tuple(tuple(x) if isinstance(x, list) else x for x in v)
            kw[k] = v
        cfg = replace(cfg, **{section: replace(sub, **kw)})
    return cfg


def _res(num_layers: int, image_size, heatmap_size, sigma, name) -> Config:
    return Config(
        name=name,
        model=ModelConfig(num_layers=num_layers, image_size=image_size,
                          heatmap_size=heatmap_size, sigma=sigma),
    )


# The five driver configs from BASELINE.json "configs".
PRESETS = {
    "coco_res50_256x192": _res(50, (256, 192), (64, 48), 2.0, "coco_res50_256x192"),
    "coco_res50_384x288": _res(50, (384, 288), (96, 72), 3.0, "coco_res50_384x288"),
    "coco_res101_256x192": _res(101, (256, 192), (64, 48), 2.0, "coco_res101_256x192"),
    "coco_res101_384x288": _res(101, (384, 288), (96, 72), 3.0, "coco_res101_384x288"),
    "coco_res152_256x192": _res(152, (256, 192), (64, 48), 2.0, "coco_res152_256x192"),
    "coco_res152_384x288": _res(152, (384, 288), (96, 72), 3.0, "coco_res152_384x288"),
    "mpii_res50_256x256": dataclasses.replace(
        Config(name="mpii_res50_256x256",
               model=ModelConfig(num_layers=50, image_size=(256, 256),
                                 heatmap_size=(64, 64), sigma=2.0,
                                 num_joints=MPII_NUM_JOINTS)),
        data=DataConfig(dataset="mpii", root="data/mpii"),
    ),
    "flownet_s": Config(name="flownet_s", flow=FlowConfig(variant="flownet_s")),
    "flownet_c": Config(name="flownet_c", flow=FlowConfig(variant="flownet_c")),
    "flowtrack_posetrack": dataclasses.replace(
        _res(152, (256, 192), (64, 48), 2.0, "flowtrack_posetrack"),
        # PoseTrack set names are "train"/"val" (annotations/<set>.json),
        # not the COCO "train2017"/"val2017" defaults
        data=DataConfig(dataset="posetrack", root="data/posetrack",
                        train_set="train", test_set="val"),
    ),
}


def get_config(name: str) -> Config:
    if name in PRESETS:
        return PRESETS[name]
    if name.endswith((".yaml", ".yml")):
        return load_yaml(name)
    raise KeyError(f"unknown config {name!r}; presets: {sorted(PRESETS)}")
