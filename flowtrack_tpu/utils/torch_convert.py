"""torch <-> JAX weight converter (SURVEY.md section 6.4).

Forward direction (torch state_dict -> flax variables) below; reverse
direction (flax -> torch, for deploying TPU-trained weights on the
reference stack) at the bottom of the file.

Converts a torch ``state_dict`` (as a name -> numpy array mapping; call
``load_torch_file`` to read a .pth when torch is installed) into the flax
variable tree {'params': ..., 'batch_stats': ...} for our models.

Layout rules (pinned by golden tests in tests/test_pose_resnet_parity.py):
  * Conv2d weight (Cout, Cin, kH, kW)        -> HWIO: transpose(2, 3, 1, 0)
  * ConvTranspose2d weight (Cin, Cout, kH, kW) -> our flipped-HWIO deconv
    kernel: transpose(2, 3, 0, 1) then flip both spatial axes (our deconv is
    an input-dilated conv, see models/layers.py).
  * BatchNorm: weight->scale, bias->bias, running_mean/var->batch_stats.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("module.")
        out[k] = v.detach().cpu().numpy()
    return out


def state_dict_to_numpy(sd) -> Dict[str, np.ndarray]:
    # .numpy() ALIASES the tensor's memory — copy so the snapshot survives
    # in-place mutation (e.g. BN running-stat updates on a later forward)
    return {k.removeprefix("module."): v.detach().cpu().numpy().copy()
            for k, v in sd.items()}


def conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def deconv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def _set(tree: dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def _bn(params, stats, flax_path, torch_prefix, sd):
    _set(params, flax_path + ("scale",), sd[torch_prefix + ".weight"])
    _set(params, flax_path + ("bias",), sd[torch_prefix + ".bias"])
    _set(stats, flax_path + ("mean",), sd[torch_prefix + ".running_mean"])
    _set(stats, flax_path + ("var",), sd[torch_prefix + ".running_var"])


def convert_pose_resnet(sd: Dict[str, np.ndarray], num_deconv_layers: int = 3):
    """torch PoseResNet state_dict -> flax variables for models.PoseResNet.

    Accepts both head naming schemes in the lineage:
    ``deconv_layers.{0,3,6}`` Sequential indices and ``final_layer``.
    """
    params: dict = {}
    stats: dict = {}
    b = ("backbone",)

    _set(params, b + ("conv1", "kernel"), conv_kernel(sd["conv1.weight"]))
    _bn(params, stats, b + ("bn1",), "bn1", sd)

    layer_re = re.compile(r"^layer(\d+)\.(\d+)\.(.+)$")
    seen = set()
    for key in sd:
        m = layer_re.match(key)
        if not m:
            continue
        li, bi, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        blk = b + (f"layer{li}_{bi}",)
        tprefix = f"layer{li}.{bi}"
        tag = (li, bi)
        if tag in seen:
            continue
        seen.add(tag)
        for ci in (1, 2, 3):
            wk = f"{tprefix}.conv{ci}.weight"
            if wk not in sd:
                continue
            _set(params, blk + (f"conv{ci}", "kernel"), conv_kernel(sd[wk]))
            _bn(params, stats, blk + (f"bn{ci}",), f"{tprefix}.bn{ci}", sd)
        if f"{tprefix}.downsample.0.weight" in sd:
            _set(params, blk + ("downsample_conv", "kernel"),
                 conv_kernel(sd[f"{tprefix}.downsample.0.weight"]))
            _bn(params, stats, blk + ("downsample_bn",),
                f"{tprefix}.downsample.1", sd)

    for i in range(num_deconv_layers):
        wkey = f"deconv_layers.{3 * i}.weight"
        bnp = f"deconv_layers.{3 * i + 1}"
        _set(params, (f"deconv{i}", "kernel"), deconv_kernel(sd[wkey]))
        if f"deconv_layers.{3 * i}.bias" in sd:
            _set(params, (f"deconv{i}", "bias"), sd[f"deconv_layers.{3 * i}.bias"])
        _bn(params, stats, (f"deconv_bn{i}",), bnp, sd)

    _set(params, ("final", "kernel"), conv_kernel(sd["final_layer.weight"]))
    if "final_layer.bias" in sd:
        _set(params, ("final", "bias"), sd["final_layer.bias"])

    return {"params": params, "batch_stats": stats}


def convert_resnet_backbone(sd: Dict[str, np.ndarray]):
    """torchvision-style ResNet state_dict (conv1/bn1/layerL.B.*; fc and
    avgpool ignored) -> the PoseResNet 'backbone' params/batch_stats
    subtrees. The reference's ImageNet initialization path (SURVEY.md
    section 3 PoseResNet row: "ImageNet init")."""
    params: dict = {}
    stats: dict = {}
    b = ("backbone",)
    _set(params, b + ("conv1", "kernel"), conv_kernel(sd["conv1.weight"]))
    _bn(params, stats, b + ("bn1",), "bn1", sd)
    layer_re = re.compile(r"^layer(\d+)\.(\d+)\.(.+)$")
    seen = set()
    for key in sd:
        m = layer_re.match(key)
        if not m:
            continue
        li, bi = int(m.group(1)), int(m.group(2))
        if (li, bi) in seen:
            continue
        seen.add((li, bi))
        blk = b + (f"layer{li}_{bi}",)
        tprefix = f"layer{li}.{bi}"
        for ci in (1, 2, 3):
            wk = f"{tprefix}.conv{ci}.weight"
            if wk not in sd:
                continue
            _set(params, blk + (f"conv{ci}", "kernel"), conv_kernel(sd[wk]))
            _bn(params, stats, blk + (f"bn{ci}",), f"{tprefix}.bn{ci}", sd)
        if f"{tprefix}.downsample.0.weight" in sd:
            _set(params, blk + ("downsample_conv", "kernel"),
                 conv_kernel(sd[f"{tprefix}.downsample.0.weight"]))
            _bn(params, stats, blk + ("downsample_bn",),
                f"{tprefix}.downsample.1", sd)
    return {"params": params, "batch_stats": stats}


def overlay_variables(dst: dict, src: dict) -> dict:
    """Recursively overwrite leaves of ``dst`` that appear in the (possibly
    partial) tree ``src``; everything else keeps dst's values. Used to
    overlay converted backbone weights onto a fresh init (and by
    tools/train.py --imagenet-backbone with a pre-converted .npz)."""
    out = dict(dst)
    for k, v in src.items():
        out[k] = overlay_variables(dst[k], v) if isinstance(v, dict) else v
    return out


def overlay_backbone(variables: dict, conv: dict) -> dict:
    """Overlay an already-converted backbone tree (``conv`` =
    convert_resnet_backbone output, or its .npz round trip) onto full
    PoseResNet variables; the head keeps its existing init."""
    out = dict(variables)
    out["params"] = overlay_variables(
        variables["params"], {"backbone": conv["params"]["backbone"]})
    out["batch_stats"] = overlay_variables(
        variables.get("batch_stats", {}),
        {"backbone": conv["batch_stats"]["backbone"]})
    return out


def init_backbone_from_imagenet(variables: dict, sd: Dict[str, np.ndarray]):
    """Overlay ImageNet backbone weights onto freshly-initialized PoseResNet
    variables (head stays at its random init, as the reference does)."""
    return overlay_backbone(variables, convert_resnet_backbone(sd))


# ---------------------------------------------------------------------------
# FlowNet family (models/flownet.py trees).
#
# torch naming (flownet2-pytorch lineage): encoder convs and deconvs are
# Sequential-wrapped ('conv1.0.weight' = Conv2d, 'conv1.1.*' = BatchNorm2d in
# the _bn variant); predict_flow / upsampled_flow layers are bare modules.
# Flax nesting (see models/flownet.py): ConvLeaky/IConv own an inner "conv"
# (+ "bn"); Deconv owns an inner "deconv"; predict_flow / upsampled_flow are
# direct conv / ConvTransposeTorch modules.
# ---------------------------------------------------------------------------

# Names the shared _RefinementTrunk owns in FlowNetS / FlowNetC.
_TRUNK_NAMES = frozenset(
    [f"predict_flow{i}" for i in range(2, 7)]
    + [f"deconv{i}" for i in range(2, 6)]
    + [f"upsampled_flow{i}_to_{i - 1}" for i in range(3, 7)]
)


def _module_names(sd, prefix=""):
    names = set()
    for k in sd:
        if not k.startswith(prefix):
            continue
        rest = k[len(prefix):]
        names.add(rest.split(".")[0])
    return names


def _convert_flownet_layer(params, stats, sd, name, flax_scope, prefix=""):
    """Convert one lineage layer (conv/deconv/predict/upsample) by name."""
    tkey = None
    for cand in (f"{prefix}{name}.0", f"{prefix}{name}"):
        if f"{cand}.weight" in sd:
            tkey = cand
            break
    if tkey is None:
        raise KeyError(f"{prefix}{name}")
    w = sd[f"{tkey}.weight"]

    if name.startswith("upsampled_flow"):
        path = flax_scope + (name,)
        _set(params, path + ("kernel",), deconv_kernel(w))
    elif name.startswith("predict_flow"):
        path = flax_scope + (name,)
        _set(params, path + ("kernel",), conv_kernel(w))
    elif name.startswith("deconv"):
        path = flax_scope + (name, "deconv")
        _set(params, path + ("kernel",), deconv_kernel(w))
    else:  # ConvLeaky / IConv wrapper
        path = flax_scope + (name, "conv")
        _set(params, path + ("kernel",), conv_kernel(w))
    if f"{tkey}.bias" in sd:
        _set(params, path + ("bias",), sd[f"{tkey}.bias"])
    # optional BN variant: Sequential index 1 is BatchNorm2d
    if f"{prefix}{name}.1.running_mean" in sd:
        _bn(params, stats, flax_scope + (name, "bn"), f"{prefix}{name}.1", sd)


def _convert_flownet_module(sd, prefix="", trunk_names=_TRUNK_NAMES):
    params: dict = {}
    stats: dict = {}
    for name in sorted(_module_names(sd, prefix)):
        scope = ("trunk",) if name in trunk_names else ()
        _convert_flownet_layer(params, stats, sd, name, scope, prefix)
    return params, stats


def convert_flownet_s(sd: Dict[str, np.ndarray]):
    """torch FlowNetS state_dict -> flax variables (models.flownet.FlowNetS).

    Also correct for FlowNetC (same name map; conv_redir is a ConvLeaky)."""
    params, stats = _convert_flownet_module(sd)
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


convert_flownet_c = convert_flownet_s


def convert_flownet_sd(sd: Dict[str, np.ndarray]):
    """torch FlowNetSD / FlowNetFusion state_dict -> flax variables.

    These variants have no shared trunk: every layer is top-level."""
    params, stats = _convert_flownet_module(sd, trunk_names=frozenset())
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


convert_flownet_fusion = convert_flownet_sd

_FLOWNET2_SUBNETS = {
    "flownetc": _TRUNK_NAMES,
    "flownets_1": _TRUNK_NAMES,
    "flownets_2": _TRUNK_NAMES,
    "flownets_d": frozenset(),
    "flownetfusion": frozenset(),
}


def convert_flownet2(sd: Dict[str, np.ndarray]):
    """torch FlowNet2 (full stack) state_dict -> flax variables."""
    params: dict = {}
    stats: dict = {}
    for sub, trunk in _FLOWNET2_SUBNETS.items():
        p, s = _convert_flownet_module(sd, prefix=f"{sub}.",
                                       trunk_names=trunk)
        if p:
            params[sub] = p
        if s:
            stats[sub] = s
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


# FlowNet2-CS / FlowNet2-CSS checkpoints carry a subset of the full
# stack's subnets; the per-subnet loop in convert_flownet2 already skips absent
# prefixes, so the same converter applies.
convert_flownet2_cs = convert_flownet2
convert_flownet2_css = convert_flownet2


# ---------------------------------------------------------------------------
# Reverse direction: JAX variables -> torch state_dict.
#
# Lets TPU-trained weights flow BACK to the reference stack (deployment on
# the old torch pipeline, cross-checking against torch tooling). Exact
# inverses of the layout rules above; round-trip equality and
# torch-forward parity are pinned in tests/test_torch_ckpt_load.py.
# Emitted names use the lineage-canonical forms the forward converter
# accepts: Sequential-wrapped convs/deconvs ('conv1.0.weight'), bare
# predict_flow / upsampled_flow modules, 'deconv_layers.{3i}' heads.
# ---------------------------------------------------------------------------


def conv_kernel_to_torch(w: np.ndarray) -> np.ndarray:
    """HWIO -> torch Conv2d (Cout, Cin, kH, kW)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))


def deconv_kernel_to_torch(w: np.ndarray) -> np.ndarray:
    """Our flipped-HWIO deconv kernel -> torch ConvTranspose2d
    (Cin, Cout, kH, kW): unflip both spatial axes, then the (involutive)
    transpose back."""
    w = np.asarray(w)[::-1, ::-1]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def _bn_to_torch(sd: dict, torch_prefix: str, pnode: dict, snode: dict):
    sd[torch_prefix + ".weight"] = np.asarray(pnode["scale"])
    sd[torch_prefix + ".bias"] = np.asarray(pnode["bias"])
    sd[torch_prefix + ".running_mean"] = np.asarray(snode["mean"])
    sd[torch_prefix + ".running_var"] = np.asarray(snode["var"])
    # torch BatchNorm2d tracks this buffer; 0 is torch's own fresh value
    sd[torch_prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)


def reverse_pose_resnet(variables: dict) -> Dict[str, np.ndarray]:
    """Flax PoseResNet variables -> torch state_dict (lineage naming:
    conv1/bn1/layerL.B.*/deconv_layers.{3i}/final_layer). Inverse of
    convert_pose_resnet."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    bb, bbs = params["backbone"], stats.get("backbone", {})
    sd: Dict[str, np.ndarray] = {}
    sd["conv1.weight"] = conv_kernel_to_torch(bb["conv1"]["kernel"])
    _bn_to_torch(sd, "bn1", bb["bn1"], bbs["bn1"])
    blk_re = re.compile(r"^layer(\d+)_(\d+)$")
    for name in sorted(bb):
        m = blk_re.match(name)
        if not m:
            continue
        tp = f"layer{m.group(1)}.{m.group(2)}"
        blk, blks = bb[name], bbs[name]
        for ci in (1, 2, 3):
            if f"conv{ci}" not in blk:
                continue
            sd[f"{tp}.conv{ci}.weight"] = conv_kernel_to_torch(
                blk[f"conv{ci}"]["kernel"])
            _bn_to_torch(sd, f"{tp}.bn{ci}", blk[f"bn{ci}"], blks[f"bn{ci}"])
        if "downsample_conv" in blk:
            sd[f"{tp}.downsample.0.weight"] = conv_kernel_to_torch(
                blk["downsample_conv"]["kernel"])
            _bn_to_torch(sd, f"{tp}.downsample.1", blk["downsample_bn"],
                         blks["downsample_bn"])
    i = 0
    while f"deconv{i}" in params:
        node = params[f"deconv{i}"]
        sd[f"deconv_layers.{3 * i}.weight"] = deconv_kernel_to_torch(
            node["kernel"])
        if "bias" in node:
            sd[f"deconv_layers.{3 * i}.bias"] = np.asarray(node["bias"])
        _bn_to_torch(sd, f"deconv_layers.{3 * i + 1}",
                     params[f"deconv_bn{i}"], stats[f"deconv_bn{i}"])
        i += 1
    sd["final_layer.weight"] = conv_kernel_to_torch(params["final"]["kernel"])
    if "bias" in params["final"]:
        sd["final_layer.bias"] = np.asarray(params["final"]["bias"])
    return sd


def _reverse_flownet_layer(sd: dict, name: str, node: dict,
                           bn_stats, prefix: str):
    if name.startswith("upsampled_flow"):
        sd[f"{prefix}{name}.weight"] = deconv_kernel_to_torch(node["kernel"])
        bkey = f"{prefix}{name}.bias"
    elif name.startswith("predict_flow"):
        sd[f"{prefix}{name}.weight"] = conv_kernel_to_torch(node["kernel"])
        bkey = f"{prefix}{name}.bias"
    elif name.startswith("deconv"):
        node = node["deconv"]
        sd[f"{prefix}{name}.0.weight"] = deconv_kernel_to_torch(node["kernel"])
        bkey = f"{prefix}{name}.0.bias"
    else:  # ConvLeaky / IConv wrapper
        inner = node["conv"]
        sd[f"{prefix}{name}.0.weight"] = conv_kernel_to_torch(inner["kernel"])
        if "bn" in node:
            _bn_to_torch(sd, f"{prefix}{name}.1", node["bn"], bn_stats)
        node, bkey = inner, f"{prefix}{name}.0.bias"
    if "bias" in node:
        sd[bkey] = np.asarray(node["bias"])


def _reverse_flownet_module(variables: dict, prefix: str = ""):
    sd: Dict[str, np.ndarray] = {}

    def walk(pnode, snode):
        for name in sorted(pnode):
            if name == "trunk":
                walk(pnode[name], snode.get(name, {}))
                continue
            bn_stats = snode.get(name, {}).get("bn")
            _reverse_flownet_layer(sd, name, pnode[name], bn_stats, prefix)

    walk(variables["params"], variables.get("batch_stats", {}))
    return sd


def reverse_flownet(variables: dict) -> Dict[str, np.ndarray]:
    """Flax FlowNetS/C/SD/Fusion variables -> torch state_dict. Inverse of
    convert_flownet_s / convert_flownet_sd (the trunk nesting is flattened
    back to top-level lineage names)."""
    return _reverse_flownet_module(variables)


def reverse_flownet2(variables: dict) -> Dict[str, np.ndarray]:
    """Flax FlowNet2(-CS/-CSS) variables -> torch state_dict with per-subnet
    'flownetc.' / 'flownets_1.' ... prefixes. Inverse of convert_flownet2."""
    sd: Dict[str, np.ndarray] = {}
    stats = variables.get("batch_stats", {})
    for sub in variables["params"]:
        sd.update(_reverse_flownet_module(
            {"params": variables["params"][sub],
             "batch_stats": stats.get(sub, {})}, prefix=f"{sub}."))
    return sd
