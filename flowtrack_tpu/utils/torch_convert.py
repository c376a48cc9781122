"""One-way torch -> JAX weight converter (SURVEY.md section 6.4).

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
    return {k.removeprefix("module."): v.detach().cpu().numpy()
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


def convert_flownet_s(sd: Dict[str, np.ndarray]):
    """torch FlowNetS state_dict -> flax variables for models.flownet.FlowNetS.

    The lineage wraps each conv in a Sequential (conv.0 = Conv2d,
    conv.1 = LeakyReLU); accept both 'conv1.0.weight' and 'conv1.weight'.
    """
    params: dict = {}
    stats: dict = {}

    def grab(name):
        for cand in (f"{name}.0", name):
            if f"{cand}.weight" in sd:
                return cand
        raise KeyError(name)

    conv_names = ["conv1", "conv2", "conv3", "conv3_1", "conv4", "conv4_1",
                  "conv5", "conv5_1", "conv6", "conv6_1",
                  "deconv5", "deconv4", "deconv3", "deconv2",
                  "predict_flow6", "predict_flow5", "predict_flow4",
                  "predict_flow3", "predict_flow2",
                  "upsampled_flow6_to_5", "upsampled_flow5_to_4",
                  "upsampled_flow4_to_3", "upsampled_flow3_to_2"]
    for name in conv_names:
        if not any(k.startswith(name) for k in sd):
            continue
        t = grab(name)
        w = sd[f"{t}.weight"]
        if name.startswith(("deconv", "upsampled")):
            _set(params, (name, "kernel"), deconv_kernel(w))
        else:
            _set(params, (name, "kernel"), conv_kernel(w))
        if f"{t}.bias" in sd:
            _set(params, (name, "bias"), sd[f"{t}.bias"])
        # optional BN variant: conv.1 is BatchNorm2d
        if f"{name}.1.running_mean" in sd:
            _bn(params, stats, (f"{name}_bn",), f"{name}.1", sd)

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out
