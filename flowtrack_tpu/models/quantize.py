"""Post-training int8 quantization for PoseResNet inference (W8A8).

A TPU-native serving lever beyond the reference (which runs fp32 cuDNN):
the v5e MXU executes int8 at 2x the bf16 rate (int8 conv measured ~3x
faster than bf16 on this chip). Standard PTQ recipe:

  1. **BN folding**: every conv+BN pair collapses into conv(+bias) with
     w' = w * gamma / sqrt(var + eps) (per out-channel),
     b' = beta - gamma * mean / sqrt(var + eps) — exact at inference.
  2. **Weight quantization**: symmetric per-output-channel int8.
  3. **Activation quantization**: symmetric per-tensor int8 with absmax
     scales collected by a calibration pass (mutable 'quant' collection).
  4. The final 1x1 heatmap head stays bf16/fp32 (decode precision).

``PoseResNetQ`` mirrors PoseResNet's topology minus BN;
``fold_pose_resnet`` converts trained float variables; ``calibrate`` runs
representative batches to populate activation scales. Accuracy contract is
pinned by tests: folded-fp32 == original exactly (tolerance), and int8 AP
on the synthetic closed loop stays within a point of fp32.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from flowtrack_tpu.config import ModelConfig
from flowtrack_tpu.models.layers import (_precision_for,
                                         max_pool_same_as_torch)
from flowtrack_tpu.models.pose_resnet import RESNET_SPECS


class QuantConv(nn.Module):
    """Conv(+bias) with optional int8 W8A8 execution.

    Modes: calibrate=True records the input absmax into the mutable
    'quant' collection and runs float; quantized=False runs float (folded
    baseline); quantized=True runs int8 — unless ``mixed`` is set, in which
    case int8 applies only where it wins on this hardware (measured,
    STATUS.md): 1x1 convs (pure matmuls, 3.4x) and <=64-channel inputs
    (stage-1 3x3, 4.5x); XLA's int8 lowering is SLOWER for 128+-channel
    3x3 at small spatial dims, so those stay in ``compute_dtype``."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 0
    transpose: bool = False
    mixed: bool = False
    prequantized: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, calibrate: bool = False, quantized: bool = True):
        k, s, p = self.kernel_size, self.strides, self.padding
        cin = x.shape[-1]
        if self.mixed and quantized:
            quantized = (not self.transpose) and (k == 1 or cin <= 64)

        if self.transpose:
            conv_kw = dict(window_strides=(1, 1),
                           padding=[(k - 1 - p, k - 1 - p)] * 2,
                           lhs_dilation=(s, s),
                           dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            conv_kw = dict(window_strides=(s, s),
                           padding=[(p, p), (p, p)],
                           dimension_numbers=("NHWC", "HWIO", "NHWC"))

        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        amax = self.variable("quant", "amax",
                             lambda: jnp.zeros((), jnp.float32))

        if self.prequantized:
            # weights stored ALREADY int8 (+fp32 per-channel scale): no
            # per-call round/clip/cast and half the weight HBM traffic
            # (round-2 lead (a), STATUS.md). Inference-only: calibration
            # runs on the float-kernel model before prequantize_params.
            assert quantized and not calibrate, \
                "prequantized QuantConv is int8-inference-only"
            wq = self.param("wq", nn.initializers.zeros,
                            (k, k, cin, self.features), jnp.int8)
            w_scale = self.param(
                "w_scale", lambda *_: jnp.ones((self.features,),
                                               jnp.float32))
            a_scale = jnp.maximum(amax.value, 1e-6) / 127.0
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale),
                          -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, wq, preferred_element_type=jnp.int32, **conv_kw)
            return y.astype(jnp.float32) * (a_scale * w_scale) + bias

        kernel = self.param("kernel", nn.initializers.zeros,
                            (k, k, cin, self.features), jnp.float32)

        if calibrate:
            if not self.is_initializing():
                amax.value = jnp.maximum(amax.value,
                                         jnp.max(jnp.abs(x)))
            quantized = False

        if not quantized:
            dt = jnp.dtype(self.compute_dtype)
            y = jax.lax.conv_general_dilated(
                x.astype(dt), kernel.astype(dt),
                precision=_precision_for(dt), **conv_kw)
            return y.astype(jnp.float32) + bias

        a_scale = jnp.maximum(amax.value, 1e-6) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale),
                      -127, 127).astype(jnp.int8)
        w_scale = jnp.maximum(
            jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12) / 127.0
        wq = jnp.clip(jnp.round(kernel / w_scale), -127, 127) \
            .astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, wq, preferred_element_type=jnp.int32, **conv_kw)
        return y.astype(jnp.float32) * (a_scale * w_scale) + bias


class _QBlock(nn.Module):
    """Bottleneck/basic residual block, BN pre-folded."""

    block: str
    features: int
    strides: int = 1
    downsample: bool = False
    mixed: bool = False
    prequantized: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, calibrate=False, quantized=True):
        kw = dict(calibrate=calibrate, quantized=quantized)
        mk = dict(mixed=self.mixed, prequantized=self.prequantized,
                  compute_dtype=self.compute_dtype)
        residual = x
        if self.block == "bottleneck":
            y = QuantConv(self.features, 1, 1, 0, name="conv1", **mk)(x, **kw)
            y = nn.relu(y)
            y = QuantConv(self.features, 3, self.strides, 1,
                          name="conv2", **mk)(y, **kw)
            y = nn.relu(y)
            y = QuantConv(self.features * 4, 1, 1, 0, name="conv3", **mk)(y, **kw)
            out_f = self.features * 4
        else:
            y = QuantConv(self.features, 3, self.strides, 1,
                          name="conv1", **mk)(x, **kw)
            y = nn.relu(y)
            y = QuantConv(self.features, 3, 1, 1, name="conv2", **mk)(y, **kw)
            out_f = self.features
        if self.downsample:
            residual = QuantConv(out_f, 1, self.strides, 0,
                                 name="downsample_conv", **mk)(x, **kw)
        return nn.relu(y + residual)


class PoseResNetQ(nn.Module):
    """int8-inference PoseResNet (BN folded away). Same topology and
    conv names as models.pose_resnet.PoseResNet. ``mixed`` applies int8
    only where it beats ``compute_dtype`` on this hardware."""

    cfg: ModelConfig
    mixed: bool = False
    prequantized: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, calibrate: bool = False, quantized: bool = True):
        kw = dict(calibrate=calibrate, quantized=quantized)
        mk = dict(mixed=self.mixed, prequantized=self.prequantized,
                  compute_dtype=self.compute_dtype)
        block, stages = RESNET_SPECS[self.cfg.num_layers]
        x = x.astype(jnp.float32)
        x = QuantConv(64, 7, 2, 3, name="conv1", **mk)(x, **kw)
        x = nn.relu(x)
        x = max_pool_same_as_torch(x, 3, 2, 1)

        expansion = 4 if block == "bottleneck" else 1
        in_features = 64
        for stage, num_blocks in enumerate(stages):
            features = 64 * (2 ** stage)
            strides = 1 if stage == 0 else 2
            for b in range(num_blocks):
                down = b == 0 and (strides != 1
                                   or in_features != features * expansion)
                x = _QBlock(block=block, features=features,
                            strides=strides if b == 0 else 1,
                            downsample=down, **mk,
                            name=f"layer{stage + 1}_{b}")(x, **kw)
            in_features = features * expansion

        for i in range(self.cfg.num_deconv_layers):
            k = self.cfg.num_deconv_kernels[i]
            x = QuantConv(self.cfg.num_deconv_filters[i], k, 2,
                          (k - 2) // 2, transpose=True, **mk,
                          name=f"deconv{i}")(x, **kw)
            x = nn.relu(x)

        # final head stays float (decode precision)
        k = self.cfg.final_conv_kernel
        kernel = self.param("final_kernel", nn.initializers.zeros,
                            (k, k, x.shape[-1], self.cfg.num_joints),
                            jnp.float32)
        bias = self.param("final_bias", nn.initializers.zeros,
                          (self.cfg.num_joints,), jnp.float32)
        pad = (k - 1) // 2
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), kernel, (1, 1), [(pad, pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=_precision_for(jnp.float32))
        return y + bias


# ---------------------------------------------------------------------------
# Float -> folded conversion + calibration
# ---------------------------------------------------------------------------


def _fold(kernel, bn, transpose_bias=None):
    """conv kernel (HWIO fp32) + BN params -> (folded kernel, bias)."""
    gamma = np.asarray(bn["scale"], np.float64)
    beta = np.asarray(bn["bias"], np.float64)
    mean = np.asarray(bn["mean"], np.float64)
    var = np.asarray(bn["var"], np.float64)
    inv = gamma / np.sqrt(var + 1e-5)
    w = np.asarray(kernel, np.float64) * inv  # broadcast over out channels
    b = beta - mean * inv
    if transpose_bias is not None:
        b = b + np.asarray(transpose_bias, np.float64) * inv
    return w.astype(np.float32), b.astype(np.float32)


def fold_pose_resnet(variables) -> dict:
    """PoseResNet float variables -> PoseResNetQ params (BN folded)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    bp = params["backbone"]
    bs = stats["backbone"]
    out: dict = {}

    def put(dst_path, kernel, bias):
        node = out
        for p in dst_path[:-1]:
            node = node.setdefault(p, {})
        node[dst_path[-1]] = {"kernel": jnp.asarray(kernel),
                              "bias": jnp.asarray(bias)}

    k, b = _fold(bp["conv1"]["kernel"], {**bp["bn1"], **bs["bn1"]})
    put(("conv1",), k, b)

    for name in bp:
        if not name.startswith("layer"):
            continue
        blk_p, blk_s = bp[name], bs[name]
        for ci in ("conv1", "conv2", "conv3"):
            if ci not in blk_p:
                continue
            bn = "bn" + ci[-1]
            k, b = _fold(blk_p[ci]["kernel"], {**blk_p[bn], **blk_s[bn]})
            put((name, ci), k, b)
        if "downsample_conv" in blk_p:
            k, b = _fold(blk_p["downsample_conv"]["kernel"],
                         {**blk_p["downsample_bn"],
                          **blk_s["downsample_bn"]})
            put((name, "downsample_conv"), k, b)

    n_deconv = len([d for d in params
                    if d.startswith("deconv") and "bn" not in d])
    for i in range(n_deconv):
        dname = f"deconv{i}"
        bn = f"deconv_bn{i}"
        tb = params[dname].get("bias")
        k, b = _fold(params[dname]["kernel"], {**params[bn], **stats[bn]},
                     transpose_bias=tb)
        put((dname,), k, b)

    out["final_kernel"] = jnp.asarray(params["final"]["kernel"])
    out["final_bias"] = jnp.asarray(params["final"].get(
        "bias", np.zeros(params["final"]["kernel"].shape[-1], np.float32)))
    return out


def prequantize_params(folded_params):
    """Folded float params -> prequantized tree: every {kernel, bias} conv
    node becomes {wq int8, w_scale fp32/channel, bias} with EXACTLY the
    same quantization math QuantConv applies at runtime (pinned by test:
    outputs are bitwise-identical). The float final head is untouched."""
    def walk(node):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict) and set(v) == {"kernel", "bias"}:
                kern = np.asarray(v["kernel"], np.float32)
                ws = np.maximum(np.abs(kern).max(axis=(0, 1, 2)),
                                1e-12) / 127.0
                wq = np.clip(np.round(kern / ws), -127, 127).astype(np.int8)
                out[k] = {"wq": jnp.asarray(wq),
                          "w_scale": jnp.asarray(ws, jnp.float32),
                          "bias": v["bias"]}
            elif isinstance(v, dict):
                out[k] = walk(v)
            else:
                out[k] = v  # final_kernel / final_bias float leaves
        return out
    return walk(folded_params)


def make_quant_variables(model: PoseResNetQ, folded_params, sample_input):
    """Assemble {params, quant} with zeroed activation scales."""
    init = jax.jit(model.init,
                   static_argnames=("calibrate", "quantized"))(
        jax.random.PRNGKey(0), sample_input, calibrate=False,
        quantized=False)
    return {"params": folded_params, "quant": init["quant"]}


class QuantPoseAdapter:
    """Adapts PoseResNetQ to the float-model apply(variables, x, train=...)
    signature so PosePredictor/ClipTracker can run int8 pose unchanged."""

    def __init__(self, qmodel: PoseResNetQ):
        self.qmodel = qmodel

    def apply(self, variables, x, train: bool = False):
        assert not train, "quantized model is inference-only"
        return self.qmodel.apply(variables, x, calibrate=False,
                                 quantized=True)


def quantize_pose_model(float_model, float_variables, cfg: ModelConfig,
                        calib_batches, mixed: bool = False,
                        prequantized: bool = False,
                        compute_dtype=jnp.float32):
    """One-call PTQ: float PoseResNet -> (adapter, quant variables).

    mixed=True: int8 only where it wins on this hardware (1x1 convs and
    <=64-ch 3x3), everything else in ``compute_dtype`` (use bf16).
    prequantized=True (full-int8 only): weights stored int8 at conversion
    time — removes the per-call weight round/clip/cast and halves weight
    HBM traffic."""
    qmodel = PoseResNetQ(cfg=cfg, mixed=mixed, compute_dtype=compute_dtype)
    folded = fold_pose_resnet(float_variables)
    qvars = make_quant_variables(qmodel, folded, calib_batches[0])
    qvars = calibrate(qmodel, qvars, calib_batches)
    if prequantized:
        assert not mixed, "prequantized supports the full-int8 mode only"
        qmodel = PoseResNetQ(cfg=cfg, prequantized=True,
                             compute_dtype=compute_dtype)
        qvars = {"params": prequantize_params(qvars["params"]),
                 "quant": qvars["quant"]}
    return QuantPoseAdapter(qmodel), qvars


def calibrate(model: PoseResNetQ, variables, batches):
    """Run representative batches, accumulating activation absmax."""
    quant = variables["quant"]
    for x in batches:
        _, mutated = model.apply(
            {"params": variables["params"], "quant": quant},
            x, calibrate=True, mutable=["quant"])
        quant = mutated["quant"]
    return {"params": variables["params"], "quant": quant}
