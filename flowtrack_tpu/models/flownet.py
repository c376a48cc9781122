"""FlowNet family — optical-flow models, TPU-native (Flax/NHWC).

Behavior contract (SURVEY.md section 3 "FlowNetS"/"FlowNetC"/"FlowNet2
stack" rows; reference lineage: models/flownet/*.py in the
NVIDIA/flownet2-pytorch mold — mount empty, architectures per FlowNet
arXiv:1504.06852 and FlowNet2 arXiv:1612.01925):

  * FlowNetS: 6-ch input (two stacked RGB frames), 9-conv contracting path
    (64..1024 ch, LeakyReLU 0.1, stride-2 downs to 1/64) + 4 refinement
    levels, each: deconv + skip-concat + upsampled coarser flow, 3x3
    ``predict_flow`` heads (2 ch). Output at 1/4 input res; the network is
    trained on flow / div_flow (div_flow = 20).
  * FlowNetC: siamese 3-conv feature towers to 1/8, correlation cost volume
    (441 ch, ops/correlation.py) + 32-ch conv_redir, then the FlowNetS-style
    trunk from conv3_1 (473 -> 256) down.
  * FlowNetSD ("small displacement"): all-3x3 variant with inter_conv
    (no-activation) heads before each predict_flow.
  * FlowNet2: FlowNetC -> warp/brightness-error -> FlowNetS1 -> FlowNetS2
    (the "CSS" cascade), a parallel FlowNetSD branch, and FlowNetFusion
    merging both at full resolution. Warp = ops/warp.resample2d; brightness
    error = ops/warp.channelnorm.

TPU-first choices: NHWC, bfloat16 compute / fp32 params, the correlation is
a Pallas kernel (XLA fallback for training/backward), and the whole cascade
is one jit-compiled program — the reference crosses the CUDA-extension
boundary 5+ times per FlowNet2 step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from flowtrack_tpu.config import FlowConfig
from flowtrack_tpu.models.layers import ConvTransposeTorch, batch_norm, conv
from flowtrack_tpu.ops.correlation import correlation
from flowtrack_tpu.ops.warp import channelnorm, resample2d

LEAK = 0.1


class ConvLeaky(nn.Module):
    """conv(batchNorm, ...) of the lineage: Conv2d (+BN) + LeakyReLU(0.1)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    use_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2
        y = conv(self.features, self.kernel_size, self.strides, pad,
                 use_bias=not self.use_bn, dtype=self.dtype, name="conv")(x)
        if self.use_bn:
            y = batch_norm(train, self.dtype, name="bn")(y)
        return nn.leaky_relu(y, LEAK)


class IConv(nn.Module):
    """i_conv of the lineage: Conv2d (+BN), NO activation."""

    features: int
    kernel_size: int = 3
    use_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2
        y = conv(self.features, self.kernel_size, 1, pad,
                 use_bias=not self.use_bn, dtype=self.dtype, name="conv")(x)
        if self.use_bn:
            y = batch_norm(train, self.dtype, name="bn")(y)
        return y


class Deconv(nn.Module):
    """deconv of the lineage: ConvTranspose2d(4, 2, 1, bias) + LeakyReLU."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ConvTransposeTorch(features=self.features, kernel_size=4,
                               strides=2, padding=1, use_bias=True,
                               dtype=self.dtype, name="deconv")(x)
        return nn.leaky_relu(y, LEAK)


def _predict_flow(name, dtype):
    """predict_flow of the lineage: 3x3 conv -> 2 channels, bias, no act."""
    return conv(2, 3, 1, 1, use_bias=True, dtype=dtype, name=name)


def _upflow(name, dtype):
    """upsampled_flow deconv: ConvTranspose2d(2, 2, 4, 2, 1, bias=False)."""
    return ConvTransposeTorch(features=2, kernel_size=4, strides=2,
                              padding=1, use_bias=False, dtype=dtype,
                              name=name)


class _RefinementTrunk(nn.Module):
    """The shared FlowNetS/C decode path from out_conv6 down to flow2.

    Takes the encoder skips (out_conv2, out_conv3, out_conv4, out_conv5) and
    out_conv6; returns (flow2, flow3, flow4, flow5, flow6).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, out_conv2, out_conv3, out_conv4, out_conv5, out_conv6):
        dt = self.dtype
        flow6 = _predict_flow("predict_flow6", dt)(out_conv6)
        flow6_up = _upflow("upsampled_flow6_to_5", dt)(flow6)
        out_deconv5 = Deconv(512, dt, name="deconv5")(out_conv6)

        concat5 = jnp.concatenate([out_conv5, out_deconv5, flow6_up], axis=-1)
        flow5 = _predict_flow("predict_flow5", dt)(concat5)
        flow5_up = _upflow("upsampled_flow5_to_4", dt)(flow5)
        out_deconv4 = Deconv(256, dt, name="deconv4")(concat5)

        concat4 = jnp.concatenate([out_conv4, out_deconv4, flow5_up], axis=-1)
        flow4 = _predict_flow("predict_flow4", dt)(concat4)
        flow4_up = _upflow("upsampled_flow4_to_3", dt)(flow4)
        out_deconv3 = Deconv(128, dt, name="deconv3")(concat4)

        concat3 = jnp.concatenate([out_conv3, out_deconv3, flow4_up], axis=-1)
        flow3 = _predict_flow("predict_flow3", dt)(concat3)
        flow3_up = _upflow("upsampled_flow3_to_2", dt)(flow3)
        out_deconv2 = Deconv(64, dt, name="deconv2")(concat3)

        concat2 = jnp.concatenate([out_conv2, out_deconv2, flow3_up], axis=-1)
        flow2 = _predict_flow("predict_flow2", dt)(concat2)
        return flow2, flow3, flow4, flow5, flow6


class FlowNetS(nn.Module):
    """FlowNetSimple. Input (N, H, W, 6) = two stacked normalized frames.

    Returns flow2 (N, H/4, W/4, 2) at inference; the (flow2..flow6) pyramid
    when ``train=True`` (multi-scale EPE training). H, W must be /64.
    """

    use_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt, bn = self.dtype, self.use_bn
        x = x.astype(dt)
        c = lambda f, k, s, name: ConvLeaky(f, k, s, bn, dt, name=name)
        out_conv1 = c(64, 7, 2, "conv1")(x, train)
        out_conv2 = c(128, 5, 2, "conv2")(out_conv1, train)
        out_conv3 = c(256, 5, 2, "conv3")(out_conv2, train)
        out_conv3 = c(256, 3, 1, "conv3_1")(out_conv3, train)
        out_conv4 = c(512, 3, 2, "conv4")(out_conv3, train)
        out_conv4 = c(512, 3, 1, "conv4_1")(out_conv4, train)
        out_conv5 = c(512, 3, 2, "conv5")(out_conv4, train)
        out_conv5 = c(512, 3, 1, "conv5_1")(out_conv5, train)
        out_conv6 = c(1024, 3, 2, "conv6")(out_conv5, train)
        out_conv6 = c(1024, 3, 1, "conv6_1")(out_conv6, train)

        flows = _RefinementTrunk(dt, name="trunk")(
            out_conv2, out_conv3, out_conv4, out_conv5, out_conv6)
        flows = tuple(f.astype(jnp.float32) for f in flows)
        return flows if train else flows[0]


class FlowNetC(nn.Module):
    """FlowNetCorr. Input (N, H, W, 6); correlation at 1/8 resolution."""

    use_bn: bool = False
    max_displacement: int = 20
    corr_stride2: int = 2
    use_pallas_corr: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt, bn = self.dtype, self.use_bn
        x = x.astype(dt)
        x1, x2 = x[..., :3], x[..., 3:]
        c = lambda f, k, s, name: ConvLeaky(f, k, s, bn, dt, name=name)

        conv1 = c(64, 7, 2, "conv1")
        conv2 = c(128, 5, 2, "conv2")
        conv3 = c(256, 5, 2, "conv3")
        out_conv1a = conv1(x1, train)
        out_conv2a = conv2(out_conv1a, train)
        out_conv3a = conv3(out_conv2a, train)
        out_conv1b = conv1(x2, train)
        out_conv2b = conv2(out_conv1b, train)
        out_conv3b = conv3(out_conv2b, train)

        out_corr = correlation(out_conv3a, out_conv3b,
                               self.max_displacement, self.corr_stride2,
                               use_pallas=self.use_pallas_corr)
        out_corr = nn.leaky_relu(out_corr.astype(dt), LEAK)
        out_redir = c(32, 1, 1, "conv_redir")(out_conv3a, train)
        x3 = jnp.concatenate([out_redir, out_corr], axis=-1)

        out_conv3 = c(256, 3, 1, "conv3_1")(x3, train)
        out_conv4 = c(512, 3, 2, "conv4")(out_conv3, train)
        out_conv4 = c(512, 3, 1, "conv4_1")(out_conv4, train)
        out_conv5 = c(512, 3, 2, "conv5")(out_conv4, train)
        out_conv5 = c(512, 3, 1, "conv5_1")(out_conv5, train)
        out_conv6 = c(1024, 3, 2, "conv6")(out_conv5, train)
        out_conv6 = c(1024, 3, 1, "conv6_1")(out_conv6, train)

        flows = _RefinementTrunk(dt, name="trunk")(
            out_conv2a, out_conv3, out_conv4, out_conv5, out_conv6)
        flows = tuple(f.astype(jnp.float32) for f in flows)
        return flows if train else flows[0]


class FlowNetSD(nn.Module):
    """FlowNet2-SD (small displacement): all-3x3 encoder + i_conv heads."""

    use_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt, bn = self.dtype, self.use_bn
        x = x.astype(dt)
        c = lambda f, k, s, name: ConvLeaky(f, k, s, bn, dt, name=name)
        out_conv0 = c(64, 3, 1, "conv0")(x, train)
        out_conv1 = c(64, 3, 2, "conv1")(out_conv0, train)
        out_conv1 = c(128, 3, 1, "conv1_1")(out_conv1, train)
        out_conv2 = c(128, 3, 2, "conv2")(out_conv1, train)
        out_conv2 = c(128, 3, 1, "conv2_1")(out_conv2, train)
        out_conv3 = c(256, 3, 2, "conv3")(out_conv2, train)
        out_conv3 = c(256, 3, 1, "conv3_1")(out_conv3, train)
        out_conv4 = c(512, 3, 2, "conv4")(out_conv3, train)
        out_conv4 = c(512, 3, 1, "conv4_1")(out_conv4, train)
        out_conv5 = c(512, 3, 2, "conv5")(out_conv4, train)
        out_conv5 = c(512, 3, 1, "conv5_1")(out_conv5, train)
        out_conv6 = c(1024, 3, 2, "conv6")(out_conv5, train)
        out_conv6 = c(1024, 3, 1, "conv6_1")(out_conv6, train)

        flow6 = _predict_flow("predict_flow6", dt)(out_conv6)
        flow6_up = _upflow("upsampled_flow6_to_5", dt)(flow6)
        out_deconv5 = Deconv(512, dt, name="deconv5")(out_conv6)

        concat5 = jnp.concatenate([out_conv5, out_deconv5, flow6_up], axis=-1)
        inter5 = IConv(512, 3, bn, dt, name="inter_conv5")(concat5, train)
        flow5 = _predict_flow("predict_flow5", dt)(inter5)
        flow5_up = _upflow("upsampled_flow5_to_4", dt)(flow5)
        out_deconv4 = Deconv(256, dt, name="deconv4")(concat5)

        concat4 = jnp.concatenate([out_conv4, out_deconv4, flow5_up], axis=-1)
        inter4 = IConv(256, 3, bn, dt, name="inter_conv4")(concat4, train)
        flow4 = _predict_flow("predict_flow4", dt)(inter4)
        flow4_up = _upflow("upsampled_flow4_to_3", dt)(flow4)
        out_deconv3 = Deconv(128, dt, name="deconv3")(concat4)

        concat3 = jnp.concatenate([out_conv3, out_deconv3, flow4_up], axis=-1)
        inter3 = IConv(128, 3, bn, dt, name="inter_conv3")(concat3, train)
        flow3 = _predict_flow("predict_flow3", dt)(inter3)
        flow3_up = _upflow("upsampled_flow3_to_2", dt)(flow3)
        out_deconv2 = Deconv(64, dt, name="deconv2")(concat3)

        concat2 = jnp.concatenate([out_conv2, out_deconv2, flow3_up], axis=-1)
        inter2 = IConv(64, 3, bn, dt, name="inter_conv2")(concat2, train)
        flow2 = _predict_flow("predict_flow2", dt)(inter2)

        flows = tuple(f.astype(jnp.float32)
                      for f in (flow2, flow3, flow4, flow5, flow6))
        return flows if train else flows[0]


class FlowNetFusion(nn.Module):
    """FlowNet2 fusion net: merges CSS + SD flows at full resolution.

    Input (N, H, W, 11): img1(3) + 2 flows(2+2) + 2 flow norms(1+1) +
    2 brightness errors(1+1). Output (N, H, W, 2).
    """

    use_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt, bn = self.dtype, self.use_bn
        x = x.astype(dt)
        c = lambda f, k, s, name: ConvLeaky(f, k, s, bn, dt, name=name)
        out_conv0 = c(64, 3, 1, "conv0")(x, train)
        out_conv1 = c(64, 3, 2, "conv1")(out_conv0, train)
        out_conv1 = c(128, 3, 1, "conv1_1")(out_conv1, train)
        out_conv2 = c(128, 3, 2, "conv2")(out_conv1, train)
        out_conv2 = c(128, 3, 1, "conv2_1")(out_conv2, train)

        flow2 = _predict_flow("predict_flow2", dt)(out_conv2)
        flow2_up = _upflow("upsampled_flow2_to_1", dt)(flow2)
        out_deconv1 = Deconv(32, dt, name="deconv1")(out_conv2)

        concat1 = jnp.concatenate([out_conv1, out_deconv1, flow2_up], axis=-1)
        inter1 = IConv(32, 3, bn, dt, name="inter_conv1")(concat1, train)
        flow1 = _predict_flow("predict_flow1", dt)(inter1)
        flow1_up = _upflow("upsampled_flow1_to_0", dt)(flow1)
        out_deconv0 = Deconv(16, dt, name="deconv0")(concat1)

        concat0 = jnp.concatenate([out_conv0, out_deconv0, flow1_up], axis=-1)
        inter0 = IConv(16, 3, bn, dt, name="inter_conv0")(concat0, train)
        flow0 = _predict_flow("predict_flow0", dt)(inter0)
        return flow0.astype(jnp.float32)


def _upsample4(flow):
    """Bilinear x4 upsample (align_corners=False, torch Upsample twin)."""
    n, h, w, c = flow.shape
    return jax.image.resize(flow, (n, h * 4, w * 4, c), method="bilinear")


class FlowNet2(nn.Module):
    """Full FlowNet2 cascade: C -> S -> S (CSS) || SD -> Fusion.

    Input: (N, H, W, 6) already mean-subtracted / rgb_max-normalized pairs
    (use ``preprocess_pair``). Output: full-resolution flow (N, H, W, 2).
    The inter-stage wiring (warp second image by upsampled flow, brightness
    error via channelnorm, concat with flow/div_flow) follows the FlowNet2
    paper's stacking recipe; each sub-net is independently convertible from
    torch checkpoints.
    """

    use_bn: bool = False
    div_flow: float = 20.0
    use_pallas_corr: bool = False
    use_pallas_warp: bool = False
    warp_matmul: bool = False  # matmul warp kernel variant (ops/warp.py)
    dtype: Any = jnp.float32
    # dtype of the FULL-RESOLUTION inter-stage tensors (upsampled flows,
    # warped frames, brightness errors, fusion inputs). fp32 matches the
    # reference glue exactly (golden-parity default); bfloat16 halves the
    # cascade's largest HBM-resident intermediates for memory-capped
    # serving — EPE drift bounded by test (tests/test_flownet2_stack.py).
    glue_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        img1, img2 = x[..., :3], x[..., 3:]
        gdt = self.glue_dtype

        flownetc = FlowNetC(use_bn=self.use_bn, dtype=self.dtype,
                            use_pallas_corr=self.use_pallas_corr,
                            name="flownetc")
        flow_c2 = flownetc(x, train=False)
        flow_c = _upsample4(flow_c2 * self.div_flow).astype(gdt)

        def stage_input(flow_full):
            warped = resample2d(img2.astype(gdt), flow_full,
                                use_pallas=self.use_pallas_warp,
                                matmul=self.warp_matmul)
            err = channelnorm(img1.astype(gdt) - warped).astype(gdt)
            return jnp.concatenate(
                [x, warped.astype(x.dtype),
                 (flow_full / self.div_flow).astype(x.dtype),
                 err.astype(x.dtype)], axis=-1)

        flownets1 = FlowNetS(use_bn=self.use_bn, dtype=self.dtype,
                             name="flownets_1")
        # stage inputs are 12-channel: img1+img2 (6) + warped (3) + flow (2)
        # + brightness error (1)
        flow_s1_2 = flownets1(stage_input(flow_c), train=False)
        flow_s1 = _upsample4(flow_s1_2 * self.div_flow).astype(gdt)

        flownets2 = FlowNetS(use_bn=self.use_bn, dtype=self.dtype,
                             name="flownets_2")
        flow_s2_2 = flownets2(stage_input(flow_s1), train=False)
        flow_s2 = _upsample4(flow_s2_2 * self.div_flow).astype(gdt)

        flownetsd = FlowNetSD(use_bn=self.use_bn, dtype=self.dtype,
                              name="flownets_d")
        flow_sd2 = flownetsd(x, train=False)
        flow_sd = _upsample4(flow_sd2 / self.div_flow).astype(gdt)

        norm_sd = channelnorm(flow_sd).astype(gdt)
        norm_s2 = channelnorm(flow_s2).astype(gdt)
        img1f = img1.astype(gdt)
        img2f = img2.astype(gdt)
        err_sd = channelnorm(img1f - resample2d(
            img2f, flow_sd, use_pallas=self.use_pallas_warp,
            matmul=self.warp_matmul)).astype(gdt)
        err_s2 = channelnorm(img1f - resample2d(
            img2f, flow_s2, use_pallas=self.use_pallas_warp,
            matmul=self.warp_matmul)).astype(gdt)

        fuse_in = jnp.concatenate(
            [img1f, flow_sd, flow_s2, norm_sd, norm_s2, err_sd, err_s2],
            axis=-1)
        fusion = FlowNetFusion(use_bn=self.use_bn, dtype=self.dtype,
                               name="flownetfusion")
        return fusion(fuse_in, train=False)


class FlowNet2CSS(nn.Module):
    """Truncated FlowNet2 cascades: C -> S (CS, ``stages=1``) and
    C -> S -> S (CSS, ``stages=2``) — the lineage ships FlowNet2-CS /
    FlowNet2-CSS checkpoints alongside the full stack. Same inter-stage
    wiring and param names as :class:`FlowNet2`, so ``convert_flownet2``
    loads their state_dicts unchanged. Output: FULL-resolution flow of the
    last S stage (the lineage's convention for these variants)."""

    stages: int = 2
    use_bn: bool = False
    div_flow: float = 20.0
    use_pallas_corr: bool = False
    use_pallas_warp: bool = False
    warp_matmul: bool = False  # matmul warp kernel variant (ops/warp.py)
    dtype: Any = jnp.float32
    glue_dtype: Any = jnp.float32  # see FlowNet2.glue_dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        img1, img2 = x[..., :3], x[..., 3:]
        gdt = self.glue_dtype
        flownetc = FlowNetC(use_bn=self.use_bn, dtype=self.dtype,
                            use_pallas_corr=self.use_pallas_corr,
                            name="flownetc")
        flow = _upsample4(flownetc(x, train=False)
                          * self.div_flow).astype(gdt)

        def stage_input(flow_full):
            warped = resample2d(img2.astype(gdt), flow_full,
                                use_pallas=self.use_pallas_warp,
                                matmul=self.warp_matmul)
            err = channelnorm(img1.astype(gdt) - warped).astype(gdt)
            return jnp.concatenate(
                [x, warped.astype(x.dtype),
                 (flow_full / self.div_flow).astype(x.dtype),
                 err.astype(x.dtype)], axis=-1)

        for i in range(self.stages):
            s = FlowNetS(use_bn=self.use_bn, dtype=self.dtype,
                         name=f"flownets_{i + 1}")
            flow = _upsample4(s(stage_input(flow), train=False)
                              * self.div_flow).astype(gdt)
        return flow.astype(jnp.float32)


def preprocess_pair(im1, im2, rgb_max: float = 255.0):
    """Two (N, H, W, 3) uint8/float frames -> (N, H, W, 6) normalized input.

    The lineage subtracts the per-image per-channel mean over BOTH frames and
    divides by rgb_max.
    """
    pair = jnp.stack([jnp.asarray(im1, jnp.float32),
                      jnp.asarray(im2, jnp.float32)], axis=1)  # (N,2,H,W,3)
    mean = jnp.mean(pair, axis=(1, 2, 3), keepdims=True)
    pair = (pair - mean) / rgb_max
    return jnp.concatenate([pair[:, 0], pair[:, 1]], axis=-1)


def flow_at_full_res(model_out_quarter, div_flow: float = 20.0):
    """Inference postprocess: x4 bilinear upsample + div_flow rescale."""
    return _upsample4(model_out_quarter * div_flow)


def flow_output_is_full_res(variant: str) -> bool:
    """FlowNetS/C/SD emit quarter-res flow scaled by 1/div_flow; the
    FlowNet2 cascade's fusion net emits FINAL full-resolution flow. Callers
    (pipeline.FlowPredictor, tracking ClipTracker) must not re-upsample or
    re-scale the latter."""
    return variant in ("flownet2", "flownet2_cs", "flownet2_css")


def postprocess_flow(flow_out, variant: str, out_hw, div_flow: float = 20.0):
    """Model output -> full-resolution flow at ``out_hw``, with flow
    components rescaled when the spatial size changes. Handles both output
    conventions (see flow_output_is_full_res)."""
    n, fh, fw, _ = flow_out.shape
    if not flow_output_is_full_res(variant):
        flow_out = flow_out * div_flow
        fh, fw = fh * 4, fw * 4
    oh, ow = out_hw
    flow = jax.image.resize(flow_out, (n, oh, ow, 2), "bilinear")
    scale = jnp.asarray([ow / fw, oh / fh], jnp.float32)
    return flow * scale


def get_flow_net(cfg: FlowConfig):
    dtype = jnp.dtype(cfg.dtype)
    common = dict(use_bn=cfg.batch_norm, dtype=dtype)
    if cfg.variant == "flownet_s":
        return FlowNetS(**common)
    if cfg.variant == "flownet_c":
        return FlowNetC(max_displacement=cfg.corr_max_displacement,
                        corr_stride2=cfg.corr_stride2,
                        use_pallas_corr=cfg.use_pallas_corr, **common)
    if cfg.variant == "flownet_sd":
        return FlowNetSD(**common)
    if cfg.variant == "flownet2":
        return FlowNet2(div_flow=cfg.div_flow,
                        use_pallas_corr=cfg.use_pallas_corr,
                        use_pallas_warp=cfg.use_pallas_warp,
                        warp_matmul=cfg.pallas_warp_impl == "matmul",
                        glue_dtype=jnp.dtype(cfg.glue_dtype), **common)
    if cfg.variant in ("flownet2_cs", "flownet2_css"):
        return FlowNet2CSS(stages=1 if cfg.variant == "flownet2_cs" else 2,
                           div_flow=cfg.div_flow,
                           use_pallas_corr=cfg.use_pallas_corr,
                           use_pallas_warp=cfg.use_pallas_warp,
                        warp_matmul=cfg.pallas_warp_impl == "matmul",
                           glue_dtype=jnp.dtype(cfg.glue_dtype), **common)
    raise KeyError(f"unknown flow variant {cfg.variant!r}")
