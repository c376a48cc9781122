"""PoseResNet — Simple Baselines pose network, TPU-native (Flax/NHWC).

Behavior contract (SURVEY.md section 3 "PoseResNet" row; reference lineage:
models/pose_resnet.py — mount empty, architecture per arXiv:1804.06208):
ResNet-50/101/152 backbone (ImageNet stem, no avgpool/fc) + 3 deconv stages
[ConvTranspose 4x4 s2 p1, 256 ch, BN, ReLU] + 1x1 conv -> num_joints heatmap
channels at input/4 resolution.

TPU-first choices: NHWC layout, bfloat16 compute / fp32 params + fp32 BN
statistics, explicit torch-exact deconv (models/layers.py), whole forward is
one fused XLA program. Module/param names mirror the torch lineage so the
weight converter (utils/torch_convert.py) is a pure name map.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from flowtrack_tpu.config import ModelConfig
from flowtrack_tpu.models.layers import (
    ConvTransposeTorch,
    batch_norm,
    conv,
    max_pool_same_as_torch,
)

RESNET_SPECS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = conv(self.features, 3, self.strides, 1, dtype=self.dtype, name="conv1")(x)
        y = batch_norm(train, self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.features, 3, 1, 1, dtype=self.dtype, name="conv2")(y)
        y = batch_norm(train, self.dtype, name="bn2")(y)
        if self.downsample:
            residual = conv(self.features, 1, self.strides, 0, dtype=self.dtype,
                            name="downsample_conv")(x)
            residual = batch_norm(train, self.dtype, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int          # bottleneck width; block output = features * 4
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = conv(self.features, 1, 1, 0, dtype=self.dtype, name="conv1")(x)
        y = batch_norm(train, self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.features, 3, self.strides, 1, dtype=self.dtype, name="conv2")(y)
        y = batch_norm(train, self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.features * self.expansion, 1, 1, 0, dtype=self.dtype,
                 name="conv3")(y)
        y = batch_norm(train, self.dtype, name="bn3")(y)
        if self.downsample:
            residual = conv(self.features * self.expansion, 1, self.strides, 0,
                            dtype=self.dtype, name="downsample_conv")(x)
            residual = batch_norm(train, self.dtype, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    block: str                      # "basic" | "bottleneck"
    stage_sizes: Sequence[int]
    dtype: Any = jnp.float32
    remat: bool = False             # rematerialize each residual block:
                                    # trade recompute FLOPs for HBM during
                                    # training (jax.checkpoint)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv(64, 7, 2, 3, dtype=self.dtype, name="conv1")(x)
        x = batch_norm(train, self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_same_as_torch(x, 3, 2, 1)

        block_cls = Bottleneck if self.block == "bottleneck" else BasicBlock
        if self.remat:
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        expansion = 4 if self.block == "bottleneck" else 1
        in_features = 64
        for stage, num_blocks in enumerate(self.stage_sizes):
            features = 64 * (2 ** stage)
            strides = 1 if stage == 0 else 2
            for b in range(num_blocks):
                down = b == 0 and (strides != 1 or in_features != features * expansion)
                x = block_cls(features=features,
                              strides=strides if b == 0 else 1,
                              downsample=down,
                              dtype=self.dtype,
                              name=f"layer{stage + 1}_{b}")(x, train)
            in_features = features * expansion
        return x


class PoseResNet(nn.Module):
    """backbone -> 3x deconv (256ch, BN, ReLU) -> 1x1 conv -> heatmaps NHWK."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        dtype = jnp.dtype(self.cfg.dtype)
        block, stages = RESNET_SPECS[self.cfg.num_layers]
        x = x.astype(dtype)
        x = ResNetBackbone(block=block, stage_sizes=stages, dtype=dtype,
                           remat=self.cfg.remat, name="backbone")(x, train)
        for i in range(self.cfg.num_deconv_layers):
            k = self.cfg.num_deconv_kernels[i]
            x = ConvTransposeTorch(
                features=self.cfg.num_deconv_filters[i],
                kernel_size=k, strides=2, padding=(k - 2) // 2,
                use_bias=self.cfg.deconv_with_bias, dtype=dtype,
                name=f"deconv{i}")(x)
            x = batch_norm(train, dtype, name=f"deconv_bn{i}")(x)
            x = nn.relu(x)
        k = self.cfg.final_conv_kernel
        x = conv(self.cfg.num_joints, k, 1, (k - 1) // 2, use_bias=True,
                 dtype=dtype, name="final",
                 kernel_init=nn.initializers.normal(stddev=0.001))(x)
        # heatmaps in fp32 for stable decode/loss
        return x.astype(jnp.float32)


def get_pose_net(cfg: ModelConfig) -> PoseResNet:
    return PoseResNet(cfg=cfg)
