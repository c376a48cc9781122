"""Shared layer primitives with torch-exact semantics.

The one real parity trap (SURVEY.md section 8 "hard parts" (a)) is transposed
convolution: torch ``ConvTranspose2d`` and flax ``ConvTranspose`` differ in
weight layout AND spatial flip. We implement deconv explicitly as an
input-dilated convolution via ``lax.conv_general_dilated`` so the semantics
are pinned:

    out = conv(dilate(x, stride), kernel, padding = k - 1 - p)

with kernel stored HWIO *already spatially flipped* relative to torch's
(Cin, Cout, kH, kW). The torch->JAX converter does
``w.transpose(2, 3, 0, 1)[::-1, ::-1]``; a 1-layer golden test pins this.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _precision_for(dtype):
    """fp32 path: HIGHEST (bit-stable golden parity vs torch). bf16 path:
    default single-pass MXU — HIGHEST on bf16 inputs forces a multi-pass
    fp32 emulation that throttles the systolic array for no parity benefit
    (the reference runs fp16/fp32 cuDNN autotuned kernels)."""
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(dtype) == jnp.float32 else None)


class ConvTransposeTorch(nn.Module):
    """torch.nn.ConvTranspose2d twin (NHWC). kernel: (kH, kW, Cin, Cout),
    spatially flipped vs torch."""

    features: int
    kernel_size: int = 4
    strides: int = 2
    padding: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    kernel_init: Any = nn.initializers.normal(stddev=0.001)

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.strides, self.padding
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (k, k, cin, self.features), self.param_dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=[(k - 1 - p, k - 1 - p)] * 2,
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=_precision_for(self.dtype),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y


def conv(features, kernel_size, strides=1, padding=0, use_bias=False,
         dtype=jnp.float32, name=None, kernel_init=None):
    """torch.nn.Conv2d twin (explicit symmetric padding, NHWC)."""
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size, kernel_size),
        strides=(strides, strides),
        padding=[(padding, padding), (padding, padding)],
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        precision=_precision_for(dtype),
        kernel_init=kernel_init or nn.initializers.he_normal(),
        name=name,
    )


class BatchNormTorch(nn.Module):
    """torch.nn.BatchNorm2d twin, exact to torch's TRAIN semantics where
    flax's nn.BatchNorm deviates (measured, tests/test_train_grad_parity):

      * batch variance for normalization: two-pass E[(x-mean)^2] in fp32
        (flax's default one-pass E[x^2]-E[x]^2 loses ~1e-3 through 50
        layers and blows up gradient parity where few samples reduce);
      * running_var update uses the UNBIASED (Bessel m/(m-1)) variance —
        torch normalizes with the biased one but STORES the unbiased one;
        flax stores biased.

    Inference (use_running_average=True) is algebraically identical to
    nn.BatchNorm; variable names (batch_stats/{mean,var}, params/
    {scale,bias}) match it so converters and checkpoints are unchanged.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (feat,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (feat,))
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)

        stat_dtype = jnp.promote_types(jnp.float32, x.dtype)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            m = 1
            for a in axes:
                m *= x.shape[a]
            xf = x.astype(stat_dtype)
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf - mean), axes)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                bessel = m / max(m - 1, 1)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var * bessel)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(stat_dtype) - mean) * inv + bias
        return y.astype(self.dtype)


def batch_norm(train, dtype=jnp.float32, name=None, momentum=0.9, eps=1e-5):
    """torch.nn.BatchNorm2d twin (torch momentum 0.1 == flax momentum 0.9)."""
    return BatchNormTorch(
        use_running_average=not train,
        momentum=momentum,
        epsilon=eps,
        dtype=dtype,
        name=name,
    )


def max_pool_same_as_torch(x, window=3, strides=2, padding=1):
    """torch MaxPool2d(k=3, s=2, p=1): pad with -inf then pool."""
    return nn.max_pool(
        x, (window, window), strides=(strides, strides),
        padding=[(padding, padding), (padding, padding)],
    )
