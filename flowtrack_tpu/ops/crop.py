"""Fused person-crop + resize + normalize — the TPU-native preprocessing op.

Replaces the reference's per-person cv2.warpAffine + normalize (SURVEY.md
section 3 "Affine crop/normalize": the [B] contract asks for a fused kernel,
batched over persons).

TPU-first design: at inference the crop transform has rotation 0 (rotation
exists only in training augmentation), so the map is AXIS-ALIGNED SEPARABLE
and bilinear crop-resize factorizes into two interpolation matmuls:

    crop_c = Wy @ image_c @ Wx^T,   Wy: (out_h, H), Wx: (out_w, W)

with each W row holding the two bilinear taps (rows mapping outside the
image are all-zero == cv2's constant-0 border). This turns a gather-bound
op into MXU work — the hardware has no fast arbitrary gather, but eats
matmuls; XLA fuses the /255-mean-std normalize into the epilogue.

Two implementations, bit-identical (tested):
  * ``crop_resize_normalize``       — pure XLA einsum (differentiable).
  * ``crop_resize_normalize_pallas`` — one Pallas kernel per batch: image
    parked in VMEM once, per-person weight rows built in-register from
    iota, two MXU dots + fused normalize, no HBM round-trip for the
    intermediate. Grid over persons.

Both read the SAME geometry as ops/affine.get_affine_transform (validated
against the cv2-twin warp in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flowtrack_tpu.config import PIXEL_STD


def crop_params(centers, scales, out_hw):
    """Per-person separable map parameters.

    The reference transform (rot=0) maps crop pixel i (x or y) to source
    coordinate src = s * i + t with s = src_w / dst_w (same for both axes —
    the 3-point construction is a similarity transform, see
    ops/affine.get_affine_transform_jax) and t chosen so the crop center
    lands on the person center.

    centers: (P, 2) xy; scales: (P, 2) -> (sx (P,), tx (P,), sy==(sx), ty).
    """
    out_h, out_w = out_hw
    centers = jnp.asarray(centers, jnp.float32)
    scales = jnp.asarray(scales, jnp.float32)
    src_w = scales[:, 0] * PIXEL_STD
    s = src_w / out_w                       # isotropic (similarity)
    tx = centers[:, 0] - s * (out_w * 0.5)
    ty = centers[:, 1] - s * (out_h * 0.5)
    return s, tx, s, ty


def _bilinear_matrix(s, t, out_size: int, src_size: int):
    """(out_size, src_size) bilinear interpolation matrix for
    src = s * i + t (per-person scalars s, t). Out-of-range taps get weight
    0 (constant-0 border)."""
    # int32 iota + cast: Mosaic's tpu.iota only produces integer vectors
    i = jax.lax.broadcasted_iota(jnp.int32, (out_size, src_size), 0) \
        .astype(jnp.float32)
    j = jax.lax.broadcasted_iota(jnp.int32, (out_size, src_size), 1) \
        .astype(jnp.float32)
    src = s * i + t                          # (out, src) broadcast over j
    d = 1.0 - jnp.abs(src - j)
    w = jnp.maximum(d, 0.0)
    # taps whose source coordinate is outside [-1, src_size] contribute 0
    # automatically (|src - j| >= 1 for all j); nothing else needed.
    return w


def crop_resize_normalize(image, centers, scales, out_hw, mean=None,
                          std=None, rgb_max: float = 255.0,
                          out_dtype=jnp.float32):
    """image: (H, W, C); centers/scales: (P, 2) -> (P, out_h, out_w, C).

    Pure-XLA path (differentiable, CPU-friendly)."""
    out_h, out_w = out_hw
    h, w = image.shape[0], image.shape[1]
    sx, tx, sy, ty = crop_params(centers, scales, out_hw)

    wy = jax.vmap(lambda s, t: _bilinear_matrix(s, t, out_h, h))(sy, ty)
    wx = jax.vmap(lambda s, t: _bilinear_matrix(s, t, out_w, w))(sx, tx)
    img = image.astype(jnp.float32)
    # fp32 crops need full-precision interpolation matmuls on TPU (the
    # cv2-exact golden parity / CLAUDE.md invariant — default einsum
    # precision is bf16 single-pass); bf16 crops keep the fast default,
    # same policy as models/layers._precision_for.
    precision = (jax.lax.Precision.HIGHEST
                 if jnp.dtype(out_dtype) == jnp.float32 else None)
    # (P, out_h, W, C) then (P, out_h, out_w, C)
    tmp = jnp.einsum("phH,HWc->phWc", wy, img, precision=precision)
    out = jnp.einsum("phWc,pwW->phwc", tmp, wx, precision=precision)
    if mean is not None:
        mean = jnp.asarray(mean, jnp.float32)
        std = jnp.asarray(std, jnp.float32)
        out = (out / rgb_max - mean) / std
    return out.astype(out_dtype)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _crop_kernel(params_ref, img_ref, out_ref, *, out_h, out_w, h, w, c,
                 mean, std, inv_rgb_max, normalize, precision):
    """One person per grid step. params: the FULL (P, 4) [sx, tx, sy, ty]
    array in SMEM (per-person block shapes violate the (8, 128) divisibility
    rule on hardware); img: (H, W, C) VMEM (constant across grid);
    out: (1, C, out_h, out_w)."""
    i = pl.program_id(0)
    sx = params_ref[i, 0]
    tx = params_ref[i, 1]
    sy = params_ref[i, 2]
    ty = params_ref[i, 3]

    wy = _bilinear_matrix(sy, ty, out_h, h)          # (out_h, H)
    wx = _bilinear_matrix(sx, tx, out_w, w)          # (out_w, W)

    for ch in range(c):
        img_c = img_ref[:, :, ch].astype(jnp.float32)    # (H, W)
        tmp = jnp.dot(wy, img_c, preferred_element_type=jnp.float32,
                      precision=precision)
        crop = jnp.dot(tmp, wx.T, preferred_element_type=jnp.float32,
                       precision=precision)
        if normalize:
            crop = (crop * inv_rgb_max - mean[ch]) / std[ch]
        out_ref[0, ch] = crop


def crop_resize_normalize_pallas(image, centers, scales, out_hw, mean=None,
                                 std=None, rgb_max: float = 255.0,
                                 out_dtype=jnp.float32, interpret=False):
    """Pallas twin of crop_resize_normalize. image: (H, W, C) ->
    (P, out_h, out_w, C)."""
    out_h, out_w = out_hw
    h, w, c = image.shape
    p = centers.shape[0]
    sx, tx, sy, ty = crop_params(centers, scales, out_hw)
    params = jnp.stack([sx, tx, sy, ty], axis=1)      # (P, 4)

    normalize = mean is not None
    kernel = functools.partial(
        _crop_kernel, out_h=out_h, out_w=out_w, h=h, w=w, c=c,
        mean=tuple(float(v) for v in (mean if normalize else (0.0,) * c)),
        std=tuple(float(v) for v in (std if normalize else (1.0,) * c)),
        inv_rgb_max=1.0 / rgb_max, normalize=normalize,
        # same fp32-parity policy as the XLA twin (bit-identical contract)
        precision=(jax.lax.Precision.HIGHEST
                   if jnp.dtype(out_dtype) == jnp.float32 else None))

    out = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((h, w, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, out_h, out_w),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, c, out_h, out_w), jnp.float32),
        interpret=interpret,
    )(params, image)
    return jnp.transpose(out, (0, 2, 3, 1)).astype(out_dtype)
