"""Affine person-crop geometry + batched on-device bilinear warp.

Behavior contract (SURVEY.md section 3 "Affine crop/normalize" row; reference
lineage: utils/transforms.py — exact file unverifiable, mount empty):

  * A person box is represented as (center, scale) where ``scale`` is the
    source patch size in units of 200 px (PIXEL_STD).
  * ``get_affine_transform(center, scale, rot, output_size)`` builds the 2x3
    matrix mapping source-image coords -> output-crop coords via three
    correspondence points (center, a point rotated above the center, and a
    90-degree third point), exactly like cv2.getAffineTransform on the
    reference's (src, dst) triples.
  * Images are warped with bilinear sampling, constant-0 border
    (cv2.warpAffine semantics: dst(x) = src(M^-1 x), integer coords are
    pixel centers).

TPU-native design: the matrix math has both a numpy path (host, data
pipeline) and a vmappable jnp path (device, tracker hot loop); the warp is a
batched XLA gather (``warp_affine``) that jits and fuses with the normalize.
The fused crop kernels (XLA einsum + Pallas) live in ops/crop.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from flowtrack_tpu.config import PIXEL_STD


# ---------------------------------------------------------------------------
# Host (numpy) transform construction — mirrors the reference's cv2-based math.
# ---------------------------------------------------------------------------

def _get_dir(src_point, rot_rad):
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    return np.array(
        [src_point[0] * cs - src_point[1] * sn,
         src_point[0] * sn + src_point[1] * cs], dtype=np.float64)


def _get_3rd_point(a, b):
    direct = a - b
    return b + np.array([-direct[1], direct[0]], dtype=np.float64)


def _solve_affine(src, dst):
    """Solve the 2x3 affine mapping the 3 src points onto the 3 dst points.

    Equivalent to cv2.getAffineTransform(src, dst) (validated in tests).
    """
    a = np.zeros((6, 6), dtype=np.float64)
    b = np.zeros((6,), dtype=np.float64)
    for i in range(3):
        a[i, 0:2] = src[i]
        a[i, 2] = 1.0
        a[3 + i, 3:5] = src[i]
        a[3 + i, 5] = 1.0
        b[i] = dst[i, 0]
        b[3 + i] = dst[i, 1]
    x = np.linalg.solve(a, b)
    return x.reshape(2, 3)


def get_affine_transform(center, scale, rot, output_size, shift=(0.0, 0.0), inv=False):
    """Build the reference's crop transform.

    Args:
      center: (2,) box center in source-image pixels (x, y).
      scale: (2,) box size / 200 px (w, h) — reference convention.
      rot: rotation in degrees.
      output_size: (w, h) of the crop.
      shift: fractional shift of the center, in units of the source patch.
      inv: if True, return the crop->image transform instead.

    Returns: (2, 3) float64 matrix.
    """
    center = np.asarray(center, dtype=np.float64)
    scale = np.asarray(scale, dtype=np.float64)
    if scale.ndim == 0:
        scale = np.array([scale, scale], dtype=np.float64)
    shift = np.asarray(shift, dtype=np.float64)

    scale_tmp = scale * PIXEL_STD
    src_w = scale_tmp[0]
    dst_w, dst_h = float(output_size[0]), float(output_size[1])

    rot_rad = np.pi * rot / 180.0
    src_dir = _get_dir([0.0, src_w * -0.5], rot_rad)
    dst_dir = np.array([0.0, dst_w * -0.5], dtype=np.float64)

    src = np.zeros((3, 2), dtype=np.float64)
    dst = np.zeros((3, 2), dtype=np.float64)
    src[0, :] = center + scale_tmp * shift
    src[1, :] = center + src_dir + scale_tmp * shift
    dst[0, :] = [dst_w * 0.5, dst_h * 0.5]
    dst[1, :] = np.array([dst_w * 0.5, dst_h * 0.5]) + dst_dir
    src[2, :] = _get_3rd_point(src[0, :], src[1, :])
    dst[2, :] = _get_3rd_point(dst[0, :], dst[1, :])

    if inv:
        return _solve_affine(dst, src)
    return _solve_affine(src, dst)


def affine_transform(pt, t):
    """Apply a 2x3 transform to a point (or (..., 2) array of points)."""
    pt = np.asarray(pt, dtype=np.float64)
    new = pt @ t[:, :2].T + t[:, 2]
    return new


def box_to_center_scale(box, aspect_ratio, scale_padding=1.25):
    """COCO detection box (x, y, w, h) -> (center, scale) (reference convention).

    Keeps aspect ratio by growing the short side; scale = size/200 * 1.25.
    """
    x, y, w, h = [float(v) for v in box]
    center = np.array([x + w * 0.5, y + h * 0.5], dtype=np.float64)
    if w > aspect_ratio * h:
        h = w / aspect_ratio
    elif w < aspect_ratio * h:
        w = h * aspect_ratio
    scale = np.array([w / PIXEL_STD, h / PIXEL_STD], dtype=np.float64) * scale_padding
    return center, scale


def fliplr_joints(joints, joints_vis, width, flip_pairs):
    """Horizontally flip joint coordinates + swap left/right joints
    (training aug). Invisible joints are zeroed (``joints * joints_vis``
    in the reference) for BOTH vis layouts — (K,) and (K, dims)."""
    joints = np.array(joints, dtype=np.float64)
    joints_vis = np.array(joints_vis)
    joints[:, 0] = width - joints[:, 0] - 1
    for a, b in flip_pairs:
        joints[[a, b]] = joints[[b, a]]
        joints_vis[[a, b]] = joints_vis[[b, a]]
    vis_col = joints_vis[:, :1] if joints_vis.ndim == 2 \
        else joints_vis[:, None]
    return joints * (vis_col > 0), joints_vis


# ---------------------------------------------------------------------------
# Device (jnp) transform construction — vmappable, used in the jit'd pipeline.
# ---------------------------------------------------------------------------

def get_affine_transform_jax(center, scale, rot_deg, output_size, inv=False):
    """jnp twin of get_affine_transform (no shift). Batched via vmap.

    center: (..., 2); scale: (..., 2); rot_deg: (...,) or scalar.
    output_size: static (w, h). Returns (..., 2, 3) float32.

    Instead of solving a 3-point linear system we compose the transform in
    closed form (rotate about center, scale patch to output, translate) —
    algebraically identical to the reference's 3-point construction.
    """
    center = jnp.asarray(center, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    rot = jnp.deg2rad(jnp.asarray(rot_deg, jnp.float32))
    dst_w, dst_h = float(output_size[0]), float(output_size[1])

    src_w = scale[..., 0] * PIXEL_STD
    cs, sn = jnp.cos(rot), jnp.sin(rot)

    # The reference's 3 correspondence points (center, a rotated point src_w/2
    # "above" the center, and the 90-degree third point) define a SIMILARITY
    # transform: both axes scale by dst_w/src_w (src_h never enters; the data
    # pipeline guarantees the box aspect matches the crop aspect, so
    # dst_h/src_h == dst_w/src_w in practice). Solving the 3-point pairs in
    # closed form gives L = (dst_w/src_w) * R(rot)^T  (validated against the
    # numpy/cv2 path in tests, including rotation).
    if not inv:
        s = dst_w / src_w
        a00 = s * cs
        a01 = s * sn
        a10 = -s * sn
        a11 = s * cs
        tx = dst_w * 0.5 - (a00 * center[..., 0] + a01 * center[..., 1])
        ty = dst_h * 0.5 - (a10 * center[..., 0] + a11 * center[..., 1])
    else:
        s = src_w / dst_w
        a00 = s * cs
        a01 = -s * sn
        a10 = s * sn
        a11 = s * cs
        tx = center[..., 0] - (a00 * dst_w * 0.5 + a01 * dst_h * 0.5)
        ty = center[..., 1] - (a10 * dst_w * 0.5 + a11 * dst_h * 0.5)

    row0 = jnp.stack([a00, a01, tx], axis=-1)
    row1 = jnp.stack([a10, a11, ty], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def affine_transform_jax(pts, t):
    """Apply (..., 2, 3) transforms to (..., K, 2) points (broadcasting).

    Elementwise (VPU) math, not a matmul: the 2x2 contraction is tiny and
    jnp default matmul precision is too low for exact geometry.
    """
    pts = jnp.asarray(pts, jnp.float32)
    x, y = pts[..., 0], pts[..., 1]
    t = t[..., None, :, :]  # broadcast over K
    xo = t[..., 0, 0] * x + t[..., 0, 1] * y + t[..., 0, 2]
    yo = t[..., 1, 0] * x + t[..., 1, 1] * y + t[..., 1, 2]
    return jnp.stack([xo, yo], axis=-1)


# ---------------------------------------------------------------------------
# On-device bilinear warp (cv2.warpAffine semantics, border constant 0).
# ---------------------------------------------------------------------------

def _bilinear_sample(img, src_x, src_y):
    """Sample img (H, W, C) at float coords; out-of-bounds taps read 0.

    Integer images are blended in float32 and rounded back (cv2
    semantics) — casting the fractional weights to an integer dtype
    would silently degrade to floor-neighbor sampling."""
    h, w = img.shape[0], img.shape[1]
    out_dtype = img.dtype
    compute = (img.dtype if jnp.issubdtype(img.dtype, jnp.floating)
               else jnp.float32)
    img = img.astype(compute)
    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = (src_x - x0)[..., None]
    wy = (src_y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        v = img[yc, xc]  # gather: (..., C)
        return v * valid[..., None].astype(compute)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    one = jnp.asarray(1.0, compute)
    wx = wx.astype(compute)
    wy = wy.astype(compute)
    top = v00 * (one - wx) + v01 * wx
    bot = v10 * (one - wx) + v11 * wx
    out = top * (one - wy) + bot * wy
    if out.dtype != out_dtype:
        out = jnp.rint(out).astype(out_dtype)
    return out


def warp_affine(img, trans, out_hw):
    """cv2.warpAffine twin: warp (H, W, C) image with the FORWARD 2x3
    transform ``trans`` (src->dst) to an (out_h, out_w, C) crop.

    The inverse mapping is computed from ``trans`` on device. Static output
    shape -> jit friendly.
    """
    out_h, out_w = out_hw
    a = jnp.asarray(trans, jnp.float32)
    lin = a[:, :2]
    det = lin[0, 0] * lin[1, 1] - lin[0, 1] * lin[1, 0]
    inv_lin = jnp.array([[lin[1, 1], -lin[0, 1]], [-lin[1, 0], lin[0, 0]]]) / det
    inv_t = -inv_lin @ a[:, 2]

    ys = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    src_x = inv_lin[0, 0] * xs + inv_lin[0, 1] * ys + inv_t[0]
    src_y = inv_lin[1, 0] * xs + inv_lin[1, 1] * ys + inv_t[1]
    return _bilinear_sample(img, src_x, src_y)


def crop_persons(image, inv_trans, out_hw):
    """Crop N person patches from one image, given (N, 2, 3) INVERSE
    (crop->image) transforms. Returns (N, out_h, out_w, C).

    Used in the tracker hot loop: transforms come from
    get_affine_transform_jax(..., inv=True) so no matrix inversion is needed.
    """
    out_h, out_w = out_hw

    def one(t):
        ys = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
        xs = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
        src_x = t[0, 0] * xs + t[0, 1] * ys + t[0, 2]
        src_y = t[1, 0] * xs + t[1, 1] * ys + t[1, 2]
        return _bilinear_sample(image, src_x, src_y)

    return jax.vmap(one)(jnp.asarray(inv_trans, jnp.float32))


def normalize_image(x, mean, std, rgb_max=255.0):
    """(x / 255 - mean) / std, channel-last."""
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return (x / jnp.asarray(rgb_max, x.dtype) - mean) / std
