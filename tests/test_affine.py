"""Golden tests for the affine crop geometry vs cv2 (the reference's engine)."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from flowtrack_tpu.ops.affine import (
    affine_transform,
    affine_transform_jax,
    box_to_center_scale,
    crop_persons,
    get_affine_transform,
    get_affine_transform_jax,
    normalize_image,
    warp_affine,
)


def _cv2_reference_trans(center, scale, rot, output_size):
    """Reconstruct the lineage's matrix via cv2.getAffineTransform directly."""
    scale_tmp = np.asarray(scale) * 200.0
    src_w = scale_tmp[0]
    dst_w, dst_h = output_size
    rot_rad = np.pi * rot / 180
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    src_dir = np.array([0 * cs - (-0.5 * src_w) * sn, 0 * sn + (-0.5 * src_w) * cs])
    dst_dir = np.array([0, dst_w * -0.5])

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]])

    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center
    src[1] = np.asarray(center) + src_dir
    src[2] = third(src[0], src[1])
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = np.array([dst_w * 0.5, dst_h * 0.5]) + dst_dir
    dst[2] = third(dst[0], dst[1])
    return cv2.getAffineTransform(src, dst)


@pytest.mark.parametrize("rot", [0.0, 15.0, -40.0])
@pytest.mark.smoke
def test_matrix_matches_cv2(rot):
    center = np.array([123.4, 77.2])
    scale = np.array([1.3, 1.9])
    out = (192, 256)  # (w, h)
    ours = get_affine_transform(center, scale, rot, out)
    ref = _cv2_reference_trans(center, scale, rot, out)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


@pytest.mark.parametrize("rot", [0.0, 30.0])
def test_inverse_roundtrip(rot):
    center, scale = np.array([50.0, 60.0]), np.array([1.1, 1.5])
    t = get_affine_transform(center, scale, rot, (48, 64))
    ti = get_affine_transform(center, scale, rot, (48, 64), inv=True)
    pts = np.random.default_rng(1).uniform(0, 100, (10, 2))
    back = affine_transform(affine_transform(pts, t), ti)
    np.testing.assert_allclose(back, pts, atol=1e-6)


@pytest.mark.parametrize("rot", [0.0, 25.0, -40.0])
@pytest.mark.parametrize("inv", [False, True])
def test_jax_matches_numpy(rot, inv):
    center = np.array([123.4, 77.2])
    scale = np.array([1.3, 1.3 * 256 / 192])
    t_np = get_affine_transform(center, scale, rot, (192, 256), inv=inv)
    t_j = get_affine_transform_jax(center, scale, rot, (192, 256), inv=inv)
    np.testing.assert_allclose(np.asarray(t_j), t_np, rtol=1e-5, atol=1e-4)


def test_jax_batched():
    centers = np.random.default_rng(2).uniform(50, 200, (5, 2))
    scales = np.random.default_rng(3).uniform(0.5, 2.0, (5, 2))
    t = get_affine_transform_jax(centers, scales, 0.0, (48, 64))
    assert t.shape == (5, 2, 3)
    for i in range(5):
        ref = get_affine_transform(centers[i], scales[i], 0.0, (48, 64))
        np.testing.assert_allclose(np.asarray(t[i]), ref, rtol=1e-5, atol=1e-4)
    pts = np.random.default_rng(4).uniform(0, 64, (5, 17, 2))
    out = affine_transform_jax(pts, t)
    for i in range(5):
        ref = affine_transform(pts[i], np.asarray(t[i], np.float64))
        np.testing.assert_allclose(np.asarray(out[i]), ref, rtol=1e-4, atol=1e-3)


def test_box_to_center_scale():
    c, s = box_to_center_scale([10, 20, 50, 100], aspect_ratio=192 / 256)
    np.testing.assert_allclose(c, [35.0, 70.0])
    # h=100 dominates: w -> 75; scale = size/200*1.25
    np.testing.assert_allclose(s, [75 / 200 * 1.25, 100 / 200 * 1.25])


@pytest.mark.parametrize("rot", [0.0, 20.0])
def test_warp_matches_cv2(rot):
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 255, (120, 160, 3)).astype(np.float32)
    center, scale = np.array([80.0, 60.0]), np.array([0.5, 0.5 * 64 / 48])
    t = get_affine_transform(center, scale, rot, (48, 64))
    ref = cv2.warpAffine(img, t.astype(np.float32), (48, 64), flags=cv2.INTER_LINEAR)
    ours = np.asarray(warp_affine(jnp.asarray(img), t, (64, 48)))
    # cv2 uses fixed-point bilinear (5-bit weights) -> tolerance ~ 1/32 * range
    assert np.abs(ours - ref).mean() < 0.5
    assert np.abs(ours - ref).max() < 16.0


def test_crop_persons_matches_warp():
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.uniform(0, 255, (100, 100, 3)).astype(np.float32))
    centers = rng.uniform(30, 70, (4, 2))
    scales = np.tile([0.4, 0.4 * 64 / 48], (4, 1)) * rng.uniform(0.8, 1.2, (4, 1))
    inv = get_affine_transform_jax(centers, scales, 0.0, (48, 64), inv=True)
    crops = np.asarray(crop_persons(img, inv, (64, 48)))
    for i in range(4):
        t = get_affine_transform(centers[i], scales[i], 0.0, (48, 64))
        ref = np.asarray(warp_affine(img, t, (64, 48)))
        np.testing.assert_allclose(crops[i], ref, rtol=1e-4, atol=5e-2)


def test_normalize():
    x = jnp.full((2, 2, 3), 127.5)
    y = normalize_image(x, (0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
    np.testing.assert_allclose(
        np.asarray(y)[0, 0], (0.5 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225]),
        rtol=1e-5)
