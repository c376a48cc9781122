"""Fused matmul crop: equivalence with the cv2-twin gather warp, the Pallas
kernel, and the normalize fusion."""

import numpy as np
import pytest
import jax.numpy as jnp

from flowtrack_tpu.config import IMAGENET_MEAN, IMAGENET_STD
from flowtrack_tpu.ops.affine import (
    crop_persons,
    get_affine_transform,
    get_affine_transform_jax,
    warp_affine,
)
from flowtrack_tpu.ops.crop import (
    crop_resize_normalize,
    crop_resize_normalize_pallas,
)

OUT_HW = (64, 48)


def _random_persons(rng, n=3):
    centers = np.stack([rng.uniform(60, 260, n),
                        rng.uniform(60, 180, n)], 1).astype(np.float32)
    # aspect-matched scales (w/h == 48/64 == 0.75), reference convention
    h = rng.uniform(0.3, 0.9, n)
    scales = np.stack([h * 0.75, h], 1).astype(np.float32)
    return centers, scales


@pytest.mark.smoke
def test_matmul_crop_matches_gather_warp(rng):
    img = rng.uniform(0, 255, (240, 320, 3)).astype(np.float32)
    centers, scales = _random_persons(rng)
    got = np.asarray(crop_resize_normalize(
        jnp.asarray(img), jnp.asarray(centers), jnp.asarray(scales), OUT_HW))
    for i in range(len(centers)):
        trans = get_affine_transform(centers[i], scales[i], 0,
                                     (OUT_HW[1], OUT_HW[0]))
        want = np.asarray(warp_affine(jnp.asarray(img), jnp.asarray(trans),
                                      OUT_HW))
        np.testing.assert_allclose(got[i], want, atol=1e-2, rtol=1e-4)


def test_matmul_crop_matches_crop_persons(rng):
    img = rng.uniform(0, 255, (200, 280, 3)).astype(np.float32)
    centers, scales = _random_persons(rng)
    inv = get_affine_transform_jax(jnp.asarray(centers), jnp.asarray(scales),
                                   0.0, (OUT_HW[1], OUT_HW[0]), inv=True)
    want = np.asarray(crop_persons(jnp.asarray(img), inv, OUT_HW))
    got = np.asarray(crop_resize_normalize(
        jnp.asarray(img), jnp.asarray(centers), jnp.asarray(scales), OUT_HW))
    np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-4)


def test_pallas_matches_xla(rng):
    img = rng.uniform(0, 255, (96, 128, 3)).astype(np.float32)
    centers, scales = _random_persons(rng, 2)
    want = np.asarray(crop_resize_normalize(
        jnp.asarray(img), jnp.asarray(centers), jnp.asarray(scales), OUT_HW,
        IMAGENET_MEAN, IMAGENET_STD))
    got = np.asarray(crop_resize_normalize_pallas(
        jnp.asarray(img), jnp.asarray(centers), jnp.asarray(scales), OUT_HW,
        IMAGENET_MEAN, IMAGENET_STD, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_normalize_fusion(rng):
    img = rng.uniform(0, 255, (100, 120, 3)).astype(np.float32)
    centers, scales = _random_persons(rng, 1)
    raw = np.asarray(crop_resize_normalize(
        jnp.asarray(img), jnp.asarray(centers), jnp.asarray(scales), OUT_HW))
    norm = np.asarray(crop_resize_normalize(
        jnp.asarray(img), jnp.asarray(centers), jnp.asarray(scales), OUT_HW,
        IMAGENET_MEAN, IMAGENET_STD))
    want = (raw / 255.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(norm, want, atol=1e-5)


def test_border_zero(rng):
    """Crops hanging off the image edge read 0 outside (cv2 border)."""
    img = np.full((50, 50, 3), 100.0, np.float32)
    centers = np.array([[0.0, 25.0]], np.float32)  # half off the left edge
    scales = np.array([[0.12, 0.16]], np.float32)
    got = np.asarray(crop_resize_normalize(
        jnp.asarray(img), jnp.asarray(centers), jnp.asarray(scales), OUT_HW))
    trans = get_affine_transform(centers[0], scales[0], 0,
                                 (OUT_HW[1], OUT_HW[0]))
    want = np.asarray(warp_affine(jnp.asarray(img), jnp.asarray(trans),
                                  OUT_HW))
    np.testing.assert_allclose(got[0], want, atol=1e-2)
    assert got[0, :, 0, :].max() < 1.0  # left column fully outside -> 0
