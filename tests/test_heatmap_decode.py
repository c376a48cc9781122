"""Tests for GT heatmap synthesis, decode, flip-back — vs a from-scratch
numpy oracle written against the paper/lineage equations (SURVEY.md section 5)."""

import numpy as np
import jax.numpy as jnp

from flowtrack_tpu.ops.heatmap import (
    flip_back,
    generate_target_jax,
    merge_flip_test,
)
from flowtrack_tpu.ops.decode import get_final_preds, get_max_preds, rescore
from flowtrack_tpu.ops.affine import get_affine_transform, affine_transform
from flowtrack_tpu.config import COCO_FLIP_PAIRS
import pytest


def oracle_generate_target(joints, joints_vis, hm_hw, img_hw, sigma):
    """Literal transcription of the lineage's generate_target (loops + paste)."""
    K = joints.shape[0]
    H, W = hm_hw
    stride = (img_hw[1] / W, img_hw[0] / H)
    target = np.zeros((K, H, W), np.float32)
    weight = np.array(joints_vis, np.float32).copy()
    tmp_size = sigma * 3
    for j in range(K):
        mu_x = int(joints[j][0] / stride[0] + 0.5)
        mu_y = int(joints[j][1] / stride[1] + 0.5)
        ul = [int(mu_x - tmp_size), int(mu_y - tmp_size)]
        br = [int(mu_x + tmp_size + 1), int(mu_y + tmp_size + 1)]
        if ul[0] >= W or ul[1] >= H or br[0] < 0 or br[1] < 0:
            weight[j] = 0
            continue
        size = 2 * int(tmp_size) + 1
        x = np.arange(0, size, 1, np.float32)
        y = x[:, None]
        x0 = y0 = size // 2
        g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma ** 2))
        g_x = max(0, -ul[0]), min(br[0], W) - ul[0]
        g_y = max(0, -ul[1]), min(br[1], H) - ul[1]
        img_x = max(0, ul[0]), min(br[0], W)
        img_y = max(0, ul[1]), min(br[1], H)
        if weight[j] > 0.5:
            target[j][img_y[0]:img_y[1], img_x[0]:img_x[1]] = \
                g[g_y[0]:g_y[1], g_x[0]:g_x[1]]
    return target, weight


def test_generate_target_matches_oracle(rng):
    joints = rng.uniform(-10, 260, (17, 2))
    vis = (rng.uniform(size=17) > 0.3).astype(np.float32)
    t, w = generate_target_jax(joints, vis, (64, 48), (256, 192), 2.0)
    ot, ow = oracle_generate_target(joints, vis, (64, 48), (256, 192), 2.0)
    np.testing.assert_allclose(np.asarray(w), ow)
    np.testing.assert_allclose(np.transpose(np.asarray(t), (2, 0, 1)), ot,
                               atol=1e-5)


def test_get_max_preds(rng):
    hm = rng.uniform(0, 0.5, (2, 64, 48, 17)).astype(np.float32)
    # plant peaks
    px, py = 13, 29
    hm[0, py, px, 3] = 2.0
    preds, maxvals = get_max_preds(jnp.asarray(hm))
    assert np.asarray(preds)[0, 3].tolist() == [px, py]
    assert np.asarray(maxvals)[0, 3] == 2.0


@pytest.mark.smoke
def test_quarter_offset_and_transform(rng):
    hm = np.zeros((1, 64, 48, 17), np.float32)
    px, py = 20, 30
    hm[0, py, px, :] = 1.0
    hm[0, py, px + 1, :] = 0.5      # larger right neighbor -> +0.25 in x
    hm[0, py - 1, px, :] = 0.3      # larger top neighbor -> -0.25 in y
    center = np.array([[100.0, 90.0]])
    scale = np.array([[1.0, 64 / 48]])
    preds, _ = get_final_preds(jnp.asarray(hm), jnp.asarray(center),
                               jnp.asarray(scale), post_process=True)
    # oracle: offset then host-side inverse affine
    coords = np.array([px + 0.25, py - 0.25])
    inv = get_affine_transform(center[0], scale[0], 0, (48, 64), inv=True)
    expect = affine_transform(coords, inv)
    np.testing.assert_allclose(np.asarray(preds)[0, 0], expect, rtol=1e-4,
                               atol=1e-3)


def test_flip_back_and_merge(rng):
    hm = rng.uniform(0, 1, (2, 64, 48, 17)).astype(np.float32)
    fb = np.asarray(flip_back(jnp.asarray(hm), COCO_FLIP_PAIRS))
    # BOTH directions of the swap (a one-directional perm bug would leave
    # one side un-swapped): left eye <- mirrored right eye AND vice versa
    np.testing.assert_allclose(fb[..., 1], hm[:, :, ::-1, 2])
    np.testing.assert_allclose(fb[..., 2], hm[:, :, ::-1, 1])
    np.testing.assert_allclose(fb[..., 0], hm[:, :, ::-1, 0])  # nose: unswapped
    merged = np.asarray(merge_flip_test(jnp.asarray(hm), jnp.asarray(hm),
                                        COCO_FLIP_PAIRS, shift=True))
    shifted = fb.copy()
    shifted[:, :, 1:, :] = shifted[:, :, :-1, :]
    np.testing.assert_allclose(merged, (hm + shifted) / 2, rtol=1e-5)


def test_rescore():
    # non-unit box score on the passing row so the box_score x mean_conf
    # product is actually exercised (1.0 is the multiplicative identity)
    maxvals = jnp.asarray([[0.9, 0.1, 0.5], [0.1, 0.1, 0.1]])
    s = np.asarray(rescore(jnp.asarray([0.8, 2.0]), maxvals, in_vis_thre=0.2))
    np.testing.assert_allclose(s[0], 0.8 * (0.9 + 0.5) / 2, rtol=1e-5)
    np.testing.assert_allclose(s[1], 0.0)


def test_blur_heatmaps_preserves_peak_location():
    from flowtrack_tpu.ops.decode import blur_heatmaps

    hm = np.zeros((1, 32, 32, 2), np.float32)
    hm[0, 10, 20, 0] = 1.0
    hm[0, 25, 5, 1] = 0.7
    out = np.asarray(blur_heatmaps(jnp.asarray(hm), 11))
    preds, maxvals = get_max_preds(jnp.asarray(out))
    np.testing.assert_array_equal(np.asarray(preds)[0, 0], [20, 10])
    np.testing.assert_array_equal(np.asarray(preds)[0, 1], [5, 25])
    # peak value preserved (reference rescales to the original max)
    np.testing.assert_allclose(np.asarray(maxvals)[0], [1.0, 0.7],
                               rtol=1e-5)
    # energy actually spread to neighbors
    assert out[0, 10, 21, 0] > 0.3
