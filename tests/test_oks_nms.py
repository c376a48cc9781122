"""OKS + greedy NMS device implementations vs numpy oracles."""

import numpy as np
import jax.numpy as jnp

from flowtrack_tpu.ops.oks import oks_matrix, oks_one_to_many, oks_iou_np, pose_area
import pytest

from flowtrack_tpu.ops.nms import (
    greedy_nms_from_matrix,
    iou_matrix,
    nms_boxes,
    nms_boxes_np,
    oks_nms,
    oks_nms_np,
)


def _rand_poses(rng, n, spread=30.0):
    base = rng.uniform(50, 200, (n, 1, 2))
    return (base + rng.normal(0, spread, (n, 17, 2))).astype(np.float32)


def test_oks_matrix_matches_oracle(rng):
    a = _rand_poses(rng, 4)
    b = _rand_poses(rng, 6)
    a_area = rng.uniform(1000, 5000, 4)
    b_area = rng.uniform(1000, 5000, 6)
    m = np.asarray(oks_matrix(jnp.asarray(a), jnp.asarray(a_area),
                              jnp.asarray(b), jnp.asarray(b_area)))
    for i in range(4):
        g = np.zeros(51)
        g[0::3], g[1::3], g[2::3] = a[i, :, 0], a[i, :, 1], 2
        d = np.zeros((6, 51))
        d[:, 0::3], d[:, 1::3] = b[:, :, 0], b[:, :, 1]
        ref = oks_iou_np(g, d, a_area[i], b_area)
        np.testing.assert_allclose(m[i], ref, rtol=1e-4, atol=1e-5)


def test_oks_identical_poses_is_one(rng):
    a = _rand_poses(rng, 3)
    area = pose_area(jnp.asarray(a))
    m = np.asarray(oks_matrix(jnp.asarray(a), area, jnp.asarray(a), area))
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-5)


def test_oks_one_to_many_vis_threshold(rng):
    """The lineage's quirk filters by the CANDIDATE's visibility (vd), not
    the kept pose's (see ops/oks.py module docstring)."""
    g = _rand_poses(rng, 1)[0]
    d = _rand_poses(rng, 5)
    d_vis = (rng.uniform(size=(5, 17)) > 0.4).astype(np.float64)
    d_vis[3] = 0.0  # one candidate with no visible joints -> OKS must be 0
    out = np.asarray(oks_one_to_many(jnp.asarray(g), jnp.asarray(d_vis),
                                     2000.0, jnp.asarray(d),
                                     jnp.full(5, 2000.0), in_vis_thre=0.5))
    gflat = np.zeros(51)
    gflat[0::3], gflat[1::3], gflat[2::3] = g[:, 0], g[:, 1], 1.0
    dflat = np.concatenate([d, d_vis[..., None]], -1).reshape(5, -1)
    ref = oks_iou_np(gflat, dflat, 2000.0, np.full(5, 2000.0), in_vis_thre=0.5)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    assert out[3] == 0.0


def test_bbox_nms_matches_oracle(rng):
    n = 20
    xy = rng.uniform(0, 200, (n, 2))
    wh = rng.uniform(20, 80, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(size=n).astype(np.float32)
    keep = np.asarray(nms_boxes(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    ref = nms_boxes_np(np.concatenate([boxes, scores[:, None]], 1), 0.5)
    assert sorted(np.nonzero(keep)[0].tolist()) == sorted(ref)


def test_bbox_nms_with_padding(rng):
    n = 10
    xy = rng.uniform(0, 200, (n, 2))
    wh = rng.uniform(20, 80, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(size=n).astype(np.float32)
    # pad with garbage that overlaps everything; must not affect result
    pad_boxes = np.tile([0, 0, 300, 300], (4, 1)).astype(np.float32)
    all_boxes = np.concatenate([boxes, pad_boxes])
    all_scores = np.concatenate([scores, np.full(4, 10.0, np.float32)])
    valid = np.concatenate([np.ones(n, bool), np.zeros(4, bool)])
    keep = np.asarray(nms_boxes(jnp.asarray(all_boxes), jnp.asarray(all_scores),
                                0.5, valid=jnp.asarray(valid)))
    ref = nms_boxes_np(np.concatenate([boxes, scores[:, None]], 1), 0.5)
    assert sorted(np.nonzero(keep)[0].tolist()) == sorted(ref)
    assert not keep[n:].any()


@pytest.mark.smoke
def test_oks_nms_matches_oracle(rng):
    n = 12
    poses = _rand_poses(rng, n, spread=15.0)
    # make clusters: duplicate some poses with jitter
    poses[6:] = poses[:6] + rng.normal(0, 2.0, (6, 17, 2))
    scores = rng.uniform(size=n).astype(np.float32)
    areas = np.asarray(pose_area(jnp.asarray(poses)))
    keep = np.asarray(oks_nms(jnp.asarray(poses), jnp.asarray(scores),
                              jnp.asarray(areas), 0.9))
    kpts_list = [{"keypoints": np.concatenate([poses[i], np.ones((17, 1))], 1),
                  "score": scores[i], "area": areas[i]} for i in range(n)]
    ref = oks_nms_np(kpts_list, 0.9)
    assert sorted(np.nonzero(keep)[0].tolist()) == sorted(ref)


def test_greedy_matrix_simple():
    sim = jnp.asarray([[1.0, 0.95, 0.1], [0.95, 1.0, 0.2], [0.1, 0.2, 1.0]])
    keep = np.asarray(greedy_nms_from_matrix(sim, jnp.asarray([0.5, 0.9, 0.3]),
                                             0.9))
    assert keep.tolist() == [False, True, True]


def test_iou_matrix():
    a = jnp.asarray([[0.0, 0.0, 9.0, 9.0]])
    m = np.asarray(iou_matrix(a, a))
    np.testing.assert_allclose(m, 1.0)
    # the +1 pixel-area convention, hand-computed (self-IoU can't pin it):
    # [0,0,9,9] is 10x10=100, [0,0,4,9] is 5x10=50, inter 5x10=50
    # -> 50/(100+50-50) = 0.5 (without +1: 36/81 ~ 0.444)
    b = jnp.asarray([[0.0, 0.0, 4.0, 9.0]])
    np.testing.assert_allclose(np.asarray(iou_matrix(a, b)), 0.5)
