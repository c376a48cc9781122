"""C++ native NMS vs the numpy oracles (identical results required)."""

import numpy as np
import pytest

from flowtrack_tpu import native
from flowtrack_tpu.ops.nms import nms_boxes_np, oks_nms_np


@pytest.fixture(scope="module", autouse=True)
def require_native():
    assert native.available(), "g++ toolchain expected on this machine"


def random_dets(rng, n=60):
    xy = rng.uniform(0, 200, (n, 2))
    wh = rng.uniform(10, 80, (n, 2))
    scores = rng.uniform(0, 1, (n, 1))
    return np.concatenate([xy, xy + wh, scores], axis=1)


@pytest.mark.smoke
def test_cpu_nms_matches_numpy(rng):
    for trial in range(5):
        dets = random_dets(rng)
        for thr in (0.3, 0.5, 0.7):
            got = native.cpu_nms(dets, thr)
            want = nms_boxes_np(dets, thr)
            assert got == list(want), f"trial {trial} thr {thr}"


def test_cpu_nms_empty_and_single(rng):
    assert native.cpu_nms(np.zeros((0, 5), np.float32), 0.5) == []
    one = np.array([[0, 0, 10, 10, 0.9]], np.float32)
    assert native.cpu_nms(one, 0.5) == [0]


def make_kpts_list(rng, n=25, k=17):
    out = []
    for _ in range(n):
        c = rng.uniform(50, 250, 2)
        kp = np.zeros((k, 3))
        kp[:, :2] = c + rng.uniform(-30, 30, (k, 2))
        kp[:, 2] = rng.uniform(0, 1, k)
        out.append({"keypoints": kp, "score": float(rng.uniform(0, 1)),
                    "area": float(rng.uniform(500, 5000))})
    return out


def test_cpu_oks_nms_matches_numpy(rng):
    for trial in range(3):
        kl = make_kpts_list(rng)
        for thr, vis in ((0.9, None), (0.5, 0.2), (0.7, 0.2)):
            got = native.cpu_oks_nms(kl, thr, in_vis_thre=vis)
            want = oks_nms_np(kl, thr, in_vis_thre=vis)
            assert got == list(want), f"trial {trial} thr {thr} vis {vis}"


def test_cpu_nms_tie_order_matches_numpy():
    """Equal scores: numpy's argsort()[::-1] keeps the HIGHEST index first;
    the C++ sort must use the same tie-break or a different candidate
    survives depending on which backend is available."""
    boxes = np.asarray([[0, 0, 10, 10, 0.7],
                        [0, 0, 10, 10, 0.7],
                        [50, 50, 60, 60, 0.7]], np.float32)
    got = native.cpu_nms(boxes, 0.5)
    assert got == list(nms_boxes_np(boxes, 0.5))
    # (score desc, idx desc): the disjoint box 2 first, then box 1 of the
    # duplicate pair (highest index on the tie); box 0 suppressed
    assert got == [2, 1]


def test_cpu_nms_quantized_scores_match_numpy(rng):
    """Randomized dets with heavily quantized scores (many exact ties)."""
    for trial in range(5):
        dets = random_dets(rng)
        dets[:, 4] = np.round(dets[:, 4] * 4) / 4  # scores in {0,.25,.5,.75,1}
        for thr in (0.3, 0.5):
            assert native.cpu_nms(dets, thr) == list(nms_boxes_np(dets, thr))


def test_cpu_oks_nms_quantized_scores_match_numpy(rng):
    kl = make_kpts_list(rng)
    for item in kl:
        item["score"] = round(item["score"] * 3) / 3  # force exact ties
    for thr in (0.5, 0.9):
        got = native.cpu_oks_nms(kl, thr)
        want = list(oks_nms_np(kl, thr))
        assert got == want
