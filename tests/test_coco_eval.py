"""COCO keypoint AP evaluator tests — hand-computed scenarios.

pycocotools is not installed (SURVEY.md section 8), so correctness is pinned
with analytically tractable cases: perfect detections, misses, duplicate
detections, crowd-ignore, and area-range slicing.
"""

import numpy as np

import pytest

from flowtrack_tpu.eval.coco_eval import (
    COCOKeypointEval,
    MAX_DETS,
    compute_oks,
    summarize,
)

K = 17


def make_pose(cx, cy, spread=10.0, vis=2):
    kp = []
    rng = np.random.default_rng(abs(int(cx * 7 + cy)) % 1000)
    for _ in range(K):
        kp += [cx + rng.uniform(-spread, spread),
               cy + rng.uniform(-spread, spread), vis]
    return kp


def gt_ann(image_id, kp, area=64.0 ** 2, iscrowd=0):
    xs, ys = np.array(kp[0::3]), np.array(kp[1::3])
    bbox = [xs.min(), ys.min(), xs.max() - xs.min(), ys.max() - ys.min()]
    nk = int((np.array(kp[2::3]) > 0).sum())
    return {"image_id": image_id, "keypoints": kp, "area": area,
            "bbox": bbox, "iscrowd": iscrowd, "num_keypoints": nk}


def dt_ann(image_id, kp, score):
    return {"image_id": image_id, "keypoints": kp, "score": score}


@pytest.mark.smoke
def test_perfect_predictions_ap1():
    gts, dts = [], []
    for img in range(3):
        for p in range(2):
            kp = make_pose(100 + 80 * p, 100 + 60 * img)
            gts.append(gt_ann(img, kp))
            dts.append(dt_ann(img, kp, 0.9))
    stats = COCOKeypointEval(gts, dts).evaluate()
    assert np.isclose(stats["AP"], 1.0)
    assert np.isclose(stats["AR"], 1.0)
    assert np.isclose(stats["AP50"], 1.0)


def test_oks_identity_and_far():
    kp = make_pose(100, 100)
    gt = [gt_ann(0, kp)]
    ious = compute_oks(gt, [dt_ann(0, kp, 0.9)])
    assert np.isclose(ious[0, 0], 1.0)
    far = make_pose(100000, 100000)
    ious2 = compute_oks(gt, [dt_ann(0, far, 0.9)])
    assert ious2[0, 0] < 1e-6


def test_one_miss_halves_recall():
    kp1, kp2 = make_pose(100, 100), make_pose(400, 400)
    gts = [gt_ann(0, kp1), gt_ann(0, kp2)]
    dts = [dt_ann(0, kp1, 0.9)]  # second person missed
    stats = COCOKeypointEval(gts, dts).evaluate()
    assert np.isclose(stats["AR"], 0.5)
    # precision at the single detection is 1.0 -> AP = area under P(R) = 0.5
    assert np.isclose(stats["AP"], 0.5, atol=0.01)


def test_false_positive_lowers_ap():
    kp = make_pose(100, 100)
    gts = [gt_ann(0, kp)]
    # a confident far-away FP ranked above the TP
    dts = [dt_ann(0, make_pose(5000, 5000), 0.95), dt_ann(0, kp, 0.5)]
    stats = COCOKeypointEval(gts, dts).evaluate()
    assert stats["AP"] < 0.6
    assert np.isclose(stats["AR"], 1.0)  # still found eventually


def test_crowd_gt_ignored():
    kp = make_pose(100, 100)
    # crowd GT absorbs its detection; the only real GT is matched
    kp2 = make_pose(300, 300)
    gts = [gt_ann(0, kp, iscrowd=1), gt_ann(0, kp2)]
    dts = [dt_ann(0, kp, 0.9), dt_ann(0, kp2, 0.8)]
    stats = COCOKeypointEval(gts, dts).evaluate()
    assert np.isclose(stats["AP"], 1.0)


def test_area_ranges_slice():
    small_kp = make_pose(100, 100, spread=5.0)
    large_kp = make_pose(400, 400, spread=60.0)
    gts = [gt_ann(0, small_kp, area=40.0 ** 2),
           gt_ann(0, large_kp, area=200.0 ** 2)]
    dts = [dt_ann(0, small_kp, 0.9), dt_ann(0, large_kp, 0.8)]
    stats = COCOKeypointEval(gts, dts).evaluate()
    assert np.isclose(stats["APm"], 1.0)   # only the 40^2 GT in range
    assert np.isclose(stats["APl"], 1.0)   # only the 200^2 GT in range
    assert np.isclose(stats["AP"], 1.0)


def test_unlabeled_gt_bbox_fallback():
    # GT with zero labeled keypoints: detections inside its bbox window are
    # matched via the bbox-proximity fallback and ignored (not FPs).
    kp_un = [0.0] * (3 * K)
    g = gt_ann(0, kp_un, area=64.0 ** 2)
    g["bbox"] = [80, 80, 40, 40]
    g["num_keypoints"] = 0
    kp_real = make_pose(300, 300)
    gts = [g, gt_ann(0, kp_real)]
    dts = [dt_ann(0, make_pose(100, 100, spread=3.0), 0.9),
           dt_ann(0, kp_real, 0.8)]
    stats = COCOKeypointEval(gts, dts).evaluate()
    assert np.isclose(stats["AP"], 1.0)


def test_duplicate_detections_are_fps():
    kp = make_pose(100, 100)
    gts = [gt_ann(0, kp)]
    dts = [dt_ann(0, kp, 0.9), dt_ann(0, kp, 0.8)]  # duplicate
    stats = COCOKeypointEval(gts, dts).evaluate()
    # TP first, duplicate FP second: precision drops after recall 1.0
    assert np.isclose(stats["AP"], 1.0)  # 101-pt AP unaffected by trailing FP
    assert np.isclose(stats["AR"], 1.0)

    # duplicate ranked FIRST: it matches the GT at high OKS thresholds and
    # steals it (the off-by-a-pixel pose fails the strictest thresholds),
    # so exactly half the 10 OKS thresholds score 1.0 -> AP 0.5 exactly
    dts2 = [dt_ann(0, make_pose(101, 101), 0.95), dt_ann(0, kp, 0.8)]
    stats2 = COCOKeypointEval(gts, dts2).evaluate()
    assert np.isclose(stats2["AP"], 0.5, atol=0.01), stats2["AP"]

    # duplicate BETWEEN two TPs: the FP must cut precision on the recall
    # tail — (51*1 + 50*(2/3))/101. A 'silently ignore duplicates'
    # implementation (dt_ig on already-matched GT) would score 1.0.
    kp2 = make_pose(300, 300)
    gts3 = [gt_ann(0, kp), gt_ann(0, kp2)]
    dts3 = [dt_ann(0, kp, 0.95), dt_ann(0, kp, 0.9), dt_ann(0, kp2, 0.8)]
    stats3 = COCOKeypointEval(gts3, dts3).evaluate()
    assert np.isclose(stats3["AP"], (51 + 50 * 2 / 3) / 101, atol=1e-6)


def test_unmatched_out_of_range_dt_ignored_in_slices():
    """A large unmatched detection must not count as an FP in the MEDIUM
    slice (pycocotools dt-area ignore rule), but drags down the ALL slice."""
    small_kp = make_pose(100, 100, spread=5.0)
    gts = [gt_ann(0, small_kp, area=40.0 ** 2)]
    big_fp = make_pose(500, 500, spread=80.0)  # bbox area ~ (160)^2 > 96^2
    dts = [dt_ann(0, big_fp, 0.95), dt_ann(0, small_kp, 0.5)]
    stats = COCOKeypointEval(gts, dts).evaluate()
    assert np.isclose(stats["APm"], 1.0), stats  # FP ignored in medium
    assert stats["AP"] < 0.6                     # but counted in all


def test_summarize_formats():
    kp = make_pose(100, 100)
    stats = COCOKeypointEval([gt_ann(0, kp)], [dt_ann(0, kp, 0.9)]).evaluate()
    text = summarize(stats)
    assert "Average Precision" in text and "0.50:0.95" in text
    assert len(text.splitlines()) == 10


def test_max_dets_cap():
    kp = make_pose(100, 100)
    gts = [gt_ann(0, kp)]
    dts = [dt_ann(0, make_pose(1000 + 50 * i, 1000), 0.99 - 0.001 * i)
           for i in range(MAX_DETS)]
    dts.append(dt_ann(0, kp, 0.01))  # the real one, ranked below the cap
    stats = COCOKeypointEval(gts, dts).evaluate()
    assert np.isclose(stats["AR"], 0.0)  # capped out by 20 FPs


def _random_scenario(rng, n_images=4):
    """Random mixed scenario: per image 0-3 GTs, detections = noisy copies
    of random GTs + pure spurious poses, distinct random scores."""
    gts, dts = [], []
    for img in range(n_images):
        centers = [(80 + 120 * g + rng.uniform(-5, 5),
                    90 + rng.uniform(-20, 20))
                   for g in range(int(rng.integers(0, 4)))]
        for cx, cy in centers:
            gts.append(gt_ann(img, make_pose(cx, cy),
                              area=float(rng.uniform(32, 128)) ** 2))
        for _ in range(int(rng.integers(0, 5))):
            if centers and rng.random() < 0.7:
                cx, cy = centers[int(rng.integers(len(centers)))]
                jitter = float(rng.uniform(0, 15))
                kp = make_pose(cx + jitter, cy - jitter / 2)
            else:
                kp = make_pose(float(rng.uniform(0, 600)),
                               float(rng.uniform(0, 600)))
            dts.append(dt_ann(img, kp, float(rng.uniform(0.05, 0.99))))
    return gts, dts


def test_detection_order_invariance(rng):
    """The evaluator must rank by score, not input order: shuffling the
    detection list cannot change any statistic."""
    for trial in range(5):
        gts, dts = _random_scenario(rng)
        if not gts or not dts:
            continue
        base = COCOKeypointEval(gts, dts).evaluate()
        perm = [dts[i] for i in rng.permutation(len(dts))]
        got = COCOKeypointEval(gts, perm).evaluate()
        for k, v in base.items():
            assert np.isclose(got[k], v), (trial, k, got[k], v)


def test_score_monotonic_transform_invariance(rng):
    """AP/AR are rank statistics: any strictly increasing score transform
    leaves every number unchanged."""
    for trial in range(5):
        gts, dts = _random_scenario(rng)
        if not gts or not dts:
            continue
        base = COCOKeypointEval(gts, dts).evaluate()
        squeezed = [{**d, "score": 0.5 * d["score"] + 0.25} for d in dts]
        got = COCOKeypointEval(gts, squeezed).evaluate()
        for k, v in base.items():
            assert np.isclose(got[k], v), (trial, k, got[k], v)
