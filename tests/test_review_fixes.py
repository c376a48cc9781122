"""Regression tests for the round-1 code-review findings."""

import numpy as np
import jax.numpy as jnp

from flowtrack_tpu.models.flownet import postprocess_flow


class TestPostprocessFlow:
    def test_quarter_res_variant_scales(self):
        # flownet_s: quarter-res, flow/div_flow -> x4 upsample + x20
        q = jnp.ones((1, 16, 16, 2)) * 0.5
        out = np.asarray(postprocess_flow(q, "flownet_s", (64, 64), 20.0))
        assert out.shape == (1, 64, 64, 2)
        np.testing.assert_allclose(out, 10.0, rtol=1e-5)

    def test_flownet2_full_res_not_rescaled(self):
        # flownet2: already final full-res flow -> NO div_flow, NO x4
        f = jnp.ones((1, 64, 64, 2)) * 3.0
        out = np.asarray(postprocess_flow(f, "flownet2", (64, 64), 20.0))
        np.testing.assert_allclose(out, 3.0, rtol=1e-5)

    def test_resize_rescales_components(self):
        # doubling spatial size doubles the flow vectors
        f = jnp.ones((1, 32, 32, 2)) * 2.0
        out = np.asarray(postprocess_flow(f, "flownet2", (64, 64), 20.0))
        np.testing.assert_allclose(out, 4.0, rtol=1e-5)


def test_clip_prepare_keeps_negative_xy():
    """Off-edge boxes must not be shifted by the padding clamp."""
    from dataclasses import replace

    from flowtrack_tpu.config import Config, ModelConfig
    from flowtrack_tpu.pipeline import batched_box_to_center_scale
    from flowtrack_tpu.tracking.clip_pipeline import ClipTracker

    class NullModel:
        def apply(self, *a, **k):
            raise AssertionError("not used")

    cfg = Config(model=ModelConfig(image_size=(64, 64),
                                   heatmap_size=(16, 16)))
    tracker = ClipTracker(cfg, NullModel(), {}, NullModel(), {})
    boxes = np.array([[[-30.0, 50.0, 100.0, 200.0]]], np.float32)
    args = tracker.prepare(np.zeros((1, 64, 64, 3), np.float32), boxes,
                           np.ones((1, 1), np.float32),
                           np.ones((1, 1), bool))
    centers = np.asarray(args[1])
    want_c, _ = batched_box_to_center_scale(boxes[0], 1.0)
    np.testing.assert_allclose(centers[0, 0], want_c[0], atol=1e-4)
    assert centers[0, 0, 0] == 20.0  # -30 + 100/2


def test_quarter_offset_strict_border_gate():
    """Peak at x==1: reference leaves it unshifted (strict 1 < p gate)."""
    from flowtrack_tpu.ops.decode import get_max_preds, _quarter_offset

    hm = np.zeros((1, 8, 8, 1), np.float32)
    hm[0, 4, 1, 0] = 1.0
    hm[0, 4, 2, 0] = 0.5  # larger right neighbor would pull +0.25
    preds, _ = get_max_preds(jnp.asarray(hm))
    out = np.asarray(_quarter_offset(jnp.asarray(hm), preds))
    np.testing.assert_allclose(out[0, 0], [1.0, 4.0])  # unshifted

    hm2 = np.zeros((1, 8, 8, 1), np.float32)
    hm2[0, 4, 2, 0] = 1.0
    hm2[0, 4, 3, 0] = 0.5
    preds2, _ = get_max_preds(jnp.asarray(hm2))
    out2 = np.asarray(_quarter_offset(jnp.asarray(hm2), preds2))
    np.testing.assert_allclose(out2[0, 0, 0], 2.25)  # interior: shifted


def test_crowd_absorbs_multiple_detections():
    """pycocotools: an iscrowd GT can ignore-match many detections."""
    from tests.test_coco_eval import dt_ann, gt_ann, make_pose
    from flowtrack_tpu.eval.coco_eval import COCOKeypointEval

    crowd_kp = make_pose(100, 100)
    real_kp = make_pose(400, 400)
    gts = [gt_ann(0, crowd_kp, iscrowd=1), gt_ann(0, real_kp)]

    def jitter(kp, dx):
        out = list(kp)
        out[0::3] = [v + dx for v in out[0::3]]
        return out

    # three near-copies of the crowd pose + one real detection
    dts = [dt_ann(0, jitter(crowd_kp, 0.5 * i), 0.9 - 0.01 * i)
           for i in range(3)] + [dt_ann(0, real_kp, 0.8)]
    stats = COCOKeypointEval(gts, dts).evaluate()
    assert np.isclose(stats["AP"], 1.0), stats  # crowd dts all absorbed


def test_accuracy_norm_matches_reference_convention():
    """x distances normalized by h/10 (the reference's [h, w] ordering)."""
    from flowtrack_tpu.engine.metrics import heatmap_accuracy

    h, w = 64, 48
    gt = np.zeros((1, h, w, 1), np.float32)
    gt[0, 30, 20, 0] = 1.0
    pred = np.zeros((1, h, w, 1), np.float32)
    # x off by 3: normalized 3/(h/10)=0.469 < 0.5 -> correct under the
    # reference convention; would be 3/(w/10)=0.625 -> wrong under [w, h]
    pred[0, 30, 23, 0] = 1.0
    acc, _, _ = heatmap_accuracy(jnp.asarray(pred), jnp.asarray(gt))
    assert float(acc) == 1.0


def test_mpii_mean_excludes_pelvis_thorax(tmp_path, rng):
    import json
    import os

    from dataclasses import replace
    from flowtrack_tpu.config import Config, ModelConfig
    from flowtrack_tpu.data import MPIIDataset
    from tests.fixtures import synth_pose

    os.makedirs(tmp_path / "annot", exist_ok=True)
    joints = synth_pose(rng, 150, 120, size=80)[:16]
    anns = [{"image": "x.png", "center": [150.0, 120.0], "scale": 0.8,
             "joints": joints.tolist(), "joints_vis": [1] * 16}]
    with open(tmp_path / "annot" / "valid.json", "w") as f:
        json.dump(anns, f)
    cfg = Config(model=ModelConfig(num_joints=16, image_size=(64, 64),
                                   heatmap_size=(16, 16)))
    ds = MPIIDataset(cfg, str(tmp_path), "valid", is_train=False)
    preds = np.stack([np.asarray(r["joints"]) for r in ds.db])
    # corrupt ONLY pelvis+thorax: Mean must stay 1.0 (they're masked)
    preds2 = preds.copy()
    preds2[:, 6:8] += 1000.0
    assert ds.evaluate(preds2)["Mean"] == 1.0
    # corrupting a counted joint drops Mean
    preds3 = preds.copy()
    preds3[:, 0] += 1000.0
    assert ds.evaluate(preds3)["Mean"] < 1.0


# ---------------------------------------------------------------------------
# Round-3 whole-package review findings
# ---------------------------------------------------------------------------

def test_device_nms_tie_order_matches_host():
    """Equal scores: the host twins process argsort()[::-1] (stable sort
    -> HIGHEST index first on ties); the device greedy scan must keep the
    same candidate or the backends disagree on which pose survives."""
    from flowtrack_tpu.ops.nms import nms_boxes, nms_boxes_np

    # two identical boxes, identical scores -> exactly one survives
    boxes = np.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.asarray([0.7, 0.7], np.float32)
    keep_dev = np.asarray(nms_boxes(jnp.asarray(boxes),
                                    jnp.asarray(scores), 0.5))
    keep_host = np.zeros(2, bool)
    dets = np.concatenate([boxes, scores[:, None]], axis=1)
    keep_host[nms_boxes_np(dets, 0.5)] = True
    np.testing.assert_array_equal(keep_dev, keep_host)
    assert keep_dev.tolist() == [False, True]  # highest index on the tie


def test_blur_kernel_must_be_odd():
    """Even blur kernels would silently emit (H+1, W+1) heatmaps and skew
    the inverse-affine decode — rejected up front."""
    import pytest

    from flowtrack_tpu.ops.decode import blur_heatmaps

    hm = jnp.zeros((1, 8, 8, 2))
    with pytest.raises(ValueError):
        blur_heatmaps(hm, 4)
    out = blur_heatmaps(hm, 3)
    assert out.shape == (1, 8, 8, 2)


def test_warp_affine_uint8_matches_float():
    """Integer images blend in float and round back (cv2 semantics);
    integer-cast fractional weights would floor to nearest-neighbor."""
    from flowtrack_tpu.ops.affine import warp_affine

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    # pure half-pixel shift: every output is an average of two taps
    trans = np.asarray([[1.0, 0.0, 0.5], [0.0, 1.0, 0.0]], np.float32)
    out_u8 = np.asarray(warp_affine(jnp.asarray(img), trans, (16, 16)))
    out_f = np.asarray(warp_affine(jnp.asarray(img, jnp.float32), trans,
                                   (16, 16)))
    assert out_u8.dtype == np.uint8
    np.testing.assert_array_equal(out_u8, np.rint(out_f).astype(np.uint8))
    # must actually blend: a checkerboard half-shift is nowhere equal to
    # either source tap unless the two taps coincide
    interior = out_f[:, 1:-1]
    assert not np.allclose(interior, np.floor(interior))


def test_fliplr_joints_zeroes_invisible_1d_vis():
    """joints * joints_vis (reference) must zero invisible joints for the
    1-D vis layout the dataset actually passes, not only the 2-D one."""
    from flowtrack_tpu.ops.affine import fliplr_joints

    joints = np.asarray([[10.0, 20.0], [30.0, 40.0]])
    vis = np.asarray([1, 0])
    out, out_vis = fliplr_joints(joints, vis, width=100,
                                 flip_pairs=[(0, 1)])
    # after the (0,1) swap, slot 0 holds the invisible joint -> zeroed
    np.testing.assert_array_equal(out_vis, [0, 1])
    np.testing.assert_array_equal(out[0], [0.0, 0.0])
    np.testing.assert_array_equal(out[1], [100 - 10 - 1, 20.0])


def test_eval_length_mismatches_raise():
    """Silently-truncating zips over ragged eval inputs would inflate
    MOTA/mAP/EPE; both evaluators reject them instead."""
    import pytest

    from flowtrack_tpu.eval.flow_eval import evaluate_flow_pairs
    from flowtrack_tpu.eval.posetrack_eval import (evaluate_posetrack,
                                                   evaluate_posetrack_mot)

    fl = np.zeros((4, 4, 2), np.float32)
    with pytest.raises(ValueError):
        evaluate_flow_pairs([fl, fl], [fl])

    pose = {"keypoints": np.zeros((17, 3)), "track_id": 0, "score": 1.0,
            "head_size": 10.0}
    gt_seqs = [[[pose], [pose]]]       # 1 sequence x 2 frames
    pred_seqs = [[[pose]]]             # 1 frame -> must raise, not truncate
    for fn in (evaluate_posetrack, evaluate_posetrack_mot):
        with pytest.raises(ValueError):
            fn(gt_seqs, pred_seqs)
        with pytest.raises(ValueError):
            fn(gt_seqs, [])


def test_flo_io_little_endian():
    """.flo files are little-endian by spec — the header must be written
    with explicit byte order so the IO pair is host-endianness-proof."""
    import io
    import struct

    from flowtrack_tpu.eval.flow_eval import FLO_MAGIC, write_flo, read_flo

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.flo")
        write_flo(p, np.ones((2, 3, 2), np.float32))
        raw = open(p, "rb").read()
        assert struct.unpack("<f", raw[:4])[0] == FLO_MAGIC
        assert struct.unpack("<ii", raw[4:12]) == (3, 2)
        np.testing.assert_array_equal(read_flo(p), np.ones((2, 3, 2)))
