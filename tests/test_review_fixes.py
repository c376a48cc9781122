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
