"""Dataset + loader tests on synthetic fixtures, including the minimum
end-to-end eval slice (SURVEY.md section 8 stage 3): detection boxes ->
crops -> (GT-derived) heatmaps -> decode -> rescore -> OKS-NMS -> COCO AP.
Using GT-synthesized heatmaps isolates the pipeline from model weights: a
lossless pipeline must score AP ~= 1.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from flowtrack_tpu.config import Config, ModelConfig
from flowtrack_tpu.data import BatchLoader, COCODataset, MPIIDataset, \
    PoseTrackDataset
from flowtrack_tpu.ops.decode import get_final_preds, rescore
from flowtrack_tpu.ops.heatmap import generate_target_np
from tests.fixtures import make_coco_fixture, make_posetrack_fixture


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    return make_coco_fixture(tmp_path_factory.mktemp("coco"))


@pytest.fixture(scope="module")
def posetrack_root(tmp_path_factory):
    return make_posetrack_fixture(tmp_path_factory.mktemp("pt"))


CFG = Config(model=ModelConfig(image_size=(256, 192), heatmap_size=(64, 48)))


class TestCOCODataset:
    @pytest.mark.smoke
    def test_gt_db_and_item_shapes(self, coco_root):
        root, _, _ = coco_root
        ds = COCODataset(CFG, root, "val2017", is_train=True)
        assert len(ds) == 8  # 4 images x 2 persons
        item = ds[0]
        assert item["input"].shape == (256, 192, 3)
        assert item["target"].shape == (64, 48, 17)
        assert item["target_weight"].shape == (17,)
        assert item["target"].max() > 0.99  # at least one clean gaussian

    def test_missing_bbox_file_raises(self, coco_root):
        root, _, _ = coco_root
        with pytest.raises(ValueError, match="bbox_file"):
            COCODataset(CFG, root, "val2017", is_train=False)

    def test_detection_db(self, coco_root):
        root, _, det = coco_root
        ds = COCODataset(CFG, root, "val2017", is_train=False, bbox_file=det)
        assert len(ds) == 8
        assert all(r["score"] <= 1.0 for r in ds.db)

    def test_end_to_end_eval_slice_ap1(self, coco_root):
        """Crop geometry + decode + rescore + NMS + AP evaluator round-trip."""
        root, _, det = coco_root
        cfg = CFG
        ds = COCODataset(cfg, root, "val2017", is_train=False, bbox_file=det)
        gt = COCODataset(cfg, root, "val2017", is_train=True)
        # map image_id -> GT joints (one person per det by proximity)
        hm_hw = (64, 48)

        all_preds, all_maxvals, all_scores, all_imgids = [], [], [], []
        for rec in ds.db:
            # nearest GT person in the same image
            cands = [g for g in gt.db if g["image_id"] == rec["image_id"]]
            g = min(cands, key=lambda g: np.linalg.norm(
                np.asarray(g["center"]) - np.asarray(rec["center"])))
            # synthesize the heatmap the ideal model would produce for this
            # crop: transform GT joints into crop space, draw gaussians
            from flowtrack_tpu.ops.affine import (affine_transform,
                                                  get_affine_transform)
            trans = get_affine_transform(rec["center"], rec["scale"], 0,
                                         np.array([192, 256]))
            joints_crop = affine_transform(g["joints"], trans)
            hm, _ = generate_target_np(joints_crop, g["joints_vis"],
                                       hm_hw, (256, 192), sigma=2.0)
            preds, maxvals = get_final_preds(
                jnp.asarray(hm[None]),
                jnp.asarray(np.asarray(rec["center"], np.float32)[None]),
                jnp.asarray(np.asarray(rec["scale"], np.float32)[None]))
            scores = rescore(jnp.asarray([rec["score"]], jnp.float32),
                             maxvals, cfg.test.in_vis_thre)
            all_preds.append(np.asarray(preds)[0])
            all_maxvals.append(np.asarray(maxvals)[0])
            all_scores.append(float(scores[0]))
            all_imgids.append(rec["image_id"])

        stats, results = ds.evaluate(
            np.stack(all_preds), np.stack(all_maxvals),
            np.asarray(all_scores), np.asarray(all_imgids))
        assert stats["AP"] > 0.95, stats
        assert len(results) > 0

    def test_train_aug_determinism(self, coco_root):
        root, _, _ = coco_root
        a = COCODataset(CFG, root, "val2017", is_train=True, seed=7)[0]
        b = COCODataset(CFG, root, "val2017", is_train=True, seed=7)[0]
        np.testing.assert_array_equal(a["input"], b["input"])


class TestBatchLoader:
    def test_batches_and_padding(self, coco_root):
        root, _, _ = coco_root
        from dataclasses import replace
        cfg3 = replace(CFG, test=replace(CFG.test, use_gt_bbox=True))
        ds = COCODataset(cfg3, root, "val2017", is_train=False)
        loader = BatchLoader(ds, batch_size=3, pad_to_batch=True)
        batches = list(loader)
        assert len(batches) == 3  # 8 items / 3
        assert all(b["input"].shape[0] == 3 for b in batches)
        assert batches[-1]["n_valid"] == 2

    def test_drop_last(self, coco_root):
        root, _, _ = coco_root
        from dataclasses import replace
        cfg3 = replace(CFG, test=replace(CFG.test, use_gt_bbox=True))
        ds = COCODataset(cfg3, root, "val2017", is_train=False)
        loader = BatchLoader(ds, batch_size=3, drop_last=True)
        assert len(list(loader)) == 2

    def test_getitem_error_propagates(self):
        """A failing __getitem__ must raise in the consumer, not silently
        truncate the epoch (round-1 advisor finding)."""

        class Boom:
            def __len__(self):
                return 6

            def __getitem__(self, i):
                if i >= 3:
                    raise ValueError("corrupt item")
                return {"input": np.zeros((4, 4, 3), np.float32)}

        loader = BatchLoader(Boom(), batch_size=3, num_workers=2)
        it = iter(loader)
        assert next(it)["input"].shape[0] == 3  # first batch is fine
        with pytest.raises(ValueError, match="corrupt item"):
            list(it)


class TestPoseTrack:
    def test_sequences_and_annotations(self, posetrack_root):
        root, _ = posetrack_root
        from dataclasses import replace
        cfg = replace(CFG, test=replace(CFG.test, use_gt_bbox=True))
        ds = PoseTrackDataset(cfg, root, "val", is_train=False)
        seqs = ds.sequences()
        assert len(seqs) == 2
        for vid, frames in seqs.items():
            assert len(frames) == 4
            anns = ds.frame_annotations(frames[0])
            assert len(anns) == 2
            assert anns[0]["keypoints"].shape == (17, 3)
            assert anns[0]["head_size"] > 0
        item = ds[0]
        assert item["input"].shape == (256, 192, 3)


class TestMPII:
    def test_mpii_db_and_pckh(self, tmp_path):
        import json
        import os

        from tests.fixtures import draw_person, save_image, synth_pose
        rng = np.random.default_rng(0)
        os.makedirs(tmp_path / "annot", exist_ok=True)
        os.makedirs(tmp_path / "images", exist_ok=True)
        anns = []
        for i in range(3):
            joints = synth_pose(rng, 150, 120, size=80)[:16]
            img = np.zeros((240, 320, 3), np.uint8)
            draw_person(img, joints)
            save_image(str(tmp_path / "images" / f"{i}.png"), img)
            anns.append({
                "image": f"{i}.png",
                "center": [150.0, 120.0], "scale": 0.8,
                "joints": joints.tolist(),
                "joints_vis": [1] * 16,
            })
        with open(tmp_path / "annot" / "valid.json", "w") as f:
            json.dump(anns, f)

        from dataclasses import replace
        cfg = replace(CFG, model=replace(CFG.model, num_joints=16))
        ds = MPIIDataset(cfg, str(tmp_path), "valid", is_train=False)
        assert len(ds) == 3
        item = ds[0]
        assert item["target"].shape == (64, 48, 16)

        # perfect predictions -> PCKh 1.0
        preds = np.stack([np.asarray(r["joints"]) for r in ds.db])
        stats = ds.evaluate(preds)
        assert stats["Mean"] == 1.0
        # global shift by > 0.5 head size -> 0
        h0 = ds.db[0]["head_size"]
        stats2 = ds.evaluate(preds + h0 * 2)
        assert stats2["Mean"] == 0.0


def test_soft_nms_eval_path(coco_root):
    """cfg.test.soft_nms=True routes through soft_oks_nms_np and still
    produces a full AP table."""
    from dataclasses import replace

    root, _, det = coco_root
    cfg = replace(CFG, test=replace(CFG.test, use_gt_bbox=True,
                                    soft_nms=True))
    ds = COCODataset(cfg, root, "val2017", is_train=False)
    gt = COCODataset(cfg, root, "val2017", is_train=True)
    n = len(ds)
    preds = np.stack([np.asarray(g["joints"]) for g in gt.db])
    maxvals = np.ones((n, 17), np.float32)
    scores = np.full((n,), 0.9, np.float32)
    ids = np.asarray([r["image_id"] for r in ds.db])
    stats, results = ds.evaluate(preds, maxvals, scores, ids)
    assert stats["AP"] > 0.95
    assert len(results) > 0


class TestMPIIEvalSlice:
    def test_mpii_decode_round_trip_pckh(self, tmp_path, rng):
        """MPII e2e eval slice (the COCO AP~1 slice's 16-joint twin):
        fixture -> dataset eval items -> GT-planted heatmaps on the crop ->
        on-device decode (argmax + quarter px + inverse affine) ->
        PCKh@0.5 == 1.0."""
        import json
        import os

        import jax.numpy as jnp

        from flowtrack_tpu.ops.affine import (affine_transform,
                                              get_affine_transform)
        from flowtrack_tpu.ops.decode import get_final_preds
        from flowtrack_tpu.ops.heatmap import generate_target_np
        from tests.fixtures import draw_person, save_image, synth_pose

        os.makedirs(tmp_path / "annot", exist_ok=True)
        os.makedirs(tmp_path / "images", exist_ok=True)
        anns = []
        for i in range(3):
            joints = synth_pose(rng, 150, 120, size=70)[:16]
            img = np.zeros((240, 320, 3), np.uint8)
            draw_person(img, joints)
            save_image(str(tmp_path / "images" / f"{i}.png"), img)
            anns.append({"image": f"{i}.png", "center": [150.0, 120.0],
                         "scale": 0.8, "joints": joints.tolist(),
                         "joints_vis": [1] * 16})
        with open(tmp_path / "annot" / "valid.json", "w") as f:
            json.dump(anns, f)

        cfg = Config(model=ModelConfig(image_size=(256, 256),
                                       heatmap_size=(64, 64),
                                       num_joints=16, sigma=2.0))
        ds = MPIIDataset(cfg, str(tmp_path), "valid", is_train=False)
        hms, centers, scales = [], [], []
        for rec in ds.db:
            trans = get_affine_transform(rec["center"], rec["scale"], 0.0,
                                         (256, 256))
            jc = affine_transform(np.asarray(rec["joints"]), trans)
            hm, _ = generate_target_np(jc, rec["joints_vis"], (64, 64),
                                       (256, 256), cfg.model.sigma)
            hms.append(hm)
            centers.append(rec["center"])
            scales.append(rec["scale"])
        preds, maxvals = get_final_preds(
            jnp.asarray(np.stack(hms)),
            jnp.asarray(np.stack(centers), jnp.float32),
            jnp.asarray(np.stack(scales), jnp.float32))
        stats = ds.evaluate(np.asarray(preds))
        assert stats["Mean"] == 1.0, stats
