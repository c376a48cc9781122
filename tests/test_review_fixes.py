"""Regression tests for the round-1 code-review findings."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from flowtrack_tpu.models.flownet import postprocess_flow


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    from tests.fixtures import make_coco_fixture

    return make_coco_fixture(tmp_path_factory.mktemp("coco_rf"))


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


# Round-3 pass-3 review findings (data / utils / config / parallel / tools)
# ---------------------------------------------------------------------------

def test_pad_to_multiple_honors_axis():
    from flowtrack_tpu.parallel import pad_to_multiple

    x = np.arange(15).reshape(3, 5)
    padded, n_valid = pad_to_multiple(x, 8, axis=1)
    assert padded.shape == (3, 8)
    assert n_valid == 5
    padded0, n0 = pad_to_multiple(x, 8, axis=0)
    assert padded0.shape == (8, 5) and n0 == 3


def test_batch_sharding_uses_mesh_axis_name():
    """cfg.mesh.data_axis must be live: a mesh built with a custom axis
    name shards on that axis without repeating the name at every call."""
    import jax
    from jax.sharding import PartitionSpec as P

    from flowtrack_tpu.parallel import batch_sharding, make_mesh

    mesh = make_mesh(min(2, len(jax.devices())), "batch")
    sh = batch_sharding(mesh)
    assert sh.spec == P("batch")


def test_coco_gt_db_survives_missing_num_keypoints(tmp_path, coco_root):
    """PoseTrack-style jsons omit num_keypoints; the GT db must fall back
    to counting labeled joints instead of silently loading 0 annotations."""
    import json
    import shutil

    from flowtrack_tpu.config import get_config
    from flowtrack_tpu.data import COCODataset

    root, ann_file, _ = coco_root
    new_root = tmp_path / "nk"
    (new_root / "annotations").mkdir(parents=True)
    shutil.copytree(os.path.join(root, "images"), new_root / "images")
    with open(ann_file) as f:
        db = json.load(f)
    for ann in db["annotations"]:
        del ann["num_keypoints"]
    with open(new_root / "annotations" / "person_keypoints_val2017.json",
              "w") as f:
        json.dump(db, f)

    from dataclasses import replace
    cfg = get_config("coco_res50_256x192")
    cfg = replace(cfg, test=replace(cfg.test, use_gt_bbox=True))
    ref = COCODataset(cfg, root, "val2017", is_train=False)
    ds = COCODataset(cfg, str(new_root), "val2017", is_train=False)
    assert len(ds) == len(ref) > 0


def test_train_aug_reproducible_across_worker_counts(coco_root):
    """Augmentation draws derive from (seed, epoch, idx), not a shared
    Generator mutated by racing worker threads — so the same seed yields
    the same batches at any worker count."""
    from flowtrack_tpu.config import get_config
    from flowtrack_tpu.data import BatchLoader, COCODataset

    root, _, _ = coco_root
    cfg = get_config("coco_res50_256x192")

    def run(workers):
        ds = COCODataset(cfg, root, "val2017", is_train=True, seed=11)
        loader = BatchLoader(ds, batch_size=4, shuffle=True, seed=5,
                             num_workers=workers)
        return [list(loader) for _ in range(2)]  # two epochs

    a, b = run(1), run(8)
    for ep_a, ep_b in zip(a, b):
        for ba, bb in zip(ep_a, ep_b):
            np.testing.assert_array_equal(ba["input"], bb["input"])
    # epochs must differ (set_epoch advances the aug stream)
    assert not np.array_equal(a[0][0]["input"], a[1][0]["input"])


def test_loader_abandoned_iteration_stops_producer(coco_root):
    """Breaking out of a loader epoch must terminate the producer thread
    (it would otherwise block forever on the bounded queue)."""
    import threading
    import time

    from flowtrack_tpu.config import get_config
    from flowtrack_tpu.data import BatchLoader, COCODataset

    root, _, _ = coco_root
    from dataclasses import replace
    cfg = get_config("coco_res50_256x192")
    cfg = replace(cfg, test=replace(cfg.test, use_gt_bbox=True))
    ds = COCODataset(cfg, root, "val2017", is_train=False)
    before = threading.active_count()
    for _ in range(3):
        it = iter(BatchLoader(ds, batch_size=1, prefetch_batches=1,
                              num_workers=2))
        next(it)
        it.close()  # abandons mid-epoch; generator finally must clean up
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_flow_to_color_clips_under_explicit_max_flow():
    """max_flow below the true magnitude must saturate to black, not wrap
    negative floats through the uint8 cast into garbage pixels."""
    from flowtrack_tpu.utils.vis import flow_to_color

    flow = np.array([[[30.0, 0.0]]], np.float32)  # |f| = 3 * max_flow
    out = flow_to_color(flow, max_flow=10.0)
    # angle pi -> wheel[54] = (255, 0, 43): green/blue channels would go
    # negative unclipped (1 - 3*(1 - c) < 0 for c < 2/3)
    assert out[0, 0, 0] == 255
    assert out[0, 0, 1] == 0 and out[0, 0, 2] == 0


def test_stage_timer_sync_blocks_on_outputs():
    import jax
    import jax.numpy as jnp

    from flowtrack_tpu.utils.profiling import StageTimer

    t = StageTimer(sync=True)
    with t.stage("pose") as out:
        out.append(jax.jit(lambda x: x * 2)(jnp.ones((8, 8))))
    with t.stage("flow"):
        jax.jit(lambda x: x + 1)(jnp.ones((8, 8)))
    s = t.summary()
    assert s["pose"]["count"] == 1 and s["flow"]["count"] == 1
    assert s["pose"]["total_s"] > 0


def test_frame_paths_accepts_ppm(tmp_path):
    from flowtrack_tpu.utils.video import IMG_EXTS, frame_paths

    assert ".ppm" in IMG_EXTS
    (tmp_path / "0001.ppm").write_bytes(b"P6 1 1 255 \x00\x00\x00")
    (tmp_path / "0002.png").write_bytes(b"x")
    (tmp_path / "notes.txt").write_bytes(b"x")
    names = [os.path.basename(p) for p in frame_paths(str(tmp_path))]
    assert names == ["0001.ppm", "0002.png"]


def test_blur_kernel_wired_into_tracker_paths(monkeypatch):
    """cfg.test.blur_kernel must reach get_final_preds in the tracker
    pipelines too (it was honored only in validate/test — a silent config
    no-op in PosePredictor and ClipTracker)."""
    from dataclasses import replace

    import flowtrack_tpu.pipeline as pl
    import flowtrack_tpu.tracking.clip_pipeline as cp
    from tests.test_clip_pipeline import StubFlow, StubPose, make_cfg
    from flowtrack_tpu.tracking.clip_pipeline import (ClipTracker,
                                                      pad_detections)

    base = make_cfg()
    cfg = replace(base, test=replace(base.test, blur_kernel=3))

    seen_cp, seen_pl = [], []
    orig_cp, orig_pl = cp.get_final_preds, pl.get_final_preds

    def spy_cp(*a, **k):
        seen_cp.append(k.get("blur_kernel", 0))
        return orig_cp(*a, **k)

    def spy_pl(*a, **k):
        seen_pl.append(k.get("blur_kernel", 0))
        return orig_pl(*a, **k)

    monkeypatch.setattr(cp, "get_final_preds", spy_cp)
    monkeypatch.setattr(pl, "get_final_preds", spy_pl)

    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
    frames = np.zeros((2, 64, 96, 3), np.float32)
    db, dsc, dv = pad_detections([[[10, 10, 20, 20]]] * 2, [[0.9]] * 2,
                                 cfg.track.max_persons)
    tracker.track_clip(frames, db, dsc, dv)
    assert seen_cp and all(b == 3 for b in seen_cp), seen_cp

    from flowtrack_tpu.pipeline import PosePredictor

    pred = PosePredictor(cfg, {}, model=StubPose())
    pred(frames[0], np.asarray([[10.0, 10.0, 20.0, 20.0]]),
         np.asarray([0.9]))
    assert seen_pl and all(b == 3 for b in seen_pl), seen_pl
