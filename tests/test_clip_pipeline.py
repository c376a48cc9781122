"""Whole-clip tracker: ID-chain correctness with stub models.

Stub pose net: a fixed star of 17 gaussian peaks around the crop center ->
decoded joints = box center + fixed offsets (exercises the real crop geometry,
decode and rescoring). Stub flow net: the true constant motion. Person boxes
translate with that motion; the scan must keep IDs stable and mint new IDs
for appearing persons.
"""

from dataclasses import replace

import numpy as np
import pytest
import jax.numpy as jnp

from flowtrack_tpu.config import Config, ModelConfig
from flowtrack_tpu.ops.heatmap import generate_target_np
from flowtrack_tpu.tracking.clip_pipeline import ClipTracker, pad_detections

K = 17
VEL = np.array([6.0, 3.0], np.float32)
IMG_HW = (64, 64)
HM_HW = (16, 16)
# fixed joint offsets in crop-fraction units (a spread "star" so OKS has a
# meaningful area normalizer). Spread 0.3 keeps the pose bbox close to the
# person box (pose-derived propagated boxes then stay NMS-comparable to
# detections, as with real poses — the 1.25 crop padding and 1.15 box
# expansion roughly cancel the bbox-of-joints shrinkage).
OFFS = np.stack([np.cos(np.linspace(0, 2 * np.pi, K, endpoint=False)),
                 np.sin(np.linspace(0, 2 * np.pi, K, endpoint=False))],
                axis=1) * 0.3 + 0.5  # in [0, 1] crop coords


class StubPose:
    """apply(vars, crops) -> heatmaps with peaks at OFFS (crop coords)."""

    def apply(self, variables, x, train=False):
        n = x.shape[0]
        joints = OFFS * np.array([IMG_HW[1], IMG_HW[0]])  # crop pixels
        hm, _ = generate_target_np(joints, np.ones(K), HM_HW, IMG_HW, 1.5)
        return jnp.broadcast_to(jnp.asarray(hm), (n, *hm.shape))


class StubFlow:
    """apply(vars, pairs) -> constant quarter-res flow = VEL / div_flow."""

    def __init__(self, div_flow=20.0):
        self.div = div_flow

    def apply(self, variables, x, train=False):
        f, h, w, _ = x.shape
        base = jnp.asarray(VEL / self.div, jnp.float32)
        return jnp.broadcast_to(base, (f, h // 4, w // 4, 2))


import functools


@functools.lru_cache(maxsize=None)
def default_tracker():
    """ONE ClipTracker (and so one jit cache) shared by every
    default-config test in the suite — the per-test recompiles were the
    bulk of this file's runtime. Stateless: safe to share."""
    return ClipTracker(make_cfg(), StubPose(), {}, StubFlow(), {})


def make_cfg():
    cfg = Config(model=ModelConfig(image_size=IMG_HW, heatmap_size=HM_HW,
                                   dtype="float32"))
    return replace(cfg, test=replace(cfg.test, flip_test=False),
                   track=replace(cfg.track, max_persons=4,
                                 pose_score_thre=0.1,
                                 track_oks_thre=0.3))


@pytest.mark.smoke
def test_clip_ids_stable_and_new_id_minted():
    cfg = make_cfg()
    tracker = default_tracker()

    f = 5
    frames = np.zeros((f, 128, 160, 3), np.float32)
    # person A moves with VEL from (40, 50); person B appears at frame 2
    boxes, scores = [], []
    for t in range(f):
        ax, ay = 40 + VEL[0] * t, 50 + VEL[1] * t
        bs = [[ax - 15, ay - 15, 30, 30]]
        sc = [0.9]
        if t >= 2:
            bx, by = 110 + VEL[0] * (t - 2), 60 + VEL[1] * (t - 2)
            bs.append([bx - 15, by - 15, 30, 30])
            sc.append(0.8)
        boxes.append(bs)
        scores.append(sc)
    db, dsc, dv = pad_detections(boxes, scores, cfg.track.max_persons)
    out = tracker.track_clip(frames, db, dsc, dv)

    ids = out["ids"]
    assert (ids[:, 0] == ids[0, 0]).all(), ids[:, 0]   # A keeps its id
    assert ids[2, 1] >= 0 and ids[2, 1] != ids[2, 0]   # B gets a new id
    assert (ids[2:, 1] == ids[2, 1]).all(), ids[:, 1]  # B keeps it
    assert (ids[:2, 1] == -1).all()                    # B absent early
    # decoded joints follow the boxes (crop geometry + decode round trip)
    a_centers = out["joints"][:, 0].mean(axis=1)
    np.testing.assert_allclose(
        a_centers[:, 0], 40 + VEL[0] * np.arange(f), atol=3.0)
    np.testing.assert_allclose(
        a_centers[:, 1], 50 + VEL[1] * np.arange(f), atol=3.0)


def test_clip_id_swap_resistance():
    """Two nearby persons moving together: both propagations land exactly on
    their own candidates; greedy global-max must not cross-assign even
    though the neighbors are close enough to have nonzero OKS."""
    cfg = make_cfg()
    tracker = default_tracker()
    f = 4
    frames = np.zeros((f, 128, 160, 3), np.float32)
    boxes, scores = [], []
    for t in range(f):
        ax, ay = 40 + VEL[0] * t, 50 + VEL[1] * t
        bx, by = ax + 18, ay + 6  # B rides 18px to the right of A
        boxes.append([[ax - 15, ay - 15, 30, 30],
                      [bx - 15, by - 15, 30, 30]])
        scores.append([0.9, 0.85])
    db, dsc, dv = pad_detections(boxes, scores, cfg.track.max_persons)
    out = tracker.track_clip(frames, db, dsc, dv)
    ids = out["ids"]
    assert (ids[:, 0] == ids[0, 0]).all(), ids
    assert (ids[:, 1] == ids[0, 1]).all(), ids
    assert ids[0, 0] != ids[0, 1]


def test_sharded_clips_match_sequential():
    """8 clips sharded over the 8-device mesh == per-clip loop."""
    from flowtrack_tpu.parallel import batch_sharding, make_mesh

    cfg = make_cfg()
    tracker = default_tracker()
    mesh = make_mesh()
    assert mesh.size == 8

    c, f = 8, 3
    frames = np.zeros((c, f, 64, 96, 3), np.float32)
    boxes = np.zeros((c, f, cfg.track.max_persons, 4), np.float32)
    scores = np.zeros((c, f, cfg.track.max_persons), np.float32)
    valid = np.zeros((c, f, cfg.track.max_persons), bool)
    for i in range(c):
        for t in range(f):
            ax = 20 + 2 * i + VEL[0] * t
            ay = 25 + VEL[1] * t
            boxes[i, t, 0] = [ax - 10, ay - 10, 20, 20]
            scores[i, t, 0] = 0.9
            valid[i, t, 0] = True

    out = tracker.track_clips(frames, boxes, scores, valid,
                              sharding=batch_sharding(mesh))
    assert out["ids"].shape == (c, f, tracker.num_slots)
    for i in range(c):
        want = tracker.track_clip(frames[i], boxes[i], scores[i], valid[i])
        np.testing.assert_array_equal(out["ids"][i], want["ids"])
        # joints contractual only where valid (invalid recovery slots hold
        # unspecified scatter contents — see the frame-sharded test)
        v = want["valid"]
        np.testing.assert_allclose(out["joints"][i][v], want["joints"][v],
                                   atol=1e-4)


def test_frame_sharded_clip_matches_unsharded():
    """ONE clip split across the 8-device mesh on the FRAME axis (the
    sequence-dimension scaling analog, SURVEY.md section 6.7) must
    reproduce the unsharded result — including a non-divisible frame
    count, which is padded with invalid frames and sliced back."""
    from flowtrack_tpu.parallel import batch_sharding, make_mesh

    cfg = make_cfg()
    tracker = default_tracker()
    mesh = make_mesh()

    for f in (8, 6):  # divisible and ragged
        frames = np.zeros((f, 64, 96, 3), np.float32)
        boxes, scores = [], []
        for t in range(f):
            ax, ay = 20 + VEL[0] * t, 25 + VEL[1] * t
            bx, by = 60 + VEL[0] * t, 30 + VEL[1] * t
            boxes.append([[ax - 10, ay - 10, 20, 20],
                          [bx - 10, by - 10, 20, 20]])
            scores.append([0.9, 0.85])
        db, dsc, dv = pad_detections(boxes, scores, cfg.track.max_persons)
        want = tracker.track_clip(frames, db, dsc, dv)
        got = tracker.track_clip(frames, db, dsc, dv,
                                 frame_sharding=batch_sharding(mesh))
        assert got["ids"].shape == want["ids"].shape == (
            f, tracker.num_slots)
        np.testing.assert_array_equal(got["ids"], want["ids"])
        np.testing.assert_array_equal(got["valid"], want["valid"])
        # joints are only contractual where valid (invalid recovery slots
        # hold unspecified scatter contents, and the budgeted top_k can
        # tie-break differently under sharding); partitioned matmuls also
        # reassociate (~1e-6 relative wiggle)
        v = want["valid"]
        np.testing.assert_allclose(got["joints"][v], want["joints"][v],
                                   rtol=1e-5, atol=1e-4)


def test_frame_sharded_clip_recovery_matches_unsharded():
    """Detector-miss recovery under frame sharding: the PAD frames of a
    ragged clip must not emit phantom recovery candidates (they carry real
    track scores and would compete in the clip-wide budgeted top_k,
    evicting genuine recoveries on real frames — round-2 review finding).
    A dropped detection must be recovered with the same id sharded and
    unsharded."""
    from flowtrack_tpu.parallel import batch_sharding, make_mesh

    cfg = make_cfg()
    # a TIGHT recovery budget (1 crop per 8 frames) so a single phantom
    # candidate would evict the genuine one
    cfg = replace(cfg, track=replace(cfg.track, max_recovered=1,
                                     recover_budget=0.125))
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
    mesh = make_mesh()

    f, drop_frame = 6, 3  # ragged vs 8 devices -> 2 pad frames
    frames, boxes, scores, _ = _dropout_scenario(f, drop_frame)
    db, dsc, dv = pad_detections(boxes, scores, cfg.track.max_persons)
    want = tracker.track_clip(frames, db, dsc, dv)
    got = tracker.track_clip(frames, db, dsc, dv,
                             frame_sharding=batch_sharding(mesh))
    np.testing.assert_array_equal(got["ids"], want["ids"])
    np.testing.assert_array_equal(got["valid"], want["valid"])
    # the dropped person IS recovered (same id through the gap) on both
    ids_before = want["ids"][drop_frame - 1]
    ids_at = want["ids"][drop_frame]
    b_id = ids_before[1]
    assert b_id >= 0 and b_id in ids_at, (ids_before, ids_at)


def _dropout_scenario(f=6, drop_frame=3):
    """Persons A and B move with VEL; B's detection is dropped at
    ``drop_frame``. Returns (frames, boxes, scores, gt_centers)."""
    frames = np.zeros((f, 128, 160, 3), np.float32)
    boxes, scores, gt_centers = [], [], []
    for t in range(f):
        ax, ay = 40 + VEL[0] * t, 50 + VEL[1] * t
        bx, by = 90 + VEL[0] * t, 60 + VEL[1] * t
        gt_centers.append([(ax, ay), (bx, by)])
        bs, sc = [[ax - 15, ay - 15, 30, 30]], [0.9]
        if t != drop_frame:
            bs.append([bx - 15, by - 15, 30, 30])
            sc.append(0.8)
        boxes.append(bs)
        scores.append(sc)
    return frames, boxes, scores, gt_centers


def test_clip_detector_miss_recovered():
    """A detection dropped mid-clip is recovered by the budgeted second
    pose pass on the flow-propagated box, keeping the SAME track id
    (VERDICT round-1 item 1; SURVEY.md section 4.4)."""
    cfg = make_cfg()
    assert cfg.track.clip_recover
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
    frames, boxes, scores, gt_centers = _dropout_scenario()
    db, dsc, dv = pad_detections(boxes, scores, cfg.track.max_persons)
    out = tracker.track_clip(frames, db, dsc, dv)
    ids, valid = out["ids"], out["valid"]
    p = cfg.track.max_persons
    assert ids.shape[1] == p + cfg.track.max_recovered

    b_id = ids[0, 1]
    assert (ids[:3, 1] == b_id).all(), ids[:, 1]
    # frame 3: no det slot for B, exactly one recovery slot carries B's id
    assert not valid[3, 1]
    rec_ids = ids[3, p:]
    assert (rec_ids == b_id).sum() == 1, (ids[3], valid[3])
    slot = p + int(np.argmax(rec_ids == b_id))
    assert valid[3, slot]
    c = out["joints"][3, slot].mean(axis=0)
    np.testing.assert_allclose(c, gt_centers[3][1], atol=4.0)
    # B redetected afterwards: id continues in the det slot
    assert (ids[4:, 1] == b_id).all(), ids[:, 1]
    # A never disturbed; no recovery slots ever used for A's frames
    assert (ids[:, 0] == ids[0, 0]).all()
    assert not valid[np.arange(6) != 3][:, p:].any()


def test_clip_recovery_mota_parity_with_streaming():
    """On the synthetic dropout scenario the clip path must score the same
    perfect MOTA/zero switches as the streaming FlowTracker (VERDICT
    round-1 'done' criterion)."""
    from flowtrack_tpu.eval.posetrack_eval import evaluate_posetrack
    from flowtrack_tpu.pipeline import PosePredictor
    from flowtrack_tpu.tracking import FlowTracker

    cfg = make_cfg()
    frames, boxes, scores, _ = _dropout_scenario()
    f = len(frames)

    # GT = the no-dropout clip run's detector-slot poses
    full_boxes = [list(b) for b in boxes]
    full_scores = [list(s) for s in scores]
    full_boxes[3].append([90 + VEL[0] * 3 - 15, 60 + VEL[1] * 3 - 15,
                          30, 30])
    full_scores[3].append(0.8)
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
    db, dsc, dv = pad_detections(full_boxes, full_scores,
                                 cfg.track.max_persons)
    ref = tracker.track_clip(frames, db, dsc, dv)
    gt_seq = []
    for t in range(f):
        gt_seq.append([
            {"track_id": pid,
             "keypoints": np.concatenate(
                 [ref["joints"][t, pid], np.ones((K, 1))], axis=1),
             "head_size": 20.0}
            for pid in range(2)])

    def to_pred_seq(out):
        seq = []
        for t in range(f):
            items = []
            for s in range(out["valid"].shape[1]):
                if not out["valid"][t, s]:
                    continue
                items.append({
                    "track_id": int(out["ids"][t, s]),
                    "keypoints": np.concatenate(
                        [out["joints"][t, s],
                         out["maxvals"][t, s][:, None]], axis=1),
                    "score": float(out["scores"][t, s])})
            seq.append(items)
        return seq

    # clip path on the dropout scenario
    db, dsc, dv = pad_detections(boxes, scores, cfg.track.max_persons)
    clip_out = tracker.track_clip(frames, db, dsc, dv)
    clip_eval = evaluate_posetrack([gt_seq], [to_pred_seq(clip_out)])

    # streaming path, same models
    def flow_fn(prev_image, image):
        h, w = image.shape[:2]
        fl = np.zeros((h, w, 2), np.float32)
        fl[..., 0], fl[..., 1] = VEL[0], VEL[1]
        return fl

    stream = FlowTracker(cfg=cfg, pose_fn=PosePredictor(
        cfg, {}, model=StubPose()), flow_fn=flow_fn)
    per_frame = stream.track_sequence(
        frames, [(np.asarray(b, np.float32), np.asarray(s, np.float32))
                 for b, s in zip(boxes, scores)])
    stream_seq = []
    for tracks in per_frame:
        stream_seq.append([
            {"track_id": tr.track_id,
             "keypoints": np.concatenate(
                 [tr.joints, tr.maxvals[:, None]], axis=1),
             "score": tr.score}
            for tr in tracks])
    stream_eval = evaluate_posetrack([gt_seq], [stream_seq])

    assert np.isclose(stream_eval["MOTA"], 1.0), stream_eval
    assert np.isclose(clip_eval["MOTA"], stream_eval["MOTA"]), (
        clip_eval, stream_eval)
    assert clip_eval["num_switches"] == stream_eval["num_switches"] == 0


def test_clip_keyframe_interval_tracks_through_gaps():
    """track.keyframe_interval=2: detections are consumed on even frames
    only; persons persist through odd frames via the recovery slots with
    STABLE ids (the paper's keyframe-detection variant)."""
    cfg = make_cfg()
    cfg = replace(cfg, track=replace(cfg.track, keyframe_interval=2,
                                     max_miss_age=2))
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
    frames, boxes, scores, gt_centers = _dropout_scenario(f=6,
                                                          drop_frame=-1)
    db, dsc, dv = pad_detections(boxes, scores, cfg.track.max_persons)
    out = tracker.track_clip(frames, db, dsc, dv)
    ids, valid = out["ids"], out["valid"]
    p = cfg.track.max_persons
    a_id, b_id = ids[0, 0], ids[0, 1]
    assert a_id >= 0 and b_id >= 0 and a_id != b_id
    for t in range(6):
        live = set(ids[t][valid[t]].tolist())
        assert {a_id, b_id} <= live, (t, ids[t], valid[t])
        if t % 2 == 1:  # non-keyframe: only recovery slots are valid
            assert not valid[t, :p].any(), (t, valid[t])
            # recovered poses still track the true motion
            for pid, slot in [(0, int(np.argmax(
                    (ids[t] == a_id) & valid[t]))),
                    (1, int(np.argmax((ids[t] == b_id) & valid[t])))]:
                c = out["joints"][t, slot].mean(axis=0)
                np.testing.assert_allclose(c, gt_centers[t][pid], atol=4.0)


def test_clip_recovery_age_cap_kills_vanished_tracks():
    """A person that disappears for good is propagated at most
    track.max_miss_age frames, then the track dies — no zombie recovery
    chains (the stub pose scores high anywhere, so only the age cap can
    stop the chain)."""
    cfg = make_cfg()
    cfg = replace(cfg, track=replace(cfg.track, max_miss_age=2))
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
    f = 7
    frames = np.zeros((f, 128, 160, 3), np.float32)
    boxes, scores = [], []
    for t in range(f):
        ax, ay = 40 + VEL[0] * t, 50 + VEL[1] * t
        bs, sc = [[ax - 15, ay - 15, 30, 30]], [0.9]
        if t < 2:  # B exists only in frames 0-1
            bx, by = 90 + VEL[0] * t, 60 + VEL[1] * t
            bs.append([bx - 15, by - 15, 30, 30])
            sc.append(0.8)
        boxes.append(bs)
        scores.append(sc)
    db, dsc, dv = pad_detections(boxes, scores, cfg.track.max_persons)
    out = tracker.track_clip(frames, db, dsc, dv)
    ids, valid = out["ids"], out["valid"]
    b_id = ids[0, 1]
    # recovery bridges frames 2..3 (ages 1..2), then the cap kills it
    for t in (2, 3):
        assert (ids[t][valid[t]] == b_id).sum() == 1, (t, ids[t], valid[t])
    for t in (4, 5, 6):
        assert b_id not in set(ids[t][valid[t]].tolist()), (t, ids[t])
    # A unaffected throughout
    assert (ids[:, 0] == ids[0, 0]).all()


def test_clip_recover_off_keeps_det_slots_only():
    cfg = make_cfg()
    cfg = replace(cfg, track=replace(cfg.track, clip_recover=False))
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
    frames, boxes, scores, _ = _dropout_scenario(f=4)
    db, dsc, dv = pad_detections(boxes, scores, cfg.track.max_persons)
    out = tracker.track_clip(frames, db, dsc, dv)
    assert out["ids"].shape == (4, cfg.track.max_persons)


def test_pad_detections():
    boxes = [[[0, 0, 10, 10]], [[0, 0, 10, 10], [5, 5, 10, 10],
                                [1, 1, 2, 2]]]
    scores = [[0.9], [0.5, 0.8, 0.7]]
    b, s, v = pad_detections(boxes, scores, 2)
    assert b.shape == (2, 2, 4)
    assert v[0].tolist() == [True, False]
    # frame 1 keeps the 2 highest-scoring of 3
    np.testing.assert_allclose(sorted(s[1].tolist()), [0.7, 0.8], rtol=1e-6)


def test_2d_mesh_clip_by_frame_sharding():
    """Clips x frames over a 2-D (2, 4) device mesh: the batched-clips
    program accepts a NamedSharding that splits the CLIP dim across one
    axis and each clip's FRAME dim across the other — the combined
    serving layout (clip-parallel throughput + frame-parallel latency).
    Results must match the per-clip unsharded loop."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg = make_cfg()
    tracker = default_tracker()
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("clip", "frame"))
    sharding = NamedSharding(mesh, P("clip", "frame"))

    c, f = 2, 4
    frames = np.zeros((c, f, 64, 96, 3), np.float32)
    boxes = np.zeros((c, f, cfg.track.max_persons, 4), np.float32)
    scores = np.zeros((c, f, cfg.track.max_persons), np.float32)
    valid = np.zeros((c, f, cfg.track.max_persons), bool)
    for i in range(c):
        for t in range(f):
            ax = 18 + 3 * i + VEL[0] * t
            ay = 24 + 2 * i + VEL[1] * t
            boxes[i, t, 0] = [ax - 10, ay - 10, 20, 20]
            scores[i, t, 0] = 0.9
            valid[i, t, 0] = True

    out = tracker.track_clips(frames, boxes, scores, valid,
                              sharding=sharding)
    for i in range(c):
        want = tracker.track_clip(frames[i], boxes[i], scores[i], valid[i])
        np.testing.assert_array_equal(out["ids"][i], want["ids"])
        np.testing.assert_array_equal(out["valid"][i], want["valid"])
        v = want["valid"]
        np.testing.assert_allclose(out["joints"][i][v], want["joints"][v],
                                   rtol=1e-5, atol=1e-4)


def test_uint8_frames_match_float32():
    """Video frames can stay uint8 end-to-end (4x less H2D than fp32 —
    the crop/flow paths cast on DEVICE); results must equal fp32 input."""
    cfg = make_cfg()
    tracker = default_tracker()
    f = 4
    rng = np.random.default_rng(0)
    frames8 = rng.integers(0, 256, (f, 64, 96, 3), dtype=np.uint8)
    boxes, scores = [], []
    for t in range(f):
        ax, ay = 20 + VEL[0] * t, 25 + VEL[1] * t
        boxes.append([[ax - 10, ay - 10, 20, 20]])
        scores.append([0.9])
    db, dsc, dv = pad_detections(boxes, scores, cfg.track.max_persons)
    got = tracker.track_clip(frames8, db, dsc, dv)
    want = tracker.track_clip(frames8.astype(np.float32), db, dsc, dv)
    np.testing.assert_array_equal(got["ids"], want["ids"])
    v = want["valid"]
    np.testing.assert_allclose(got["joints"][v], want["joints"][v],
                               rtol=1e-6, atol=1e-5)


def test_keyframe_mode_frame_sharded_matches_unsharded():
    """Keyframe-detection mode (detector every k frames; persons survive
    the gaps via recovery slots) under FRAME sharding — the configuration
    most dependent on the padded-frame recovery gating: every non-keyframe
    person rides the same budgeted top_k the phantoms would poison."""
    from flowtrack_tpu.parallel import batch_sharding, make_mesh

    cfg = make_cfg()
    cfg = replace(cfg, track=replace(cfg.track, keyframe_interval=2,
                                     max_miss_age=2))
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
    mesh = make_mesh()

    f = 6  # ragged vs 8 devices
    frames = np.zeros((f, 128, 160, 3), np.float32)
    boxes, scores = [], []
    for t in range(f):
        ax, ay = 40 + VEL[0] * t, 50 + VEL[1] * t
        boxes.append([[ax - 15, ay - 15, 30, 30]])
        scores.append([0.9])
    db, dsc, dv = pad_detections(boxes, scores, cfg.track.max_persons)
    want = tracker.track_clip(frames, db, dsc, dv)
    got = tracker.track_clip(frames, db, dsc, dv,
                             frame_sharding=batch_sharding(mesh))
    np.testing.assert_array_equal(got["ids"], want["ids"])
    np.testing.assert_array_equal(got["valid"], want["valid"])
    # the person is tracked through every frame (recovery covers the
    # non-keyframe gaps) with one stable id on both paths
    tracked = [sorted(set(want["ids"][t][want["valid"][t]]))
               for t in range(f)]
    assert all(len(t) == 1 for t in tracked), tracked
    assert len({t[0] for t in tracked}) == 1, tracked


def test_seeded_clip_frame_sharded_matches_unsharded():
    """Cross-clip seed carry under FRAME sharding: (a) a ragged (padded)
    clip must extract seed_out from the last REAL frame, not the invalid
    padded tail; (b) a seeded clip sharded over the mesh must reproduce the
    unsharded seeded run's global ids exactly."""
    import jax

    from flowtrack_tpu.parallel import batch_sharding, make_mesh

    cfg = make_cfg()
    tracker = default_tracker()
    mesh = make_mesh()

    # clip 1: ragged (6 frames vs 8 devices); one moving person
    f1 = 6
    frames1 = np.zeros((f1, 128, 160, 3), np.float32)
    boxes, scores = [], []
    for t in range(f1):
        ax, ay = 40 + VEL[0] * t, 50 + VEL[1] * t
        boxes.append([[ax - 15, ay - 15, 30, 30]])
        scores.append([0.9])
    db, dsc, dv = pad_detections(boxes, scores, cfg.track.max_persons)
    want1 = tracker.run_prepared(tracker.prepare(frames1, db, dsc, dv))
    seed_plain = want1[5]
    got1 = tracker.track_clip(frames1, db, dsc, dv,
                              frame_sharding=batch_sharding(mesh))
    # (b) for the ragged clip itself: sharded outputs == unsharded
    want1_host = tracker.to_host(want1)
    np.testing.assert_array_equal(got1["ids"], want1_host["ids"])
    np.testing.assert_array_equal(got1["valid"], want1_host["valid"])
    v1 = want1_host["valid"]  # invalid-slot joints are non-contractual
    np.testing.assert_allclose(got1["joints"][v1],
                               want1_host["joints"][v1],
                               rtol=1e-5, atol=1e-4)

    # the sharded+padded run's seed must equal the unsharded run's seed
    from flowtrack_tpu.parallel import pad_to_multiple
    fr_p, _ = pad_to_multiple(frames1, mesh.size)
    db_p, _ = pad_to_multiple(db, mesh.size)
    dsc_p, _ = pad_to_multiple(dsc, mesh.size)
    dv_p, _ = pad_to_multiple(dv, mesh.size)
    fv_p, _ = pad_to_multiple(np.ones((f1,), bool), mesh.size)
    args_p = tracker.prepare(fr_p, db_p, dsc_p, dv_p, fv_p)
    args_p = tuple(jax.device_put(a, batch_sharding(mesh)) for a in args_p)
    out_p = tracker.run_prepared(args_p, budget_frames=f1)
    seed_sharded = out_p[5]
    for a, b in zip(seed_plain, seed_sharded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)

    # clip 2 (overlapping frame): person undetected at the overlap frame;
    # the seeded run must keep its id — sharded == unsharded
    f2 = 6
    start = f1 - 1
    frames2 = np.zeros((f2, 128, 160, 3), np.float32)
    boxes2, scores2 = [], []
    for tt in range(f2):
        t = start + tt
        ax, ay = 40 + VEL[0] * t, 50 + VEL[1] * t
        if tt == 0:          # occluded exactly at the boundary frame
            boxes2.append(np.zeros((0, 4), np.float32))
            scores2.append(np.zeros((0,), np.float32))
        else:
            boxes2.append([[ax - 15, ay - 15, 30, 30]])
            scores2.append([0.9])
    db2, dsc2, dv2 = pad_detections(boxes2, scores2, cfg.track.max_persons)
    want2 = tracker.track_clip(frames2, db2, dsc2, dv2, seed=seed_plain)
    got2 = tracker.track_clip(frames2, db2, dsc2, dv2, seed=seed_plain,
                              frame_sharding=batch_sharding(mesh))
    np.testing.assert_array_equal(got2["ids"], want2["ids"])
    np.testing.assert_array_equal(got2["valid"], want2["valid"])
    # the person keeps ONE id from clip 1 through the occluded boundary
    id1 = want1[3]  # ids array of clip 1
    last_id = int(np.asarray(id1)[-1][np.asarray(want1[4])[-1]][0])
    for t in range(f2):
        live = want2["ids"][t][want2["valid"][t]]
        assert last_id in live.tolist(), (t, want2["ids"], want2["valid"])


def test_prepare_keyframe_phase_follows_global_frame_index():
    """Keyframe masking must follow the VIDEO's cadence across clip
    boundaries: a clip starting at global frame 3 with keyframe_interval=2
    consumes detections at global frames 4, 6, ... — not at its local
    frame 0 (review fix; track_video_clips passes frame_offset=span
    start)."""
    cfg = make_cfg()
    cfg = replace(cfg, track=replace(cfg.track, keyframe_interval=2))
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
    f = 4
    frames = np.zeros((f, 64, 96, 3), np.float32)
    db = np.tile(np.array([10, 10, 20, 20], np.float32), (f, 2, 1))
    dsc = np.full((f, 2), 0.9, np.float32)
    dv = np.ones((f, 2), bool)

    args0 = tracker.prepare(frames, db, dsc, dv, frame_offset=0)
    args3 = tracker.prepare(frames, db, dsc, dv, frame_offset=3)
    # arg index 4 is det_valid: offset 0 -> keyframes at local 0, 2;
    # offset 3 -> global frames 3..6, keyframes at global 4, 6 = local 1, 3
    np.testing.assert_array_equal(
        np.asarray(args0[4])[:, 0], [True, False, True, False])
    np.testing.assert_array_equal(
        np.asarray(args3[4])[:, 0], [False, True, False, True])


def test_track_clip_public_chaining_api():
    """track_clip(return_seed=True) -> (dict, seed) chains clips through
    the PUBLIC per-clip API (review fix): same boundary-occlusion scenario
    as utils/video, ids stay global without touching prepare/run_prepared."""
    tracker = default_tracker()
    cfg = make_cfg()
    p = cfg.track.max_persons

    def clip_inputs(t0, f, occluded_at=None):
        boxes, scores = [], []
        for tt in range(f):
            t = t0 + tt
            ax, ay = 40 + VEL[0] * t, 50 + VEL[1] * t
            bs, sc = [], []
            if t != occluded_at:
                bs, sc = [[ax - 15, ay - 15, 30, 30]], [0.9]
            boxes.append(bs)
            scores.append(sc)
        frames = np.zeros((f, 128, 160, 3), np.float32)
        return (frames, *pad_detections(boxes, scores, p))

    out1, seed = tracker.track_clip(*clip_inputs(0, 4),
                                    return_seed=True)
    # clip 2 overlaps at global frame 3, where the person is OCCLUDED
    out2 = tracker.track_clip(*clip_inputs(3, 4, occluded_at=3),
                              seed=seed, frame_offset=3)
    id1 = out1["ids"][0][out1["valid"][0]][0]
    for t in range(4):
        live = out2["ids"][t][out2["valid"][t]].tolist()
        assert live == [id1], (t, out2["ids"], out2["valid"])


def test_padded_clip_matches_unpadded_under_budget_pressure():
    """A ragged clip padded to a larger static shape (fixed-program path,
    utils/video tail padding) must reproduce the unpadded trace EXACTLY —
    including when recovery candidates exceed the real-frame budget: the
    padded program's larger static top-k is rank-masked back to
    ceil(real * recover_budget) (review finding: sizing the budget from
    the padded count granted extra recovery crops)."""
    cfg = replace(make_cfg(),
                  track=replace(make_cfg().track, max_persons=4,
                                pose_score_thre=0.1, track_oks_thre=0.3,
                                max_recovered=2, recover_budget=0.5,
                                max_miss_age=3))
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})

    f, fpad = 5, 8
    frames = np.zeros((f, 128, 160, 3), np.float32)
    boxes, scores = [], []
    for t in range(f):
        a = (30 + VEL[0] * t, 40 + VEL[1] * t)
        b = (90 + VEL[0] * t, 70 + VEL[1] * t)
        if t in (2, 3):     # BOTH persons dropped -> 4 recovery candidates
            boxes.append(np.zeros((0, 4), np.float32))
            scores.append(np.zeros((0,), np.float32))
        else:
            boxes.append([[a[0] - 12, a[1] - 12, 24, 24],
                          [b[0] - 12, b[1] - 12, 24, 24]])
            scores.append([0.9, 0.85])
    db, dsc, dv = pad_detections(boxes, scores, cfg.track.max_persons)

    want_dev = tracker.run_prepared(tracker.prepare(frames, db, dsc, dv))
    want = tracker.to_host(want_dev)
    # budget pressure is real: 4 candidates, budget ceil(5*0.5)=3
    n_recovered = int(want["valid"][:, cfg.track.max_persons:].sum())
    assert n_recovered == 3, n_recovered

    pad = fpad - f
    frames_p = np.concatenate([frames, np.repeat(frames[-1:], pad, 0)])
    db_p = np.concatenate([db, np.zeros((pad,) + db.shape[1:], db.dtype)])
    dsc_p = np.concatenate([dsc, np.zeros((pad,) + dsc.shape[1:])])
    dv_p = np.concatenate([dv, np.zeros((pad,) + dv.shape[1:], bool)])
    fv = np.arange(fpad) < f
    out_p = tracker.run_prepared(
        tracker.prepare(frames_p, db_p, dsc_p, dv_p, fv),
        budget_frames=f)
    got = tracker.to_host(out_p)
    for key in ("joints", "maxvals", "scores", "ids", "valid"):
        np.testing.assert_array_equal(got[key][:f], want[key], err_msg=key)
    # seed (the next clip's carry) extracted from the last REAL frame —
    # must equal the unpadded run's seed (reuse want_dev, same program)
    for a, b in zip(want_dev[5], out_p[5]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class ContentPose:
    """Content-dependent stub: the heatmap IS the (resized) crop intensity,
    so different crops decode different joints and any chunk-order or
    flip-merge bookkeeping error changes the output."""

    def apply(self, variables, x, train=False):
        import jax

        n = x.shape[0]
        g = jnp.mean(x, axis=-1, keepdims=True)
        hm = jax.image.resize(g, (n, HM_HW[0], HM_HW[1], 1), "bilinear")
        return jnp.broadcast_to(hm, (n, HM_HW[0], HM_HW[1], K))


@pytest.mark.slow
def test_pose_chunk_matches_unchunked():
    """track.pose_chunk runs the backbone in lax.map chunks (memory cap for
    multi-stream serving); per-crop results must equal the one-call path —
    including the flip-test double batch, which lives inside each chunk."""
    base = make_cfg()
    cfg = replace(base, test=replace(base.test, flip_test=True))
    f = 6
    rng = np.random.default_rng(3)
    frames = rng.uniform(0, 255, (f, 128, 160, 3)).astype(np.float32)
    boxes, scores = [], []
    for t in range(f):
        ax, ay = 40 + VEL[0] * t, 50 + VEL[1] * t
        boxes.append([[ax - 15, ay - 15, 30, 30],
                      [ax + 30, ay - 10, 30, 30]])
        scores.append([0.9, 0.8])
    db, dsc, dv = pad_detections(boxes, scores, cfg.track.max_persons)

    ref_tracker = ClipTracker(cfg, ContentPose(), {}, StubFlow(), {})
    ref = ref_tracker.track_clip(frames, db, dsc, dv)
    # f * max_persons = 24 crops: chunk=8 divides exactly; chunk=7 leaves a
    # 3-crop tail call; flow_chunk=2 leaves a 1-pair tail on the 5 pairs
    for pose_chunk in (8, 7):
        chunked_cfg = replace(cfg, track=replace(
            cfg.track, pose_chunk=pose_chunk, flow_chunk=2))
        chk_tracker = ClipTracker(chunked_cfg, ContentPose(), {},
                                  StubFlow(), {})
        chk = chk_tracker.track_clip(frames, db, dsc, dv)

        for key in ("joints", "maxvals", "scores", "ids", "valid"):
            np.testing.assert_allclose(np.asarray(ref[key]),
                                       np.asarray(chk[key]),
                                       rtol=0, atol=1e-6,
                                       err_msg=f"{key} chunk={pose_chunk}")


@pytest.mark.slow
def test_pose_chunk_composes_with_sharding():
    """pose_chunk under BOTH production sharded layouts: a frame-sharded
    single clip and clip-sharded batched streams must reproduce the
    unsharded unchunked ids (the serving combination the memory cap
    exists for)."""
    from flowtrack_tpu.parallel import batch_sharding, make_mesh

    base = make_cfg()
    cfg = replace(base, track=replace(base.track, pose_chunk=8))
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
    ref_tracker = default_tracker()
    mesh = make_mesh()

    f = 8  # f * max_persons = 32 crops -> four 8-crop chunks
    frames = np.zeros((f, 64, 96, 3), np.float32)
    boxes, scores = [], []
    for t in range(f):
        ax, ay = 20 + VEL[0] * t, 25 + VEL[1] * t
        boxes.append([[ax - 10, ay - 10, 20, 20],
                      [ax + 28, ay - 6, 20, 20]])
        scores.append([0.9, 0.85])
    db, dsc, dv = pad_detections(boxes, scores, cfg.track.max_persons)
    want = ref_tracker.track_clip(frames, db, dsc, dv)

    got_f = tracker.track_clip(frames, db, dsc, dv,
                               frame_sharding=batch_sharding(mesh))
    np.testing.assert_array_equal(got_f["ids"], want["ids"])
    np.testing.assert_array_equal(got_f["valid"], want["valid"])

    c = 4  # identical streams, clip-sharded over a 4-device submesh
    got_c = tracker.track_clips(
        np.broadcast_to(frames, (c,) + frames.shape).copy(),
        np.broadcast_to(db, (c,) + db.shape).copy(),
        np.broadcast_to(dsc, (c,) + dsc.shape).copy(),
        np.broadcast_to(dv, (c,) + dv.shape).copy(),
        sharding=batch_sharding(make_mesh(4)))
    for i in range(c):
        np.testing.assert_array_equal(got_c["ids"][i], want["ids"])
        np.testing.assert_array_equal(got_c["valid"][i], want["valid"])
