"""End-to-end FlowTracker integration (SURVEY.md section 4.4): a synthetic
moving sequence with an oracle pose_fn, checking ID stability, detector-miss
recovery through flow propagation, and MOTA via the PoseTrack evaluator."""

import numpy as np
import pytest

from flowtrack_tpu.config import Config
from flowtrack_tpu.eval.posetrack_eval import evaluate_posetrack
from flowtrack_tpu.tracking import FlowTracker

K = 17
VEL = np.array([4.0, 2.0])
N_FRAMES = 6
H, W = 240, 320


def make_sequence(rng):
    """Two persons moving with the SAME velocity (so a constant flow field
    is the true flow). Returns per-frame GT joints (2, K, 2)."""
    shapes = [rng.uniform(-25, 25, (K, 2)) for _ in range(2)]
    starts = [np.array([80.0, 120.0]), np.array([220.0, 120.0])]
    gt = []
    for t in range(N_FRAMES):
        gt.append(np.stack([
            shapes[p] + starts[p] + VEL * t for p in range(2)]))
    return gt


def boxes_of(joints, pad=8.0):
    out = []
    for j in joints:
        x0, y0 = j.min(0) - pad
        x1, y1 = j.max(0) + pad
        out.append([x0, y0, x1 - x0, y1 - y0])
    return np.asarray(out, np.float32)


def stamped_frames(n=N_FRAMES):
    """Blank frames whose [0,0,0] pixel stores the frame index — the
    oracle pose_fn keys its GT lookup to the frame itself, so a skipped
    pose call (e.g. zero candidate boxes on a frame) cannot desync it
    the way a call counter would (review finding)."""
    frames = [np.zeros((H, W, 3), np.uint8) for _ in range(n)]
    for t, f in enumerate(frames):
        f[0, 0, 0] = t
    return frames


def make_oracle_pose_fn(gt):
    """Nearest-GT oracle pose_fn (shared by the three e2e scenarios):
    returns, for each candidate box, the GT pose of the stamped frame
    whose center is nearest the box center."""

    def pose_fn(image, boxes, scores):
        t = int(np.asarray(image)[0, 0, 0])
        joints_gt = gt[t]
        centers_gt = joints_gt.mean(1)
        joints, maxvals, resc = [], [], []
        for b, s in zip(boxes, scores):
            c = np.array([b[0] + b[2] / 2, b[1] + b[3] / 2])
            i = int(np.argmin(np.linalg.norm(centers_gt - c, axis=1)))
            joints.append(joints_gt[i])
            maxvals.append(np.full(K, 0.95))
            resc.append(float(s) * 0.95)
        return (np.asarray(joints, np.float32),
                np.asarray(maxvals, np.float32),
                np.asarray(resc, np.float32))

    return pose_fn


@pytest.fixture
def tracked(rng):
    gt = make_sequence(rng)
    pose_fn = make_oracle_pose_fn(gt)

    def flow_fn(prev_image, image):
        f = np.zeros((H, W, 2), np.float32)
        f[..., 0] = VEL[0]
        f[..., 1] = VEL[1]
        return f

    tracker = FlowTracker(cfg=Config(), pose_fn=pose_fn, flow_fn=flow_fn)
    frames = stamped_frames()
    detections = []
    for t in range(N_FRAMES):
        b = boxes_of(gt[t])
        s = np.array([0.95, 0.9], np.float32)
        if t == 3:  # detector misses person 1 at frame 3
            b, s = b[:1], s[:1]
        detections.append((b, s))
    per_frame = tracker.track_sequence(frames, detections)
    return gt, per_frame


def test_two_stable_ids(tracked):
    gt, per_frame = tracked
    ids_per_person = {0: set(), 1: set()}
    for t, tracks in enumerate(per_frame):
        assert len(tracks) == 2, f"frame {t}: {len(tracks)} tracks"
        for tr in tracks:
            c = tr.joints.mean(0)
            p = int(np.argmin(np.linalg.norm(gt[t].mean(1) - c, axis=1)))
            ids_per_person[p].add(tr.track_id)
    # each person keeps exactly one id for the whole sequence
    assert len(ids_per_person[0]) == 1, ids_per_person
    assert len(ids_per_person[1]) == 1, ids_per_person
    assert ids_per_person[0] != ids_per_person[1]


def test_miss_recovered_by_propagation(tracked):
    gt, per_frame = tracked
    # at frame 3 only one detection existed; propagation must still produce
    # 2 tracks (checked above) and the recovered pose must sit near GT
    tracks3 = per_frame[3]
    centers = sorted(t.joints.mean(0)[0] for t in tracks3)
    want = sorted(g.mean(0)[0] for g in gt[3])
    np.testing.assert_allclose(centers, want, atol=5.0)


def test_keyframe_interval_streaming(rng):
    """track.keyframe_interval=2: the streaming tracker consumes detections
    on even frames only and keeps both ids alive through the gaps on
    flow-propagated boxes."""
    from dataclasses import replace

    gt = make_sequence(rng)
    pose_fn = make_oracle_pose_fn(gt)

    def flow_fn(prev_image, image):
        f = np.zeros((H, W, 2), np.float32)
        f[..., 0], f[..., 1] = VEL[0], VEL[1]
        return f

    cfg = Config()
    cfg = replace(cfg, track=replace(cfg.track, keyframe_interval=2))
    tracker = FlowTracker(cfg=cfg, pose_fn=pose_fn, flow_fn=flow_fn)
    frames = stamped_frames()
    detections = [(boxes_of(gt[t]), np.array([0.95, 0.9], np.float32))
                  for t in range(N_FRAMES)]
    per_frame = tracker.track_sequence(frames, detections)
    ids_per_person = {0: set(), 1: set()}
    for t, tracks in enumerate(per_frame):
        assert len(tracks) == 2, (t, len(tracks))
        for tr in tracks:
            p = int(np.argmin(np.linalg.norm(
                gt[t].mean(1) - tr.joints.mean(0), axis=1)))
            ids_per_person[p].add(tr.track_id)
    assert len(ids_per_person[0]) == 1 and len(ids_per_person[1]) == 1
    assert ids_per_person[0] != ids_per_person[1]


def test_mota_one(tracked):
    gt, per_frame = tracked
    gt_seq, pred_seq = [], []
    for t in range(N_FRAMES):
        gt_seq.append([
            {"track_id": p,
             "keypoints": np.concatenate(
                 [gt[t][p], np.ones((K, 1))], axis=1),
             "head_size": 20.0}
            for p in range(2)])
        pred_seq.append([
            {"track_id": tr.track_id,
             "keypoints": np.concatenate(
                 [tr.joints, tr.maxvals[:, None]], axis=1),
             "score": tr.score}
            for tr in per_frame[t]])
    out = evaluate_posetrack([gt_seq], [pred_seq])
    assert out["num_switches"] == 0
    assert np.isclose(out["MOTA"], 1.0), out
    assert np.isclose(out["mAP"], 1.0), out


def test_flow_free_ablation_keeps_ids(rng):
    """flow_fn=None (the paper's non-flow baseline): greedy OKS matching
    runs on UNPROPAGATED poses, so slow-moving persons keep their ids —
    previously the matching was skipped entirely and every frame minted
    fresh ids (review finding)."""
    gt = make_sequence(rng)
    tracker = FlowTracker(cfg=Config(), pose_fn=make_oracle_pose_fn(gt),
                          flow_fn=None)
    frames = stamped_frames()
    detections = [(boxes_of(gt[t]), np.array([0.95, 0.9], np.float32))
                  for t in range(N_FRAMES)]
    per_frame = tracker.track_sequence(frames, detections)
    ids0 = sorted(t.track_id for t in per_frame[0])
    for t, tracks in enumerate(per_frame):
        assert sorted(tr.track_id for tr in tracks) == ids0, (t, tracks)
