"""Flow eval (.flo IO, EPE stats) + video clip utilities (spans, stitching,
full clip-stitched tracking with stub models)."""

import numpy as np
import pytest

from flowtrack_tpu.eval.flow_eval import (
    evaluate_flow_pairs,
    flow_error_stats,
    read_flo,
    write_flo,
)
from flowtrack_tpu.utils.video import (
    clip_spans,
    iter_video_frames,
    stitch_ids,
    track_video_clips,
)


class TestFloIO:
    def test_roundtrip(self, tmp_path, rng):
        flow = rng.normal(0, 5, (17, 23, 2)).astype(np.float32)
        p = str(tmp_path / "a.flo")
        write_flo(p, flow)
        back = read_flo(p)
        np.testing.assert_array_equal(back, flow)

    def test_epe_stats(self):
        # distinct error magnitudes per quarter (0, 0.5, 2, 5 px) so the
        # three fraction stats take DIFFERENT values and a swapped key or
        # inverted comparison cannot pass (review finding: the old
        # two-magnitude scenario made every fraction 0.5)
        gt = np.zeros((8, 8, 2), np.float32)
        gt[..., 0] = 10.0
        pred = gt.copy()
        pred[0:2] += [0.5, 0.0]   # epe 0.5  (<=1, <=3, not fl)
        pred[2:4] += [2.0, 0.0]   # epe 2    (>1, <=3, not fl)
        pred[4:6] += [3.0, 4.0]   # epe 5    (>3 and >5% of 10 -> fl)
        s = flow_error_stats(pred, gt)
        assert np.isclose(s["epe"], (0.5 + 2.0 + 5.0 + 0.0) / 4)
        assert np.isclose(s["epe_1px"], 0.5)   # quarters 0 and 0.5
        assert np.isclose(s["epe_3px"], 0.75)  # all but the 5px quarter
        assert np.isclose(s["fl"], 0.25)       # only the 5px quarter

    def test_dataset_average(self, rng):
        gt = [rng.normal(size=(8, 8, 2)).astype(np.float32)
              for _ in range(3)]
        stats = evaluate_flow_pairs(gt, gt)
        assert stats["epe"] == 0.0 and stats["n_frames"] == 3

    def test_valid_mask(self):
        gt = np.zeros((4, 4, 2), np.float32)
        pred = gt.copy()
        pred[0, 0] = [100, 0]
        mask = np.ones((4, 4), bool)
        mask[0, 0] = False
        assert flow_error_stats(pred, gt, mask)["epe"] == 0.0


class TestVideoUtils:
    def test_iter_directory(self, tmp_path, rng):
        from tests.fixtures import save_image

        for i in range(3):
            save_image(str(tmp_path / f"{i:03d}.png"),
                       rng.integers(0, 255, (8, 8, 3)).astype(np.uint8))
        frames = list(iter_video_frames(str(tmp_path)))
        assert len(frames) == 3 and frames[0].shape == (8, 8, 3)

    def test_clip_spans_overlap(self):
        spans = clip_spans(10, 4)
        assert [list(s) for s in spans] == [
            [0, 1, 2, 3], [3, 4, 5, 6], [6, 7, 8, 9]]
        assert [list(s) for s in clip_spans(3, 4)] == [[0, 1, 2]]
        # remainder case: the tail span must still OVERLAP the previous
        # clip by one frame (the stitching contract), not start fresh
        spans2 = clip_spans(11, 4)
        assert [list(s) for s in spans2] == [
            [0, 1, 2, 3], [3, 4, 5, 6], [6, 7, 8, 9], [9, 10]]

    def test_clip_spans_rejects_degenerate_clip_len(self):
        # clip_len 1 with the 1-frame overlap never advances (would loop
        # forever pre-guard — review finding); single-frame inputs are
        # still fine
        import pytest

        with pytest.raises(ValueError):
            clip_spans(3, 1)
        with pytest.raises(ValueError):
            clip_spans(2, 0)
        assert [list(s) for s in clip_spans(1, 1)] == [[0]]

    def test_lazy_frame_sequence(self, tmp_path, rng):
        """LazyFrameSequence loads only the indexed window (O(clip_len)
        host memory for the clip-engine CLI), matching eager loads."""
        from tests.fixtures import save_image
        from flowtrack_tpu.utils.video import LazyFrameSequence

        paths = []
        for i in range(4):
            p = str(tmp_path / f"{i:03d}.png")
            save_image(p, rng.integers(0, 255, (8, 8, 3)).astype(np.uint8))
            paths.append(p)
        calls = []

        def loader(p):
            calls.append(p)
            from flowtrack_tpu.data.pose_dataset import load_image

            return load_image(p)

        seq = LazyFrameSequence(paths, loader=loader)
        assert len(seq) == 4
        win = seq[[1, 2]]
        assert win.shape == (2, 8, 8, 3)
        assert calls == [paths[1], paths[2]]  # nothing else was loaded
        np.testing.assert_array_equal(seq[1], win[0])

    def test_sequential_video_frames(self):
        """SequentialVideoFrames decodes forward once per pass with an
        O(cache) trailing window: the track_video_clips access pattern
        (advancing windows, 1-frame overlap) costs one decode per frame,
        a backward jump restarts the pass, and unusable frame-count
        metadata raises for the CLI's eager fallback."""
        from flowtrack_tpu.utils.video import SequentialVideoFrames

        decode_log = []

        class FakeCap:
            """cv2.VideoCapture stand-in: frame i = constant BGR value i."""

            def __init__(self, path, n=10):
                self._i, self._n = 0, n

            def isOpened(self):
                return True

            def get(self, prop):
                return self._n

            def read(self):
                if self._i >= self._n:
                    return False, None
                decode_log.append(self._i)
                frame = np.full((4, 4, 3), self._i, np.uint8)
                frame[..., 0] = 200 + self._i  # B channel marks BGR order
                self._i += 1
                return True, frame

            def release(self):
                pass

        seq = SequentialVideoFrames("fake.mp4", cache_frames=2,
                                    capture_factory=FakeCap)
        assert len(seq) == 10
        w0 = seq[list(range(0, 4))]          # clip 0
        w1 = seq[list(range(3, 7))]          # clip 1 (re-reads frame 3)
        assert w0.shape == (4, 4, 4, 3)
        # BGR -> RGB conversion applied: the 200+i marker written to the
        # BGR blue channel lands at RGB index 2; red (index 0) carries 1
        assert int(w0[1, 0, 0, 2]) == 201 and int(w0[1, 0, 0, 0]) == 1
        np.testing.assert_array_equal(w1[0], w0[3])
        assert decode_log == list(range(7))  # each frame decoded ONCE
        # render pass jumps back to 0 -> exactly one restarted pass
        decode_log.clear()
        for t in range(10):
            assert int(seq[t][0, 0, 1]) == t
        assert decode_log == list(range(10))

        class NoCount(FakeCap):
            def get(self, prop):
                return 0

        with pytest.raises(ValueError):
            SequentialVideoFrames("fake.mp4", capture_factory=NoCount)

        class OverCount(FakeCap):
            """Header claims 10 frames, only 6 decode (approximate
            container metadata): the tail freezes the last real frame
            instead of crashing a long tracking run."""

            def read(self):
                if self._i >= 6:
                    return False, None
                return super().read()

        decode_log.clear()
        seq = SequentialVideoFrames("fake.mp4", cache_frames=2,
                                    capture_factory=OverCount)
        assert len(seq) == 10
        w = seq[list(range(4, 10))]
        np.testing.assert_array_equal(w[2], w[1])  # frames 6..9 == frame 5
        np.testing.assert_array_equal(w[5], w[1])
        assert int(w[1][0, 0, 1]) == 5
        assert decode_log == list(range(6))

    def test_tail_clip_padded_to_fixed_shape(self):
        """Ragged tail clips are padded to clip_len so every clip of a
        video reuses ONE compiled program (a distinct tail length would
        recompile — minutes on TPU), with the person tracked identically
        through the padded tail."""
        from tests.test_clip_pipeline import VEL, default_tracker

        tracker = default_tracker()
        n, clip_len = 9, 4           # spans 4/4/3 -> tail padded to 4
        frames = np.zeros((n, 128, 160, 3), np.float32)
        det_boxes, det_scores = [], []
        for t in range(n):
            ax, ay = 30 + VEL[0] * t, 40 + VEL[1] * t
            det_boxes.append([[ax - 12, ay - 12, 24, 24]])
            det_scores.append([0.9])

        shapes = []
        orig = tracker.run_prepared

        def spy(args, **kw):
            shapes.append(tuple(np.asarray(args[0]).shape))
            return orig(args, **kw)

        tracker.run_prepared = spy
        try:
            results = track_video_clips(tracker, frames, det_boxes,
                                        det_scores, clip_len=clip_len)
        finally:
            tracker.run_prepared = orig
        assert len(shapes) == 3 and len(set(shapes)) == 1, shapes
        assert shapes[0][0] == clip_len, shapes
        assert all(len(results[t]) == 1 for t in range(n)), results
        ids = {p["track_id"] for t in range(n) for p in results[t]}
        assert len(ids) == 1, ids

    def test_stitch_ids(self, rng):
        poses = rng.uniform(0, 100, (3, 17, 2))
        prev_ids = [5, 9, 11]
        nxt_ids = [0, 1, 2]
        # permuted order, identical poses
        mapping = stitch_ids(poses, prev_ids, poses[[2, 0, 1]], nxt_ids)
        assert mapping == {0: 11, 1: 5, 2: 9}

    def test_boundary_occlusion_keeps_global_id(self):
        """VERDICT round-2 item 1: a person undetected EXACTLY at the
        clip-overlap frame must keep ONE global id through
        track_video_clips (the seeded cross-clip carry recovers it through
        the flow-propagated recovery slots), agreeing with the streaming
        FlowTracker on the same scenario."""
        from tests.test_clip_pipeline import (StubFlow, StubPose, VEL,
                                              default_tracker, make_cfg)
        from flowtrack_tpu.pipeline import PosePredictor
        from flowtrack_tpu.tracking import FlowTracker

        cfg = make_cfg()
        n, clip_len = 9, 4          # spans [0..3], [3..6], [6..8]
        boundary = 3                # the shared overlap frame
        frames = np.zeros((n, 128, 160, 3), np.float32)

        def centers(t):
            ax, ay = 30 + VEL[0] * t, 40 + VEL[1] * t
            return (ax, ay), (ax + 40, ay + 10)

        det_boxes, det_scores = [], []
        for t in range(n):
            (ax, ay), (bx, by) = centers(t)
            bs, sc = [[ax - 12, ay - 12, 24, 24]], [0.9]
            if t != boundary:       # B occluded at the boundary frame only
                bs.append([bx - 12, by - 12, 24, 24])
                sc.append(0.85)
            det_boxes.append(bs)
            det_scores.append(sc)

        tracker = default_tracker()
        results = track_video_clips(tracker, frames, det_boxes, det_scores,
                                    clip_len=clip_len)

        def ids_by_person(res_t, t):
            (_, _), (bx, by) = centers(t)
            (ax, ay), _ = centers(t)
            got = {}
            for p in res_t:
                c = np.asarray(p["joints"]).mean(axis=0)
                da = np.hypot(c[0] - ax, c[1] - ay)
                db_ = np.hypot(c[0] - bx, c[1] - by)
                got["A" if da < db_ else "B"] = p["track_id"]
            return got

        a_ids, b_ids, b_frames = set(), set(), []
        for t in range(n):
            got = ids_by_person(results[t], t)
            assert "A" in got, (t, results[t])
            a_ids.add(got["A"])
            if "B" in got:
                b_ids.add(got["B"])
                b_frames.append(t)
        assert len(a_ids) == 1, a_ids
        # the single assertion this test exists for: one global id for B
        # across the occlusion-at-boundary, not a fresh id in clip 2
        assert len(b_ids) == 1, b_ids
        assert a_ids != b_ids
        # B present on EVERY frame: detected frames via the det slots and
        # the boundary frame itself via a seeded recovery slot
        assert set(b_frames) == set(range(n)), b_frames

        # streaming FlowTracker agreement on the same scenario
        def flow_fn(prev_image, image):
            h, w = image.shape[:2]
            fl = np.zeros((h, w, 2), np.float32)
            fl[..., 0], fl[..., 1] = VEL[0], VEL[1]
            return fl

        stream = FlowTracker(cfg=cfg, pose_fn=PosePredictor(
            cfg, {}, model=StubPose()), flow_fn=flow_fn)
        per_frame = stream.track_sequence(
            frames, [(np.asarray(b, np.float32), np.asarray(s, np.float32))
                     for b, s in zip(det_boxes, det_scores)])
        sa, sb = set(), set()
        s_b_frames = []
        for t, tracks in enumerate(per_frame):
            got = ids_by_person(
                [{"joints": tr.joints, "track_id": tr.track_id}
                 for tr in tracks], t)
            sa.add(got["A"])
            if "B" in got:
                sb.add(got["B"])
                s_b_frames.append(t)
        assert len(sa) == 1 and len(sb) == 1
        # both paths agree: same frames covered for B, same id-stability
        assert set(s_b_frames) == set(b_frames)

    def test_track_video_clips_stitched(self, rng):
        """Same moving scenario as test_clip_pipeline, longer than one clip:
        stitched ids must stay globally stable across clip boundaries."""
        from tests.test_clip_pipeline import VEL, default_tracker

        tracker = default_tracker()
        n = 9
        frames = np.zeros((n, 128, 160, 3), np.float32)
        det_boxes, det_scores = [], []
        for t in range(n):
            ax, ay = 30 + VEL[0] * t, 40 + VEL[1] * t
            bx, by = ax + 20, ay + 8
            det_boxes.append([[ax - 12, ay - 12, 24, 24],
                              [bx - 12, by - 12, 24, 24]])
            det_scores.append([0.9, 0.85])
        results = track_video_clips(tracker, frames, det_boxes, det_scores,
                                    clip_len=4)
        assert all(len(r) == 2 for r in results)
        ids_a = {min(p["track_id"] for p in r) for r in results}
        ids_b = {max(p["track_id"] for p in r) for r in results}
        assert len(ids_a) == 1 and len(ids_b) == 1, (ids_a, ids_b)
        assert ids_a != ids_b
