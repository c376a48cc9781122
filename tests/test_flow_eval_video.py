"""Flow eval (.flo IO, EPE stats) + video clip utilities (spans, stitching,
full clip-stitched tracking with stub models)."""

import numpy as np

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
        gt = np.zeros((10, 10, 2), np.float32)
        gt[..., 0] = 10.0
        pred = gt.copy()
        pred[:5] += [3.0, 4.0]  # epe 5 on half the pixels
        s = flow_error_stats(pred, gt)
        assert np.isclose(s["epe"], 2.5)
        assert np.isclose(s["epe_3px"], 0.5)
        assert np.isclose(s["fl"], 0.5)  # 5 > 3px and > 5% of 10

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
        spans2 = clip_spans(11, 4)
        assert [list(s)[-1] for s in spans2][-1] == 10

    def test_stitch_ids(self, rng):
        poses = rng.uniform(0, 100, (3, 17, 2))
        prev_ids = [5, 9, 11]
        nxt_ids = [0, 1, 2]
        # permuted order, identical poses
        mapping = stitch_ids(poses, prev_ids, poses[[2, 0, 1]], nxt_ids)
        assert mapping == {0: 11, 1: 5, 2: 9}

    def test_track_video_clips_stitched(self, rng):
        """Same moving scenario as test_clip_pipeline, longer than one clip:
        stitched ids must stay globally stable across clip boundaries."""
        from tests.test_clip_pipeline import (StubFlow, StubPose, VEL,
                                              make_cfg)
        from flowtrack_tpu.tracking.clip_pipeline import ClipTracker

        cfg = make_cfg()
        tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
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
