"""MultiStreamTracker: batched multi-stream serving must be per-stream
IDENTICAL to utils/video.track_video_clips on each stream separately —
including cross-clip id continuity through a detector miss exactly at a
clip boundary, ragged tails, and interleaved stream arrival."""

import numpy as np
import pytest

from flowtrack_tpu.serving import MultiStreamTracker
from flowtrack_tpu.utils.video import track_video_clips
from tests.test_clip_pipeline import VEL, StubFlow, StubPose, make_cfg
from flowtrack_tpu.tracking.clip_pipeline import ClipTracker

H, W = 128, 160
CLIP = 4


def scenario_a(n):
    """One person; detection dropped EXACTLY at the t=3 clip boundary."""
    frames = np.zeros((n, H, W, 3), np.float32)
    boxes, scores = [], []
    for t in range(n):
        ax, ay = 30 + VEL[0] * t, 35 + VEL[1] * t
        if t == CLIP - 1:  # the overlap/boundary frame
            boxes.append([])
            scores.append([])
        else:
            boxes.append([[ax - 12, ay - 12, 24, 24]])
            scores.append([0.9])
    return frames, boxes, scores


def scenario_b(n):
    """Two persons, the second appears at t=2."""
    frames = np.zeros((n, H, W, 3), np.float32)
    boxes, scores = [], []
    for t in range(n):
        ax, ay = 20 + VEL[0] * t, 25 + VEL[1] * t
        bs = [[ax - 12, ay - 12, 24, 24]]
        sc = [0.9]
        if t >= 2:
            bx, by = 90 + VEL[0] * (t - 2), 60 + VEL[1] * (t - 2)
            bs.append([bx - 12, by - 12, 24, 24])
            sc.append(0.85)
        boxes.append(bs)
        scores.append(sc)
    return frames, boxes, scores


def reference_stream(tracker, frames, boxes, scores):
    return track_video_clips(tracker, frames, boxes, scores, clip_len=CLIP)


def ids_and_joints(per_frame):
    return ([sorted(tr["track_id"] for tr in fr) for fr in per_frame],
            [np.sort(np.stack([tr["joints"].mean(0) for tr in fr]), axis=0)
             if fr else np.zeros((0, 2)) for fr in per_frame])


def test_multistream_matches_per_stream_reference():
    cfg = make_cfg()
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
    n = 10  # clips [0..3], [3..6], [6..9] + no tail; then 11 with a tail
    for n in (10, 11):
        fa, ba, sa = scenario_a(n)
        fb, bb, sb = scenario_b(n)
        want_a = reference_stream(tracker, fa, ba, sa)
        want_b = reference_stream(tracker, fb, bb, sb)

        mst = MultiStreamTracker(tracker, clip_len=CLIP, batch_streams=2)
        got = {"A": [None] * n, "B": [None] * n}
        emitted = []
        # interleave arrival: A leads by 2 frames
        for t in range(n + 2):
            if t < n:
                mst.submit("A", fa[t], ba[t], sa[t])
            if 2 <= t < n + 2:
                mst.submit("B", fb[t - 2], bb[t - 2], sb[t - 2])
            emitted += mst.step()
        emitted += mst.flush()
        for sid, first, tracks in emitted:
            for i, fr in enumerate(tracks):
                got[sid][first + i] = fr

        for sid, want in (("A", want_a), ("B", want_b)):
            assert all(fr is not None for fr in got[sid]), (n, sid)
            want_ids, want_cj = ids_and_joints(want)
            got_ids, got_cj = ids_and_joints(got[sid])
            assert got_ids == want_ids, (n, sid, got_ids, want_ids)
            for t in range(n):
                np.testing.assert_allclose(got_cj[t], want_cj[t],
                                           atol=1e-4, err_msg=f"{sid}:{t}")

        # the boundary-occluded person in A keeps ONE global id throughout
        a_ids = {tr["track_id"] for fr in got["A"] for tr in fr}
        assert len(a_ids) == 1, a_ids


def test_pipelined_serving_matches_unpipelined():
    """pipeline_depth=1 (dispatch batch t+1 while batch t computes) must
    change WHEN emissions surface, never WHAT they are: same per-stream
    per-frame tracks as the synchronous tracker, including cross-clip id
    continuity and the ragged flush tail."""
    cfg = make_cfg()
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
    for n in (10, 11):
        fa, ba, sa = scenario_a(n)
        fb, bb, sb = scenario_b(n)

        def run(depth):
            mst = MultiStreamTracker(tracker, clip_len=CLIP,
                                     batch_streams=2,
                                     pipeline_depth=depth)
            got = {"A": [None] * n, "B": [None] * n}
            emitted = []
            for t in range(n):
                mst.submit("A", fa[t], ba[t], sa[t])
                mst.submit("B", fb[t], bb[t], sb[t])
                emitted += mst.step()
            emitted += mst.flush()
            for sid, first, tracks in emitted:
                for i, fr in enumerate(tracks):
                    assert got[sid][first + i] is None  # exactly once
                    got[sid][first + i] = fr
            assert mst.latency_stats()["count"] == 2 * n
            return got

        want = run(0)
        got = run(1)
        for sid in ("A", "B"):
            assert all(fr is not None for fr in got[sid]), (n, sid)
            w_ids, w_cj = ids_and_joints(want[sid])
            g_ids, g_cj = ids_and_joints(got[sid])
            assert g_ids == w_ids, (n, sid)
            for t in range(n):
                np.testing.assert_allclose(g_cj[t], w_cj[t], atol=1e-4)


def test_pipelined_step_defers_one_batch():
    """With depth=1 the first ready batch's emissions surface on the NEXT
    step (or at flush), pinning that dispatch and fetch are decoupled."""
    cfg = make_cfg()
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
    n = 2 * CLIP  # two full clips per stream
    fa, ba, sa = scenario_a(n)
    mst = MultiStreamTracker(tracker, clip_len=CLIP, batch_streams=1,
                             pipeline_depth=1)
    seen_at = {}
    for t in range(n):
        mst.submit("A", fa[t], ba[t], sa[t])
        for sid, first, tracks in mst.step():
            seen_at[first] = t
    # clip 0 became ready at t=3 but must only surface when clip 1's
    # dispatch displaced it (t = 2*CLIP-2), not at t=CLIP-1
    assert seen_at.get(0, None) == 2 * CLIP - 2, seen_at
    left = mst.flush()
    assert sum(len(tr) for _, _, tr in left) == n - CLIP


def test_latency_stats_cover_every_emitted_frame():
    """Submit->emit latency accounting (round-4 VERDICT item 1): exactly
    one latency sample per emitted frame — through batched steps, the
    overlap-frame dedup, AND the ragged flush tail — with sane percentile
    ordering, and reset_latency_stats() restarting the window."""
    cfg = make_cfg()
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
    n = 11  # two full clips + a ragged tail per stream
    fa, ba, sa = scenario_a(n)
    fb, bb, sb = scenario_b(n)

    mst = MultiStreamTracker(tracker, clip_len=CLIP, batch_streams=2)
    assert mst.latency_stats() == {"count": 0}
    emitted = []
    for t in range(n):
        mst.submit("A", fa[t], ba[t], sa[t])
        mst.submit("B", fb[t], bb[t], sb[t])
        emitted += mst.step()
    n_before_flush = sum(len(tr) for _, _, tr in emitted)
    assert mst.latency_stats()["count"] == n_before_flush
    emitted += mst.flush()
    n_frames = sum(len(tr) for _, _, tr in emitted)
    assert n_frames == 2 * n  # every frame of both streams, exactly once

    stats = mst.latency_stats()
    assert stats["count"] == 2 * n
    assert 0.0 < stats["p50_ms"] <= stats["p90_ms"] <= stats["p99_ms"] \
        <= stats["max_ms"]
    # frames emitted by the flush waited through >= one full clip of
    # buffering; the stats must include that wait, not just device time
    assert stats["max_ms"] >= stats["p50_ms"]

    mst2 = MultiStreamTracker(tracker, clip_len=CLIP, batch_streams=2)
    for t in range(CLIP):
        mst2.submit("A", fa[t], ba[t], sa[t])
        mst2.submit("B", fb[t], bb[t], sb[t])
        mst2.step()
    assert mst2.latency_stats()["count"] == 2 * CLIP
    mst2.reset_latency_stats()
    assert mst2.latency_stats() == {"count": 0}
    # frames still buffered keep their submit stamps across the reset
    for t in range(CLIP, 2 * CLIP - 1):
        mst2.submit("A", fa[t], ba[t], sa[t])
        mst2.submit("B", fb[t], bb[t], sb[t])
        mst2.step()
    assert mst2.latency_stats()["count"] == 2 * (CLIP - 1)


def test_single_ready_stream_with_force():
    cfg = make_cfg()
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
    n = 6
    fa, ba, sa = scenario_b(n)
    want = reference_stream(tracker, fa, ba, sa)

    mst = MultiStreamTracker(tracker, clip_len=CLIP, batch_streams=4)
    for t in range(n):
        mst.submit("solo", fa[t], ba[t], sa[t])
        assert mst.step() == []  # 1 ready stream < batch_streams, no force
    out = mst.step(force=True)  # single-stream path
    out += mst.flush()
    got = [None] * n
    for _, first, tracks in out:
        for i, fr in enumerate(tracks):
            got[first + i] = fr
    assert all(fr is not None for fr in got)
    w_ids, _ = ids_and_joints(want)
    g_ids, _ = ids_and_joints(got)
    assert g_ids == w_ids


def test_multistream_sharded_matches_unsharded():
    """serving with the clip axis sharded over a 2-device submesh must
    equal the unsharded batched run (the multi-chip serving layout)."""
    from flowtrack_tpu.parallel import batch_sharding, make_mesh

    cfg = make_cfg()
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
    n = 7
    fa, ba, sa = scenario_a(n)
    fb, bb, sb = scenario_b(n)

    def run(sharding):
        mst = MultiStreamTracker(tracker, clip_len=CLIP, batch_streams=2,
                                 sharding=sharding)
        got = {"A": [None] * n, "B": [None] * n}
        em = []
        for t in range(n):
            mst.submit("A", fa[t], ba[t], sa[t])
            mst.submit("B", fb[t], bb[t], sb[t])
            em += mst.step()
        em += mst.flush()
        for sid, first, tracks in em:
            for i, fr in enumerate(tracks):
                got[sid][first + i] = fr
        return got

    want = run(None)
    got = run(batch_sharding(make_mesh(2)))
    for sid in ("A", "B"):
        w_ids, w_cj = ids_and_joints(want[sid])
        g_ids, g_cj = ids_and_joints(got[sid])
        assert g_ids == w_ids, sid
        for t in range(n):
            np.testing.assert_allclose(g_cj[t], w_cj[t], atol=1e-4)


@pytest.mark.slow
def test_real_models_sharded_serving_matches_reference():
    """The serving component itself (not just the CLI) with REAL models:
    ResNet-18 + FlowNetS, 8 interleaved streams, the clip axis sharded
    over the full 8-device mesh, drain() at shutdown — per-stream ids and
    joints must equal track_video_clips run on each stream separately."""
    import jax
    import jax.numpy as jnp
    from dataclasses import replace
    from flowtrack_tpu.config import Config, ModelConfig
    from flowtrack_tpu.models.flownet import FlowNetS
    from flowtrack_tpu.models.pose_resnet import get_pose_net
    from flowtrack_tpu.parallel import batch_sharding, make_mesh

    cfg = Config(model=ModelConfig(num_layers=18, image_size=(64, 64),
                                   heatmap_size=(16, 16), dtype="float32"))
    cfg = replace(cfg, track=replace(cfg.track, max_persons=2,
                                     pose_score_thre=0.0),
                  flow=replace(cfg.flow, dtype="float32"))
    pose = get_pose_net(cfg.model)
    pv = jax.jit(pose.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    flow = FlowNetS(dtype=jnp.float32)
    fv = jax.jit(flow.init, static_argnames="train")(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 6)), train=False)
    tracker = ClipTracker(cfg, pose, pv, flow, fv)

    rng = np.random.default_rng(7)
    n, clip = 5, 3
    streams = {}
    for i in range(8):
        frames = rng.uniform(0, 120, (n, 96, 128, 3)).astype(np.float32)
        boxes = [[[15 + 6 * i + 4 * t, 25, 30, 40]] for t in range(n)]
        scores = [[0.9]] * n
        streams[f"s{i}"] = (frames, boxes, scores)

    want = {sid: track_video_clips(tracker, *streams[sid], clip_len=clip)
            for sid in streams}

    mst = MultiStreamTracker(tracker, clip_len=clip, batch_streams=8,
                             sharding=batch_sharding(make_mesh(8)))
    got = {sid: [None] * n for sid in streams}
    emitted = []
    for t in range(n):  # interleaved arrival, all streams per tick
        for sid, (f, b, s) in streams.items():
            mst.submit(sid, f[t], b[t], s[t])
        emitted += mst.step()
    emitted += mst.drain()
    for sid, first, tracks in emitted:
        for i, fr in enumerate(tracks):
            got[sid][first + i] = fr

    for sid in streams:
        assert all(fr is not None for fr in got[sid]), sid
        w_ids, w_cj = ids_and_joints(want[sid])
        g_ids, g_cj = ids_and_joints(got[sid])
        assert g_ids == w_ids, sid
        for t in range(n):
            np.testing.assert_allclose(g_cj[t], w_cj[t], atol=1e-4,
                                       err_msg=f"{sid}:{t}")


def test_backlog_flush_chains_full_clips():
    """Submitting everything up front and only calling flush() must chain
    the backlog through clip-shaped programs (identical results), never an
    oversized one-off clip — and unequal stream lengths must match the
    per-stream reference exactly."""
    cfg = make_cfg()
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
    lens = {"A": 10, "B": 17}
    data = {"A": scenario_a(10), "B": scenario_b(17)}
    want = {sid: reference_stream(tracker, *data[sid]) for sid in data}

    mst = MultiStreamTracker(tracker, clip_len=CLIP, batch_streams=2)
    for sid, (f, b, s) in data.items():
        for t in range(lens[sid]):
            mst.submit(sid, f[t], b[t], s[t])
    emitted = list(mst.flush())  # no step() at all: pure backlog drain
    got = {sid: [None] * lens[sid] for sid in data}
    for sid, first, tracks in emitted:
        for i, fr in enumerate(tracks):
            got[sid][first + i] = fr
    for sid in data:
        assert all(fr is not None for fr in got[sid]), sid
        w_ids, w_cj = ids_and_joints(want[sid])
        g_ids, g_cj = ids_and_joints(got[sid])
        assert g_ids == w_ids, sid
        for t in range(lens[sid]):
            np.testing.assert_allclose(g_cj[t], w_cj[t], atol=1e-4)


@pytest.mark.smoke
def test_submit_validates_at_the_boundary():
    """submit() must reject malformed input with the stream named — not
    die later inside np.stack at clip assembly."""
    cfg = make_cfg()
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
    mst = MultiStreamTracker(tracker, clip_len=CLIP, batch_streams=2)

    frame = np.zeros((H, W, 3), np.float32)
    mst.submit("A", frame, [[1, 2, 3, 4]], [0.9])

    # wrong rank / channel count
    with pytest.raises(ValueError, match="'B'.*\\(H, W, 3\\)"):
        mst.submit("B", np.zeros((H, W), np.float32), [], [])
    with pytest.raises(ValueError, match="must be \\(H, W, 3\\)"):
        mst.submit("B", np.zeros((H, W, 4), np.float32), [], [])
    # cross-stream shape mismatch (streams batch into one program)
    with pytest.raises(ValueError, match="'B'.*does not match"):
        mst.submit("B", np.zeros((H // 2, W, 3), np.float32), [], [])
    # same-stream dtype drift
    with pytest.raises(ValueError, match="'A'.*does not match"):
        mst.submit("A", np.zeros((H, W, 3), np.uint8), [], [])
    # boxes/scores disagreement and non-xywh boxes
    with pytest.raises(ValueError, match="'A'.*2 boxes vs 1 scores"):
        mst.submit("A", frame, [[1, 2, 3, 4], [5, 6, 7, 8]], [0.9])
    with pytest.raises(ValueError, match="'A'.*length-4"):
        mst.submit("A", frame, [[1, 2, 3]], [0.9])

    # nothing malformed was buffered; the good stream still tracks
    assert len(mst._frames["A"]) == 1 and "B" not in mst._frames


def test_sharded_forced_partial_batch_does_not_crash():
    """A forced drain with a lane count that doesn't divide the mesh must
    fall back to default placement, not crash on the sharding constraint."""
    from flowtrack_tpu.parallel import batch_sharding, make_mesh

    cfg = make_cfg()
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
    n = CLIP  # exactly one clip per stream
    data = {sid: scenario_b(n) for sid in ("p", "q", "r")}  # 3 lanes
    want = reference_stream(tracker, *data["p"])

    mst = MultiStreamTracker(tracker, clip_len=CLIP, batch_streams=4,
                             sharding=batch_sharding(make_mesh(2)))
    for sid, (f, b, s) in data.items():
        for t in range(n):
            mst.submit(sid, f[t], b[t], s[t])
    emitted = mst.step(force=True)  # 3 ready lanes, mesh of 2
    assert {sid for sid, _, _ in emitted} == set(data)
    w_ids, _ = ids_and_joints(want)
    for sid, first, tracks in emitted:
        g_ids, _ = ids_and_joints(tracks)
        assert g_ids == w_ids, sid


def test_fused_streaming_clip_len_2_matches_reference():
    """serving.StreamingClipTracker (the fused low-latency mode; bench
    BENCH_LATENCY=stream2): one device call per frame — the first step
    emits nothing, the second emits frames 0+1, every later step emits
    EXACTLY the frame it submitted, and the whole emission sequence
    equals track_video_clips at clip_len=2 (itself clip_len-invariant
    vs the pinned per-frame reference). Also pins the one-frame flush
    edge and the latency accounting."""
    from flowtrack_tpu.serving import StreamingClipTracker

    cfg = make_cfg()
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
    n = 9
    fa, ba, sa = scenario_b(n)
    want = track_video_clips(tracker, fa, ba, sa, clip_len=2)

    st = StreamingClipTracker(tracker)
    got = [None] * n
    for t in range(n):
        emitted = st.step(fa[t], ba[t], sa[t])
        want_idx = [] if t == 0 else [0, 1] if t == 1 else [t]
        assert [idx for idx, _ in emitted] == want_idx, t
        for idx, fr in emitted:
            assert got[idx] is None
            got[idx] = fr
    # every submitted frame emitted in-loop; only the overlap frame is
    # still buffered, so flush has nothing left to emit
    assert all(fr is not None for fr in got)
    assert st.flush() == []
    assert st.latency_stats()["count"] == n
    w_ids, w_cj = ids_and_joints(want)
    g_ids, g_cj = ids_and_joints(got)
    assert g_ids == w_ids
    for t in range(n):
        np.testing.assert_allclose(g_cj[t], w_cj[t], atol=1e-4)


def test_fused_streaming_single_frame_flush():
    """A stream that only ever saw ONE frame still emits it at flush
    (the ragged-tail path of the 2-frame clip program)."""
    from flowtrack_tpu.serving import StreamingClipTracker

    cfg = make_cfg()
    tracker = ClipTracker(cfg, StubPose(), {}, StubFlow(), {})
    fa, ba, sa = scenario_b(2)
    st = StreamingClipTracker(tracker)
    assert st.step(fa[0], ba[0], sa[0]) == []
    out = st.flush()
    assert [idx for idx, _ in out] == [0]
    assert len(out[0][1]) >= 1  # the frame's tracks
