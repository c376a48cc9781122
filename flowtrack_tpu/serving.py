"""Multi-stream serving: N independent video streams, ONE device program.

The headline bench's multi-stream layout (``ClipTracker.track_clips`` —
clips vmapped on a leading batch dim) packaged as a usable component.
Measured on v5e-1: batching independent streams' clips into one program
lifts throughput 424 -> 477 f/s (the pose/flow nets are batch-bound at
their small-spatial deep layers; benchmarks/probe_flownet.py), so a server
holding several streams should track them together rather than
round-robining single-clip calls.

Usage:
    mst = MultiStreamTracker(tracker, clip_len=64, batch_streams=6)
    mst.submit(sid, frame, boxes, scores)   # per stream, per frame
    for sid, frame_idx, tracks in mst.step():   # when >=1 clip is ready
        ...
    ... mst.flush()                          # ragged tails at shutdown

Semantics are identical to running ``utils/video.track_video_clips`` on
each stream separately (pinned by test): consecutive clips of one stream
overlap by one frame and the stream's live-track state (poses / GLOBAL
ids / miss ages / next-id counter) carries across its own clips as a
device-resident seed, so ids survive clip boundaries — including a person
occluded exactly at one. Streams share nothing: ids are per-stream.

Reference parity note: the reference (SURVEY.md section 4.4) serves one
video at a time with a sequential per-frame loop; multi-stream batching is
a TPU-native addition on top of the same per-stream contract.
"""

from __future__ import annotations

import time
from typing import Dict, Hashable, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from flowtrack_tpu.tracking.clip_pipeline import ClipTracker, pad_detections


def tracks_of_frame(out: Dict[str, np.ndarray], t: int) -> List[dict]:
    """track_clip output dict -> the per-frame track list emitted to users
    (same shape as utils/video.track_video_clips results)."""
    items = []
    for s in range(out["valid"].shape[1]):
        if out["valid"][t, s]:
            items.append({"track_id": int(out["ids"][t, s]),
                          "joints": out["joints"][t, s],
                          "maxvals": out["maxvals"][t, s],
                          "score": float(out["scores"][t, s])})
    return items


class StreamingClipTracker:
    """Lowest-latency single-stream serving: ONE fused device call per
    frame (the whole-clip program at clip_len=2 — flow on the new pair +
    pose + match in one jit, track state carried device-side via the
    clip seed) + one async-batched fetch. Measured on v5e-1 (README
    latency table): 46.7 ms/frame p50 at uint8 vs 122.6 ms for the
    host-orchestrated per-frame ``tracking.FlowTracker`` loop.

    Semantics equal ``utils/video.track_video_clips`` at clip_len=2
    (itself pinned clip_len-invariant), hence the reference's
    continuous per-frame loop (SURVEY.md section 4.4) — tested.

    Usage:
        st = StreamingClipTracker(tracker)
        for frame, boxes, scores in source:
            for frame_idx, tracks in st.step(frame, boxes, scores):
                ...
        ... st.flush()   # the first frame if only one was ever submitted

    The first step emits nothing (the 2-frame clip is filling) and the
    second emits frames 0 and 1 together; every later step emits
    exactly the frame it submitted — zero frame lag after warmup."""

    def __init__(self, tracker: ClipTracker):
        self._mst = MultiStreamTracker(tracker, clip_len=2,
                                       batch_streams=1)

    def step(self, frame: np.ndarray, boxes, scores):
        """Submit one frame; returns [(frame_index, tracks), ...] for
        every frame emitted by this call (see class docstring for the
        warmup pattern). ``tracks`` is the per-frame list of dicts of
        ``tracks_of_frame``."""
        self._mst.submit(0, frame, boxes, scores)
        out = []
        for _sid, first, tracks in self._mst.step(force=True):
            out.extend((first + i, fr) for i, fr in enumerate(tracks))
        return out

    def flush(self):
        """Emit anything still buffered (only possible if a single frame
        was ever submitted); drops stream state."""
        return [(first + i, fr)
                for _sid, first, tracks in self._mst.flush()
                for i, fr in enumerate(tracks)]

    def latency_stats(self) -> dict:
        return self._mst.latency_stats()

    def reset_latency_stats(self) -> None:
        return self._mst.reset_latency_stats()


class MultiStreamTracker:
    """Batch independent streams' ready clips into one ClipTracker call.

    ``batch_streams`` ready clips run per device call (fewer only when
    ``step(force=True)`` drains a partial set — each distinct batch size
    compiles once, so keep ``force`` for shutdown/latency escapes).
    ``sharding`` (e.g. ``parallel.batch_sharding(mesh)``) splits the clip
    axis across a mesh — the multi-chip serving layout."""

    def __init__(self, tracker: ClipTracker, clip_len: int = 64,
                 batch_streams: int = 4, sharding=None,
                 pipeline_depth: int = 0):
        if clip_len < 2:
            raise ValueError("clip_len must be >= 2 (1-frame clip overlap)")
        self.tracker = tracker
        self.clip_len = clip_len
        self.batch_streams = batch_streams
        self.sharding = sharding
        # pipeline_depth=1: step() DISPATCHES the current ready batch
        # (async, jax dispatch) and returns the PREVIOUS batch's
        # emissions — host-side clip prep + H2D of batch t+1 overlap the
        # device compute of batch t instead of serializing behind its
        # readback. Stream state (buffers, device seeds, emitted
        # counters) advances at dispatch, so chaining is unaffected;
        # emissions surface one step later (flush/drain fetch the rest).
        # 0 = synchronous (dispatch + fetch in the same step).
        self.pipeline_depth = pipeline_depth
        self._pending: List[tuple] = []   # dispatched, not yet fetched
        self.max_persons = tracker.max_persons
        # per-stream state
        self._frames: Dict[Hashable, list] = {}   # buffered (frame, b, s)
        self._seed: Dict[Hashable, tuple] = {}    # device seed tuple
        self._emitted: Dict[Hashable, int] = {}   # frames emitted so far
        self._frame_spec: Optional[tuple] = None  # (shape, dtype) of record
        # submit->emit latency: one perf_counter per buffered frame, popped
        # in emission order (every frame is emitted exactly once per
        # stream, so the deque head is always the next frame to emit)
        self._submit_ts: Dict[Hashable, list] = {}
        self._latencies_ms: List[float] = []

    # -- ingestion ---------------------------------------------------------

    def submit(self, stream_id: Hashable, frame: np.ndarray,
               boxes, scores) -> None:
        """Buffer one frame + its detections for a stream. ``boxes``:
        (P, 4) xywh (possibly empty); ``scores``: (P,).

        Every frame of every stream must share one (H, W, 3) shape and
        dtype: clips from different streams are stacked into ONE batched
        device program, so a mismatch is rejected HERE with the offending
        stream named, not frames later inside clip assembly."""
        frame = np.asarray(frame)
        if frame.ndim != 3 or frame.shape[-1] != 3:
            raise ValueError(
                f"stream {stream_id!r}: frame must be (H, W, 3), got shape "
                f"{frame.shape}")
        spec = (frame.shape, frame.dtype)
        if self._frame_spec is None:
            self._frame_spec = spec
        elif spec != self._frame_spec:
            raise ValueError(
                f"stream {stream_id!r}: frame shape/dtype {frame.shape}/"
                f"{frame.dtype} does not match this tracker's established "
                f"{self._frame_spec[0]}/{self._frame_spec[1]} — all streams "
                f"batch into one device program and must agree")
        boxes = list(boxes)
        scores = list(scores)
        if len(boxes) != len(scores):
            raise ValueError(
                f"stream {stream_id!r}: {len(boxes)} boxes vs "
                f"{len(scores)} scores")
        for b in boxes:
            if len(b) != 4:
                raise ValueError(
                    f"stream {stream_id!r}: each box must be xywh "
                    f"length-4, got {b!r}")
        self._frames.setdefault(stream_id, []).append(
            (frame, boxes, scores))
        self._emitted.setdefault(stream_id, 0)
        self._seed.setdefault(stream_id, None)
        self._submit_ts.setdefault(stream_id, []).append(time.perf_counter())

    def _need(self, sid) -> int:
        """Buffered frames needed for the next clip: the first clip is
        clip_len frames; later clips re-use the previous clip's last frame
        as their frame 0 (the 1-frame overlap of utils/video.clip_spans),
        so they need clip_len buffered including that overlap frame."""
        return self.clip_len

    def ready(self) -> List[Hashable]:
        return [sid for sid, buf in self._frames.items()
                if len(buf) >= self._need(sid)]

    # -- device step -------------------------------------------------------

    def _clip_args(self, sid):
        buf = self._frames[sid][:self.clip_len]
        frames = np.stack([np.asarray(f) for f, _, _ in buf])
        db, dsc, dv = pad_detections([b for _, b, _ in buf],
                                     [s for _, _, s in buf],
                                     self.max_persons)
        # global frame index of this clip's frame 0 (keyframe cadence)
        first_global = self._emitted[sid] - (1 if self._seed[sid] is not None
                                             else 0)
        return self.tracker.prepare(frames, db, dsc, dv,
                                    frame_offset=first_global)

    def _record_latency(self, sid, n_emitted: int) -> None:
        """Pop the n oldest submit timestamps of this stream (the frames
        just emitted, in submission order) and record submit->emit wall
        latencies. Called AFTER the host fetch, so the device step + the
        readback are inside the measured interval."""
        now = time.perf_counter()
        ts = self._submit_ts.get(sid, [])
        self._latencies_ms.extend(
            (now - t) * 1e3 for t in ts[:n_emitted])
        del ts[:n_emitted]

    def latency_stats(self) -> dict:
        """Submit->emit latency (ms) over every frame emitted since the
        last reset_latency_stats(): waiting buffered for the clip to fill
        + the batched device step + host readback. The serving layer's
        product latency surface (round-4 VERDICT item 1); on this machine
        readbacks additionally ride the axon relay (~30 ms each,
        CLAUDE.md) which a PCIe host does not pay."""
        a = np.asarray(self._latencies_ms, np.float64)
        if a.size == 0:
            return {"count": 0}
        return {"count": int(a.size),
                "p50_ms": round(float(np.percentile(a, 50)), 2),
                "p90_ms": round(float(np.percentile(a, 90)), 2),
                "p99_ms": round(float(np.percentile(a, 99)), 2),
                "max_ms": round(float(a.max()), 2),
                "mean_ms": round(float(a.mean()), 2)}

    def reset_latency_stats(self) -> None:
        """Drop recorded latencies (e.g. after the compile warmup clip —
        first-step compilation would otherwise dominate every percentile).
        Pending submit timestamps are kept: buffered frames still in
        flight measure their true wait."""
        self._latencies_ms.clear()

    def _advance(self, sid) -> Tuple[int, int]:
        """Advance the stream past a just-DISPATCHED clip (buffer trim +
        emitted counter), so the next dispatch prepares the right frames
        even while this clip's results are still computing. Returns
        (start_global, skip) for the eventual fetch."""
        skip = 1 if self._emitted[sid] > 0 else 0
        start_global = self._emitted[sid]
        self._emitted[sid] += self.clip_len - skip
        # keep the clip's LAST frame as the next clip's overlap frame 0
        self._frames[sid] = self._frames[sid][self.clip_len - 1:]
        return start_global, skip

    def _dispatch(self, sids) -> tuple:
        """Dispatch one device call for these ready clips (async — jax
        returns immediately); update device-side seeds and stream state.
        Returns the pending entry for _fetch."""
        if len(sids) == 1:
            sid = sids[0]
            out_dev = self.tracker.run_prepared(self._clip_args(sid),
                                                seed=self._seed[sid])
            self._seed[sid] = out_dev[5]
            return (out_dev[:5], [(sid,) + self._advance(sid)])

        per_stream = [self._clip_args(sid) for sid in sids]
        args = [jnp.stack([p[j] for p in per_stream]) for j in range(7)]
        empty = self.tracker.empty_seed()
        seeds = [self._seed[sid] if self._seed[sid] is not None else empty
                 for sid in sids]
        args += [jnp.stack([s[j] for s in seeds]) for j in range(6)]
        # sharded clip axes must divide the mesh (parallel.pad_to_multiple
        # contract); a forced partial drain that doesn't just runs with
        # jit's default placement instead of crashing
        if (self.sharding is not None
                and len(sids) % self.sharding.mesh.size == 0):
            args = [jax.device_put(a, self.sharding) for a in args[:7]] \
                + args[7:]
        out_dev = self.tracker._clips_fn(self.tracker.pose_vars,
                                         self.tracker.flow_vars, *args)
        metas = []
        for i, sid in enumerate(sids):
            # per-lane seed slices stay device-side
            self._seed[sid] = tuple(leaf[i] for leaf in out_dev[5])
            metas.append((sid, i) + self._advance(sid))
        return (out_dev[:5], metas)

    def _fetch(self, entry) -> list:
        """Host-fetch a dispatched batch and build its emissions. ONE
        ASYNC-BATCHED readback for all five output leaves
        (jax.device_get starts copy_to_host_async on every leaf before
        awaiting any — on a relay host that charges a round trip per
        forced readback, the five trips overlap into ~one instead of
        serializing; per-lane fetches would pay 5 x batch_streams of
        them), then numpy-slice per lane."""
        out_dev, metas = entry
        host = jax.device_get(list(out_dev))
        results = []
        for meta in metas:
            if len(meta) == 3:          # single-clip dispatch
                sid, start, skip = meta
                out = self.tracker.to_host(tuple(host) + (None,))
            else:
                sid, lane, start, skip = meta
                out = self.tracker.to_host(
                    tuple(h[lane] for h in host) + (None,))
            tracks = [tracks_of_frame(out, t)
                      for t in range(skip, out["valid"].shape[0])]
            self._record_latency(sid, len(tracks))
            results.append((sid, start, tracks))
        return results

    def step(self, force: bool = False):
        """Track up to ``batch_streams`` ready clips in one device call.

        Returns a list of (stream_id, first_frame_index, per_frame_tracks)
        emissions. With ``pipeline_depth=0`` these are this step's clips
        ([] if nothing was ready, or when fewer than batch_streams
        streams are ready and ``force`` is off); with ``pipeline_depth=1``
        the dispatched batch's emissions surface on the NEXT step (or at
        flush/drain) while its device call overlaps this step's prep."""
        sids = self.ready()
        if sids and (len(sids) >= self.batch_streams or force):
            self._pending.append(self._dispatch(sids[:self.batch_streams]))
        results = []
        keep = 0 if force else self.pipeline_depth
        while len(self._pending) > keep:
            results += self._fetch(self._pending.pop(0))
        return results

    def drain(self):
        """Shutdown helper: batched forced steps while full clips remain,
        then flush() the ragged tails. Returns all emissions."""
        results = []
        while True:
            r = self.step(force=True)
            if not r:
                break
            results += r
        return results + self.flush()

    def flush(self):
        """Drain every stream: first any backlog of FULL clips (chained
        through the normal fixed-shape program — an oversized one-off clip
        would recompile and change recovery-budget semantics), then the
        true ragged tail (padded clip, exact ragged semantics via
        frame_valid + budget_frames), then drop the stream's state.
        Returns the same (stream_id, first_frame_index, tracks) list."""
        from flowtrack_tpu.utils.video import pad_tail_clip

        results = []
        while self._pending:   # surface anything still in the pipeline
            results += self._fetch(self._pending.pop(0))
        for sid in list(self._frames):
            while len(self._frames[sid]) >= self.clip_len:
                results += self._fetch(self._dispatch([sid]))
            buf = self._frames[sid]
            skip = 1 if self._emitted[sid] > 0 else 0
            if len(buf) <= skip:       # only the overlap frame left
                del self._frames[sid], self._seed[sid], self._emitted[sid]
                self._submit_ts.pop(sid, None)
                continue
            frames = np.stack([np.asarray(f) for f, _, _ in buf])
            frames, boxes, scores, fv, real = pad_tail_clip(
                frames, [b for _, b, _ in buf], [s for _, _, s in buf],
                self.clip_len)
            db, dsc, dv = pad_detections(boxes, scores, self.max_persons)
            first_global = self._emitted[sid] - skip
            args = self.tracker.prepare(frames, db, dsc, dv, fv,
                                        frame_offset=first_global)
            out_dev = self.tracker.run_prepared(
                args, budget_frames=real if real < self.clip_len else None,
                seed=self._seed[sid])
            out = self.tracker.to_host(out_dev)
            tracks = [tracks_of_frame(out, t) for t in range(skip, real)]
            self._record_latency(sid, len(tracks))
            results.append((sid, self._emitted[sid], tracks))
            del self._frames[sid], self._seed[sid], self._emitted[sid]
            self._submit_ts.pop(sid, None)
        return results
