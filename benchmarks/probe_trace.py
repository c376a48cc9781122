"""Per-op time attribution of a clip program via a real profiler trace.

The relay's per-dispatch timing is untrustworthy (CLAUDE.md), and summed
per-stage isolation overcounts (probe_flownet docstring) — but a
jax.profiler device trace records what the chip actually executed inside
ONE fused program, giving decision-grade per-fusion attribution without
any isolation artifacts.

Usage (on the real chip):

    BENCH_CFG=flowtrack_posetrack BENCH_FLOW=flownet2 \
    BENCH_GLUE_DTYPE=bfloat16 python benchmarks/probe_trace.py

Prints the top-N device ops by total self time, grouped into pipeline
stages by HLO op-name heuristics (pose convs vs flow convs vs correlation
vs warp kernels vs scans), plus each group's share of device time.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def build_and_run(trace_dir: str, reps: int = 3):
    import jax

    import bench
    from flowtrack_tpu.tracking.clip_pipeline import pad_detections

    bench.enable_compile_cache()

    tracker, h, w = bench.build_clip_tracker(
        os.environ.get("BENCH_CFG") or None,
        os.environ.get("BENCH_FLOW") or None)
    n_frames = int(os.environ.get("BENCH_FRAMES", "64"))
    persons = bench.PERSONS
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 255, (n_frames, h, w, 3)).astype(np.float32)
    boxes = [[[20 + 15 * p, 30 + 10 * p, 60, 90] for p in range(persons)]
             for _ in range(n_frames)]
    scores = [[0.9] * persons for _ in range(n_frames)]
    db, dsc, dv = pad_detections(boxes, scores, persons)
    args = tracker.prepare(frames, db, dsc, dv)
    out = tracker.run_prepared(args)  # compile + stage buffers
    jax.block_until_ready(out)
    with jax.profiler.trace(trace_dir):
        for _ in range(reps):
            out = tracker.run_prepared(args)
        jax.block_until_ready(out)
    return n_frames


def load_trace_events(trace_dir: str):
    """Parse the trace into [(name, dur_us)] device-op events.

    Prefers the trace_viewer JSON conversion from the xplane proto
    (tensorboard-plugin-profile); falls back to any trace.json.gz the
    profiler wrote directly.
    """
    xplanes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                        recursive=True)
    if xplanes:
        try:
            from tensorboard_plugin_profile.convert import raw_to_tool_data
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                xplanes, "trace_viewer", {})
            trace = json.loads(data)
            return _events_from_trace_json(trace)
        except Exception as e:  # noqa: BLE001 — try the json fallback
            print(f"xplane conversion failed ({e}); trying trace.json.gz",
                  file=sys.stderr)
    jsons = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not jsons:
        raise RuntimeError(f"no parsable trace under {trace_dir}")
    with gzip.open(jsons[0], "rt") as f:
        return _events_from_trace_json(json.load(f))


def _events_from_trace_json(trace):
    # keep only complete events on device (TPU/XLA Ops) tracks
    pid_names = {}
    tid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
    events = []
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        proc = pid_names.get(ev.get("pid"), "")
        thread = tid_names.get((ev.get("pid"), ev.get("tid")), "")
        label = f"{proc}/{thread}"
        if ("TPU" in proc or "/device" in proc.lower()
                or "XLA Ops" in thread or "xla" in thread.lower()
                or "Steps" in thread):
            events.append((ev.get("name", "?"), float(ev["dur"]), label))
    return events


STAGE_PATTERNS = [
    # (stage label, substrings matched against the lowercased HLO op name)
    ("correlation(pallas)", ("corr",)),
    ("warp(pallas-mm)", ("warp",)),
    ("convolution", ("conv", "%convolution")),
    ("scan(id/recovery)", ("while", "scan", "dynamic-update")),
    ("top_k/sort", ("sort", "top-k", "topk")),
    ("copy/transpose", ("copy", "transpose", "bitcast", "reshape")),
    ("all-reduce/coll", ("all-reduce", "collective", "fusion.allreduce")),
]


def classify(name: str) -> str:
    low = name.lower()
    for label, pats in STAGE_PATTERNS:
        for p in pats:
            if p in low:
                return label
    if "fusion" in low:
        return "fusion(elementwise/other)"
    return "other"


def main():
    trace_dir = os.environ.get("TRACE_DIR", "/tmp/probe_trace")
    reps = int(os.environ.get("TRACE_REPS", "3"))
    if os.environ.get("TRACE_PARSE_ONLY") != "1":
        n_frames = build_and_run(trace_dir, reps)
        print(f"traced {reps} reps of a {n_frames}-frame clip -> {trace_dir}",
              file=sys.stderr)
    events = load_trace_events(trace_dir)
    if not events:
        raise SystemExit("trace parsed but no device events found")

    by_op = defaultdict(float)
    by_stage = defaultdict(float)
    tracks = defaultdict(float)
    for name, dur, label in events:
        by_op[name] += dur
        by_stage[classify(name)] += dur
        tracks[label] += dur
    total = sum(by_op.values())
    print(json.dumps({"tracks_us": {k: round(v, 1)
                                    for k, v in sorted(tracks.items())}}))
    print("\n-- stage shares (device op self time) --")
    for stage, us in sorted(by_stage.items(), key=lambda kv: -kv[1]):
        print(f"{stage:28s} {us/1e3:10.2f} ms  {100*us/total:5.1f}%")
    print("\n-- top 40 ops --")
    for name, us in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{us/1e3:9.2f} ms  {100*us/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
