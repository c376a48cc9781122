"""Per-op time attribution of a clip program via a real profiler trace.

The relay's per-dispatch timing is untrustworthy (CLAUDE.md), and summed
per-stage isolation overcounts (probe_flownet docstring) — but a
jax.profiler device trace records what the chip actually executed inside
ONE fused program, giving decision-grade per-fusion attribution without
any isolation artifacts.

Usage (on the real chip):

    BENCH_CFG=flowtrack_posetrack BENCH_FLOW=flownet2 \
    python benchmarks/probe_trace.py

Prints device-op time grouped by HLO category, by repo source line (from
XLA's op metadata; flax-internal frames are re-attributed to the first
repo frame in the source stack), and the top individual ops.

Measured r4 finding recorded here (2026-08-19, b4 R152+FlowNet2 C=1
fp32-glue, 64-frame clip, 488 ms/clip device time): convolution fusions
44.9%, the FOUR cascade warp custom-calls 35.2% (ops/warp.py mm kernel,
~56 ms per 63-image warp), BatchNorm glue 6.4%, flip-merge 2.4%, id scan
~3%, correlation kernel 1.4% — the warp kernel was the #2 consumer and
the optimization target (see _warp_kernel_mm's packed-dy design).
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
    """Parse the profiler's trace.json.gz into device-op event dicts
    (name, dur_us, hlo_category, source) — XLA Ops track only (the XLA
    Modules track holds one whole-program event per dispatch and would
    double-count)."""
    jsons = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not jsons:
        raise RuntimeError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(jsons)[-1], "rt") as f:
        trace = json.load(f)
    evs = trace.get("traceEvents", [])
    # device pid = process named /device:...; ops thread named 'XLA Ops'
    dev_pids = {e["pid"] for e in evs
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "/device:" in e["args"].get("name", "")}
    op_tids = {(e["pid"], e["tid"]) for e in evs
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e["args"].get("name") == "XLA Ops"}
    out = []
    for ev in evs:
        if (ev.get("ph") != "X" or ev.get("pid") not in dev_pids
                or (ev["pid"], ev.get("tid")) not in op_tids):
            continue
        args = ev.get("args", {})
        out.append({
            "name": ev.get("name", "?"),
            "dur": float(ev.get("dur", 0.0)),
            "cat": args.get("hlo_category", "?"),
            "source": _repo_source(args),
        })
    return out


def _repo_source(args) -> str:
    """Prefer the first repo frame of the source stack (flax/jax internal
    lines aggregate everything; the repo frame says WHOSE conv it is)."""
    stack = args.get("source_stack", "")
    for line in stack.split("\n"):
        if "/flowtrack_tpu/" in line or "/tests/" in line:
            return line.rsplit(":", 1)[0]
    return args.get("source", "?")


def main():
    trace_dir = os.environ.get("TRACE_DIR", "/tmp/probe_trace")
    reps = int(os.environ.get("TRACE_REPS", "3"))
    if os.environ.get("TRACE_PARSE_ONLY") != "1":
        n_frames = build_and_run(trace_dir, reps)
        print(f"traced {reps} reps of a {n_frames}-frame clip -> {trace_dir}",
              file=sys.stderr)
    events = load_trace_events(trace_dir)
    if not events:
        raise SystemExit("trace parsed but no device op events found")

    by_cat = defaultdict(float)
    by_src = defaultdict(float)
    by_op = defaultdict(float)
    total = 0.0
    for ev in events:
        by_cat[ev["cat"]] += ev["dur"]
        by_src[ev["source"]] += ev["dur"]
        by_op[ev["name"]] += ev["dur"]
        total += ev["dur"]
    print(json.dumps({"device_op_ms_total": round(total / 1e3, 1),
                      "events": len(events), "reps": reps}))
    print("\n-- by HLO category --")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        if v / total > 0.001:
            print(f"{v/1e3:9.2f} ms  {100*v/total:5.1f}%  {k}")
    print("\n-- by repo source line (top 30) --")
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{v/1e3:9.2f} ms  {100*v/total:5.1f}%  {k}")
    print("\n-- top 25 ops --")
    for name, us in sorted(by_op.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{us/1e3:9.2f} ms  {100*us/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
