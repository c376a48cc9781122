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
            "frames": _repo_frames(args),
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


def _repo_frames(args):
    """All (path, line) repo frames of an event's source stack."""
    out = []
    for line in args.get("source_stack", "").split("\n"):
        if "/flowtrack_tpu/" not in line:
            continue
        path, _, ln = line.strip().rpartition(":")
        try:
            out.append((path, int(ln)))
        except ValueError:
            pass
    return out


def _cascade_stage_classifier():
    """Build a stage classifier from LIVE source ranges (inspect), so the
    per-stage attribution survives edits to models/flownet.py.

    Returns classify(frames) -> stage label. Stages: the five cascade
    sub-nets (the two FlowNetS stages disambiguated by their FlowNet2
    call-site line), the FlowNet2 glue (warps/channelnorm/upsample), the
    pose net, the Pallas kernels, and the tracking scans — the buckets
    round-4 VERDICT item 2 asks the conv time to be split across."""
    import inspect

    from flowtrack_tpu.models import flownet

    ranges = []   # (label, lo, hi) within models/flownet.py
    for cls in (flownet.FlowNetC, flownet.FlowNetSD,
                flownet.FlowNetFusion, flownet.FlowNetS):
        lines, start = inspect.getsourcelines(cls)
        ranges.append((cls.__name__, start, start + len(lines)))
    # _RefinementTrunk is shared by FlowNetC and FlowNetS — its frames
    # alone cannot name the stage; the OUTER stage-class/call-site frame
    # does. FlowNet2/CSS body ranges mark glue + stage call sites.
    tr_lines, tr_start = inspect.getsourcelines(flownet._RefinementTrunk)
    trunk = (tr_start, tr_start + len(tr_lines))
    f2_lines, f2_start = inspect.getsourcelines(flownet.FlowNet2)
    f2 = (f2_start, f2_start + len(f2_lines))

    def callsite(substr):
        for i, ln in enumerate(f2_lines):
            if substr in ln:
                return f2_start + i
        return -1

    s1_line = callsite("flownets1(stage_input")
    s2_line = callsite("flownets2(stage_input")
    flownet_py = flownet.__file__

    def classify(frames):
        in_flownet = [ln for (p, ln) in frames if p == flownet_py]
        stage = None
        for ln in in_flownet:
            for label, lo, hi in ranges:
                if lo <= ln < hi:
                    stage = label
                    break
            if stage:
                break
        f2_frames = [ln for ln in in_flownet if f2[0] <= ln < f2[1]]
        if stage == "FlowNetS" or (stage is None and any(
                trunk[0] <= ln < trunk[1] for ln in in_flownet)):
            # which S stage (or C's trunk)? the FlowNet2 call-site frame
            if s1_line in f2_frames:
                return "flownets_1"
            if s2_line in f2_frames:
                return "flownets_2"
            return stage.lower() if stage else "trunk_shared"
        if stage:
            return stage.lower()
        if f2_frames:
            return "flownet2_glue"   # warps, channelnorm, upsamples
        for p, _ in frames:
            if "/ops/warp.py" in p:
                return "warp_kernel"
            if "/ops/correlation.py" in p:
                return "correlation_kernel"
            if "/models/pose_resnet.py" in p or "/models/layers.py" in p:
                return "pose_resnet"
            if "/tracking/" in p:
                return "tracking_scans"
            if "/ops/" in p:
                return "ops_glue"
        return "other"

    return classify


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
    by_stage = defaultdict(float)
    conv_by_stage = defaultdict(float)
    classify = _cascade_stage_classifier()
    total = 0.0
    for ev in events:
        by_cat[ev["cat"]] += ev["dur"]
        by_src[ev["source"]] += ev["dur"]
        by_op[ev["name"]] += ev["dur"]
        stage = classify(ev["frames"])
        by_stage[stage] += ev["dur"]
        if "convolution" in ev["cat"].lower():
            conv_by_stage[stage] += ev["dur"]
        total += ev["dur"]
    print(json.dumps({"device_op_ms_total": round(total / 1e3, 1),
                      "events": len(events), "reps": reps}))
    print("\n-- by HLO category --")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        if v / total > 0.001:
            print(f"{v/1e3:9.2f} ms  {100*v/total:5.1f}%  {k}")
    print("\n-- by cascade stage (all ops) --")
    for k, v in sorted(by_stage.items(), key=lambda kv: -kv[1]):
        if v / total > 0.001:
            print(f"{v/1e3:9.2f} ms  {100*v/total:5.1f}%  {k}")
    conv_total = sum(conv_by_stage.values())
    if conv_total:
        print("\n-- convolution time by cascade stage --")
        for k, v in sorted(conv_by_stage.items(), key=lambda kv: -kv[1]):
            print(f"{v/1e3:9.2f} ms  {100*v/total:5.1f}% of program "
                  f"({100*v/conv_total:5.1f}% of conv)  {k}")
    print("\n-- by repo source line (top 30) --")
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{v/1e3:9.2f} ms  {100*v/total:5.1f}%  {k}")
    print("\n-- top 25 ops --")
    for name, us in sorted(by_op.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{us/1e3:9.2f} ms  {100*us/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
