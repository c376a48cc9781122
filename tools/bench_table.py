#!/usr/bin/env python
"""Render the per-[B]-config bench matrix (BENCH_MATRIX=1 python bench.py,
one JSON line per config) as the README markdown table — so the published
table is GENERATED from driver-captured data, not hand-copied.

Usage:
    BENCH_MATRIX=1 python bench.py | tee BENCH_MATRIX.jsonl
    python tools/bench_table.py BENCH_MATRIX.jsonl
"""

from __future__ import annotations

import json
import sys

LABELS = {
    "b0": "0: ResNet-50 @256×192 flip+decode+rescore",
    "b1": "1: ResNet-50 @384×288 flip+decode",
    "b2": "2: ResNet-152 @384×288 batch + device OKS-NMS",
    "b3": "3: FlowNetS frame pairs",
    "b4": "4: full FlowTrack (R152 + FlowNet2 cascade, clip path, "
          "recovery on)",
    "b4s": "4s: FlowTrack serving optimum (3 batched streams, bf16 glue)",
    "b4x384": "4@384: full FlowTrack @384×288 (bf16 glue — fp32 exceeds "
              "HBM)",
}


def render(lines):
    rows = ["| [B] config | throughput | XLA flops/item | MFU (bf16) |",
            "|---|---|---|---|"]
    for line in lines:
        line = line.strip()
        if not line or not line.startswith("{"):
            continue
        rec = json.loads(line)
        cfg = rec.get("config", "")
        label = LABELS.get(cfg.split("_")[0], cfg)
        unit = rec["unit"].split("(")[0].strip() or "items/s"
        gflops = rec.get("gflops_per_item", rec.get("gflops_per_frame"))
        flops = f"{gflops:.1f} G" if gflops is not None else "n/a"
        mfu = rec.get("mfu_pct_of_197T_bf16")
        mfu = f"{mfu:.1f}%" if mfu is not None else "n/a"
        value = f"{round(rec['value'], 1):g}"  # keep sub-integer deltas
        rows.append(f"| {label} | {value} {unit} | {flops} | {mfu} |")
    return "\n".join(rows)


def render_latency(lines):
    """BENCH_LATENCY JSON lines -> the README latency-vs-throughput
    table (clip_len sweep + streaming mode)."""
    rows = ["| serving mode | p50 | p99 | throughput |",
            "|---|---|---|---|"]
    for line in lines:
        line = line.strip()
        if not line or not line.startswith("{"):
            continue
        rec = json.loads(line)
        if rec.get("metric") == "streaming_per_frame_latency_ms":
            label = "streaming per-frame step (host-orchestrated)"
        elif rec.get("metric") == "fused_streaming_per_frame_latency_ms":
            dt = rec.get("dtype", "float32")
            extra = f" ({dt})" if dt != "float32" else ""
            label = f"fused streaming step (clip_len=2, 1 call/frame){extra}"
        elif rec.get("metric") == "serving_submit_to_emit_latency_ms":
            pace = rec.get("pace_fps") or 0
            extras = []
            if pace:
                extras.append(f"paced {pace:g} fps")
            if rec.get("pipeline_depth"):
                extras.append("pipelined")
            if rec.get("frame_dtype", "float32") != "float32":
                extras.append(rec["frame_dtype"])
            extra = f" ({', '.join(extras)})" if extras else ""
            label = (f"batched: clip_len {rec['clip_len']} x "
                     f"{rec['streams']} streams{extra}")
        else:
            continue
        rows.append(
            f"| {label} | {rec['p50_ms']:g} ms | {rec['p99_ms']:g} ms | "
            f"{rec['throughput_fps']:g} f/s |")
    return "\n".join(rows)


def main():
    args = [a for a in sys.argv[1:] if a != "--latency"]
    path = args[0] if args else "BENCH_MATRIX_r03.jsonl"
    with open(path) as f:
        lines = f.readlines()
    if "--latency" in sys.argv:
        print(render_latency(lines))
    else:
        print(render(lines))


if __name__ == "__main__":
    main()
