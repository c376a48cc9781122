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


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_MATRIX_r03.jsonl"
    with open(path) as f:
        print(render(f.readlines()))


if __name__ == "__main__":
    main()
