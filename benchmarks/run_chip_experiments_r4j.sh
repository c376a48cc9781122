#!/bin/bash
# Round-4 queue, part 9: measure the greedy_match unroll=True change
# (tracker.py) — the per-frame id/recovery scans were 13.2% of the
# headline clip program (trace_b4_v2 attribution: scans 5.2% of b4).
#   1. headline defaults (C=8 x F=48, reps=8) — prior: 487.9 f/s
#   2. b4 fp32-glue single stream — prior: 165.15 f/s
#   3. b4 3-stream bf16-glue serving — prior: 193.7 f/s
set -u
LOG=${1:-/tmp/chip_experiments_r4j.jsonl}
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  echo "== $desc" >&2
  ( "$@" 2>"/tmp/chip_err_$desc.log" \
    || echo "{\"step\": \"$desc\", \"error\": true}" ) | tail -1 >> "$LOG"
  tail -3 "/tmp/chip_err_$desc.log" >&2 || true
}

run hl_unroll timeout 3600 python bench.py

run b4_unroll env BENCH_CFG=flowtrack_posetrack BENCH_FLOW=flownet2 \
  BENCH_CLIPS=1 timeout 3600 python bench.py

run b4_serve_unroll env BENCH_CFG=flowtrack_posetrack BENCH_FLOW=flownet2 \
  BENCH_CLIPS=3 BENCH_GLUE_DTYPE=bfloat16 timeout 3600 python bench.py

echo "done: $LOG" >&2
