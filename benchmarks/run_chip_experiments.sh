#!/bin/bash
# Queued on-chip work for when the axon relay recovers (it has been
# returning "backend UNAVAILABLE" / hanging since ~2026-08-17 20:30).
# Run from /root/repo. Each step appends one JSON line to the log.
set -u
LOG=${1:-/tmp/chip_experiments.jsonl}
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  echo "== $desc" >&2
  ( "$@" 2>/tmp/chip_step_err.log || echo "{\"step\": \"$desc\", \"error\": true}" ) | tail -1 >> "$LOG"
  tail -3 /tmp/chip_step_err.log >&2 || true
}

# 1. baseline headline (C=6, no chunking) — regression check vs 477 f/s
run baseline_c6 timeout 2400 python bench.py

# 2. pose_chunk C=8 (the OOM config) and C=12
run c8_chunk128 env BENCH_CLIPS=8 BENCH_POSE_CHUNK=128 timeout 2400 python bench.py
run c12_chunk128 env BENCH_CLIPS=12 BENCH_POSE_CHUNK=128 timeout 2400 python bench.py

# 3. chunking overhead at the current headline C (should be ~neutral)
run c6_chunk128 env BENCH_CLIPS=6 BENCH_POSE_CHUNK=128 timeout 2400 python bench.py

# 3b. HBM-boundary probes: C=7 unchunked (does it fit below the C=8 OOM?),
#     C=10 chunked, and C=6 at 128-frame clips (dispatch amortization x
#     chunking) — whichever wins becomes the headline default
run c7_nochunk env BENCH_CLIPS=7 timeout 2400 python bench.py
run c10_chunk128 env BENCH_CLIPS=10 BENCH_POSE_CHUNK=128 timeout 2400 python bench.py
run c6_f128_chunk env BENCH_CLIPS=6 BENCH_FRAMES=128 BENCH_POSE_CHUNK=128 timeout 2400 python bench.py

# 4. b4 cascade with flow+pose chunking: does 2-stream now fit?
run b4_chunked env BENCH_CFG=coco_res152_384x288 BENCH_FLOW=flownet2 \
  BENCH_CLIPS=2 BENCH_POSE_CHUNK=128 BENCH_FLOW_CHUNK=9 timeout 3000 python bench.py

# 5. re-validate the repaired BENCH_ACCURACY=train mode on-chip
run accuracy_train env BENCH_ACCURACY=train timeout 3000 python bench.py

# 6. refresh the per-config matrix capture with the current code
echo "== matrix refresh" >&2
env BENCH_MATRIX=1 timeout 4800 python bench.py \
  > /root/repo/BENCH_MATRIX_r03.jsonl.new 2>>/tmp/chip_step_err.log \
  && grep -c '"config"' /root/repo/BENCH_MATRIX_r03.jsonl.new >&2 \
  || echo "matrix refresh failed" >&2

echo "done: $LOG" >&2
