#!/bin/bash
# Round-5 queue A (run on the real chip):
#   1. b4 device trace with NEW per-cascade-stage conv attribution
#      (VERDICT r4 item 2 — where do the 63%-of-program convs live?)
#   2. serving latency: clip_len sweep 8/16/32/48 saturated + one paced
#      30 fps line + the streaming per-frame mode (VERDICT r4 item 1)
#   3. warp VMEM-guard boundary compile check (VERDICT r4 item 5)
#   4. serving-optimum matrix lines b4s / b4x384 (VERDICT r4 item 3)
set -u
LOG=${1:-/tmp/chip_experiments_r5a.jsonl}
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  echo "== $desc" >&2
  ( "$@" 2>"/tmp/chip_err_$desc.log" \
    || echo "{\"step\": \"$desc\", \"error\": true}" ) | tail -1 >> "$LOG"
  tail -3 "/tmp/chip_err_$desc.log" >&2 || true
}

# 1. trace: full stdout kept (the stage tables are the product)
env BENCH_CFG=flowtrack_posetrack BENCH_FLOW=flownet2 \
    TRACE_DIR=/tmp/r5_trace_b4 timeout 3600 \
    python benchmarks/probe_trace.py > /tmp/r5_trace_b4.txt \
    2>/tmp/chip_err_trace_b4.log \
  || echo '{"step": "trace_b4", "error": true}' >> "$LOG"
tail -3 /tmp/chip_err_trace_b4.log >&2 || true

# 2. latency
for F in 48 32 16 8; do
  run "lat_f$F" env BENCH_LATENCY=1 BENCH_FRAMES=$F BENCH_SKIP_ORACLE=1 \
    timeout 3600 python bench.py
done
run lat_f48_paced30 env BENCH_LATENCY=1 BENCH_LATENCY_PACE_FPS=30 \
  BENCH_SKIP_ORACLE=1 timeout 3600 python bench.py
run lat_stream env BENCH_LATENCY=stream BENCH_SKIP_ORACLE=1 \
  timeout 3600 python bench.py

# 3. warp boundary (full output is a handful of JSON lines)
timeout 3600 python benchmarks/probe_warp_boundary.py >> "$LOG" \
  2>/tmp/chip_err_warp_boundary.log \
  || echo '{"step": "warp_boundary", "error": true}' >> "$LOG"
tail -3 /tmp/chip_err_warp_boundary.log >&2 || true

# 4. serving-optimum matrix lines
run matrix_b4s env BENCH_MATRIX=1 BENCH_MATRIX_ONLY=b4s \
  timeout 7200 python bench.py
run matrix_b4x384 env BENCH_MATRIX=1 BENCH_MATRIX_ONLY=b4x384 \
  timeout 7200 python bench.py

echo "done: $LOG" >&2
