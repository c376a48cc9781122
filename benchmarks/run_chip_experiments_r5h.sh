#!/bin/bash
# Round-5 queue H — refresh the two latency rows made stale by the
# async-batched fetch + FlowTracker grouped-readback batching:
#   1. legacy host-orchestrated streaming step (README row 122.8 ms —
#      predates FlowTracker's device_get batching, 8 -> 5 round trips)
#   2. the real-time row: 8 paced 30 fps streams, clip_len 8, uint8,
#      NO pipelining (the r5d row used pipeline_depth=1; saturated f8
#      uint8 is now 622.8 ms p50 under the batched fetch, so the paced
#      unpipelined configuration may beat the 881.8 ms pipelined row)
set -u
LOG=${1:-/tmp/chip_experiments_r5h.jsonl}
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  echo "== $desc" >&2
  ( "$@" 2>"/tmp/chip_err_$desc.log" \
    || echo "{\"step\": \"$desc\", \"error\": true}" ) | tail -1 >> "$LOG"
  tail -3 "/tmp/chip_err_$desc.log" >&2 || true
}

run lat_stream_batchedfetch env BENCH_LATENCY=stream BENCH_SKIP_ORACLE=1 \
  timeout 3600 python bench.py
run lat_f8_paced30_u8_nopipe env BENCH_LATENCY=1 BENCH_FRAMES=8 \
  BENCH_LATENCY_PACE_FPS=30 BENCH_LATENCY_DTYPE=uint8 BENCH_SKIP_ORACLE=1 \
  timeout 3600 python bench.py
echo "done: $LOG" >&2
