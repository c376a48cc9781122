#!/bin/bash
# Round-5 queue C — serving ingest A/B: the saturated soak is bound by
# the host->device path on this machine (61.7 f/s vs 481.9 on pre-staged
# buffers), so measure the two product levers that attack it:
#   pipeline_depth=1 (overlap prep/H2D of batch t+1 with compute of t)
#   uint8 frames (real video sources; 4x less H2D than f32)
# at the default clip_len 48 and the low-latency clip_len 16 geometry.
set -u
LOG=${1:-/tmp/chip_experiments_r5c.jsonl}
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  echo "== $desc" >&2
  ( "$@" 2>"/tmp/chip_err_$desc.log" \
    || echo "{\"step\": \"$desc\", \"error\": true}" ) | tail -1 >> "$LOG"
  tail -3 "/tmp/chip_err_$desc.log" >&2 || true
}

for F in 48 16; do
  run "lat_f${F}_pipe" env BENCH_LATENCY=1 BENCH_FRAMES=$F \
    BENCH_LATENCY_PIPELINE=1 BENCH_SKIP_ORACLE=1 \
    timeout 3600 python bench.py
  run "lat_f${F}_u8" env BENCH_LATENCY=1 BENCH_FRAMES=$F \
    BENCH_LATENCY_DTYPE=uint8 BENCH_SKIP_ORACLE=1 \
    timeout 3600 python bench.py
  run "lat_f${F}_pipe_u8" env BENCH_LATENCY=1 BENCH_FRAMES=$F \
    BENCH_LATENCY_PIPELINE=1 BENCH_LATENCY_DTYPE=uint8 \
    BENCH_SKIP_ORACLE=1 timeout 3600 python bench.py
done

echo "done: $LOG" >&2
