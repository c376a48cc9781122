#!/bin/bash
# Round-5 queue I — fused MULTI-stream low latency: clip_len=2 x 8
# streams (one fused call per frame round, every stream's frame emits
# with ~zero clip-fill wait). Candidate sustained real-time layout:
# if one 8-clip 2-frame call beats 33 ms, 8x30 fps holds with ~100 ms
# p50 — measure saturated capacity first, then the paced row.
set -u
LOG=${1:-/tmp/chip_experiments_r5i.jsonl}
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  echo "== $desc" >&2
  ( "$@" 2>"/tmp/chip_err_$desc.log" \
    || echo "{\"step\": \"$desc\", \"error\": true}" ) | tail -1 >> "$LOG"
  tail -3 "/tmp/chip_err_$desc.log" >&2 || true
}

run lat_f2x8_u8_saturated env BENCH_LATENCY=1 BENCH_FRAMES=2 \
  BENCH_CLIPS=8 BENCH_LATENCY_CLIPS=48 BENCH_LATENCY_DTYPE=uint8 \
  BENCH_SKIP_ORACLE=1 timeout 3600 python bench.py
run lat_f2x8_u8_paced30 env BENCH_LATENCY=1 BENCH_FRAMES=2 \
  BENCH_CLIPS=8 BENCH_LATENCY_CLIPS=48 BENCH_LATENCY_PACE_FPS=30 \
  BENCH_LATENCY_DTYPE=uint8 BENCH_SKIP_ORACLE=1 timeout 3600 python bench.py
run lat_f4x8_u8_saturated env BENCH_LATENCY=1 BENCH_FRAMES=4 \
  BENCH_CLIPS=8 BENCH_LATENCY_CLIPS=24 BENCH_LATENCY_DTYPE=uint8 \
  BENCH_SKIP_ORACLE=1 timeout 3600 python bench.py
echo "done: $LOG" >&2
