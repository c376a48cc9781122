#!/bin/bash
# Round-5 queue L — locate the PACED real-time capacity boundary.
#
# The committed capacity numbers (BENCH_LATENCY_r05.jsonl) show every
# 8-stream layout lands BELOW the 8 x 30 fps = 240 f/s aggregate input
# rate on this relay host (best: 153-173 f/s at clip_len 48 uint8), so
# no clip_len sustains 8 paced 30-fps streams here. Per-call cost
# arithmetic on those measurements predicts the boundary: a 2-stream
# clip_len-16 batch moves 32 fresh frames/call (~0.39 s measured at the
# same frame count, f4x8) against a 533 ms fill period -> SUSTAINS with
# ~28% headroom; 4 streams move 64 frames/call (~0.73 s, f8x8 analogy)
# -> falls behind. This queue measures both paced rows to pin the
# boundary with data instead of arithmetic.
set -u
LOG=${1:-/tmp/chip_experiments_r5l.jsonl}
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  echo "== $desc" >&2
  ( "$@" 2>"/tmp/chip_err_$desc.log" \
    || echo "{\"step\": \"$desc\", \"error\": true}" ) | tail -1 >> "$LOG"
  tail -3 "/tmp/chip_err_$desc.log" >&2 || true
}

run lat_f16x2_u8_paced30 env BENCH_LATENCY=1 BENCH_FRAMES=16 \
  BENCH_CLIPS=2 BENCH_LATENCY_PACE_FPS=30 BENCH_LATENCY_CLIPS=24 \
  BENCH_LATENCY_DTYPE=uint8 BENCH_SKIP_ORACLE=1 timeout 3600 python bench.py
run lat_f16x4_u8_paced30 env BENCH_LATENCY=1 BENCH_FRAMES=16 \
  BENCH_CLIPS=4 BENCH_LATENCY_PACE_FPS=30 BENCH_LATENCY_CLIPS=24 \
  BENCH_LATENCY_DTYPE=uint8 BENCH_SKIP_ORACLE=1 timeout 3600 python bench.py
echo "done: $LOG" >&2
