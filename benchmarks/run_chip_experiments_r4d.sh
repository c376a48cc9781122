#!/bin/bash
# Round-4 queue, part 3: c8_f48 measured 477.67 f/s (vs 476.2 at the old
# C6/F64 default) and the HBM boundary sits at ~384-432 total in-flight
# frames — push the stream-batching curve further at constant frame
# budget for margin over the 10.0x envelope bound (need raw >= 479.5 so
# the claim survives unrounded arithmetic).
set -u
LOG=${1:-/tmp/chip_experiments_r4d.jsonl}
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  echo "== $desc" >&2
  ( "$@" 2>/tmp/chip_step_err.log || echo "{\"step\": \"$desc\", \"error\": true}" ) | tail -1 >> "$LOG"
  tail -3 /tmp/chip_step_err.log >&2 || true
}

run c10_f40 env BENCH_CLIPS=10 BENCH_FRAMES=40 timeout 2400 python bench.py
run c9_f42  env BENCH_CLIPS=9  BENCH_FRAMES=42 timeout 2400 python bench.py
run c12_f32 env BENCH_CLIPS=12 BENCH_FRAMES=32 timeout 2400 python bench.py
run c8_f52  env BENCH_CLIPS=8  BENCH_FRAMES=52 timeout 2400 python bench.py
run c7_f56  env BENCH_CLIPS=7  BENCH_FRAMES=56 timeout 2400 python bench.py

echo "done: $LOG" >&2
