#!/bin/bash
# Round-4 queue, part 10: outer-scan unroll A/B on the headline config.
# The recovery-generation and id-chain scans now take unroll=
# FLOWTRACK_SCAN_UNROLL (default 4). Prior with unroll=1 outer +
# unrolled inner greedy-match: 489.4 f/s.
set -u
LOG=${1:-/tmp/chip_experiments_r4k.jsonl}
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  echo "== $desc" >&2
  ( "$@" 2>"/tmp/chip_err_$desc.log" \
    || echo "{\"step\": \"$desc\", \"error\": true}" ) | tail -1 >> "$LOG"
  tail -3 "/tmp/chip_err_$desc.log" >&2 || true
}

run hl_unroll4 timeout 3600 python bench.py
run hl_unroll8 env FLOWTRACK_SCAN_UNROLL=8 timeout 3600 python bench.py
run b4_unroll4 env BENCH_CFG=flowtrack_posetrack BENCH_FLOW=flownet2 \
  BENCH_CLIPS=1 timeout 3600 python bench.py

echo "done: $LOG" >&2
