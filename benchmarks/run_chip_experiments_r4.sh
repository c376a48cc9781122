#!/bin/bash
# Round-4 on-chip queue: clear the 10.0x conservative GPU-envelope bound
# (VERDICT round-3 item 2; headline 476.7 f/s = 9.9x the V100@60% bound,
# needs +2-3%). Leads named by the verdict, in cheap-first order:
#   - F=96 (the 64/128 bracket straddles the optimum: 477 vs 461)
#   - C=7 with pose_chunk 192/256 (C=7 unchunked OOMs by a sliver;
#     only chunk=128 was ever tried)
# Run from /root/repo. Each step appends one JSON line to the log.
set -u
LOG=${1:-/tmp/chip_experiments_r4.jsonl}
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  echo "== $desc" >&2
  ( "$@" 2>/tmp/chip_step_err.log || echo "{\"step\": \"$desc\", \"error\": true}" ) | tail -1 >> "$LOG"
  tail -3 /tmp/chip_step_err.log >&2 || true
}

# 0. baseline headline (C=6, F=64, no chunking) — regression check vs 476.7
run baseline_c6 timeout 2400 python bench.py

# 1. clip-length bracket: F=96 at the headline C
run c6_f96 env BENCH_FRAMES=96 timeout 2400 python bench.py

# 2. C=7 with coarser pose chunks (192: two chunks of the 7*8*2=112... the
#    pose batch per frame-group is C*P*2=112 flip-doubled persons; chunk
#    sizes are in persons — 192/256 halve the lax.map trip count vs 128)
run c7_chunk192 env BENCH_CLIPS=7 BENCH_POSE_CHUNK=192 timeout 2400 python bench.py
run c7_chunk256 env BENCH_CLIPS=7 BENCH_POSE_CHUNK=256 timeout 2400 python bench.py

# 3. combine the winners if both move: F=96 x C=7
run c7_f96_chunk256 env BENCH_CLIPS=7 BENCH_FRAMES=96 BENCH_POSE_CHUNK=256 timeout 2400 python bench.py

echo "done: $LOG" >&2
