#!/bin/bash
# Round-5 queue K — stragglers after the 2026-08-20 relay outage:
#   1. lat_f4x8_u8: the clip_len=4 x 8-stream latency point (lost from
#      queue r5i) — fills the 2..8 gap in the clip_len sweep's low end.
#   2. headline_defaults: plain `python bench.py` under the committed
#      defaults (v3 warp weights + async-batched fetch landed since the
#      last default-invocation capture) — same-session confirmation of
#      the driver's end-of-round invocation.
set -u
LOG=${1:-/tmp/chip_experiments_r5k.jsonl}
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  echo "== $desc" >&2
  ( "$@" 2>"/tmp/chip_err_$desc.log" \
    || echo "{\"step\": \"$desc\", \"error\": true}" ) | tail -1 >> "$LOG"
  tail -3 "/tmp/chip_err_$desc.log" >&2 || true
}

run lat_f4x8_u8_saturated env BENCH_LATENCY=1 BENCH_FRAMES=4 \
  BENCH_CLIPS=8 BENCH_LATENCY_CLIPS=24 BENCH_LATENCY_DTYPE=uint8 \
  BENCH_SKIP_ORACLE=1 timeout 3600 python bench.py
run headline_defaults env BENCH_SKIP_ORACLE=1 timeout 3600 python bench.py
echo "done: $LOG" >&2
