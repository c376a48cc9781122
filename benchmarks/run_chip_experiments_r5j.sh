#!/bin/bash
# Round-5 queue J — refresh the two remaining pre-round-5 README e2e
# rows under current defaults (v3 warp, async-batched fetch):
#   1. single-stream headline config (BENCH_CLIPS=1) — README quotes
#      the r4 "419-424 f/s" figure.
#   2. R152@384x288 + FlowNetS clip path — README quotes 95.6 f/s from
#      an earlier round.
set -u
LOG=${1:-/tmp/chip_experiments_r5j.jsonl}
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  echo "== $desc" >&2
  ( "$@" 2>"/tmp/chip_err_$desc.log" \
    || echo "{\"step\": \"$desc\", \"error\": true}" ) | tail -1 >> "$LOG"
  tail -3 "/tmp/chip_err_$desc.log" >&2 || true
}

run e2e_single_stream env BENCH_CLIPS=1 BENCH_SKIP_ORACLE=1 \
  timeout 3600 python bench.py
run e2e_r152_384_flownets env BENCH_CFG=coco_res152_384x288 \
  BENCH_SKIP_ORACLE=1 timeout 3600 python bench.py


# informative extras (same queue window):
run lat_stream2_b4_u8 env BENCH_LATENCY=stream2 BENCH_LATENCY_DTYPE=uint8 \
  BENCH_CFG=flowtrack_posetrack BENCH_FLOW=flownet2 BENCH_SKIP_ORACLE=1 \
  timeout 3600 python bench.py
run train_refresh env BENCH_TRAIN=1 BENCH_SKIP_ORACLE=1 \
  timeout 3600 python bench.py
echo "done: $LOG" >&2
