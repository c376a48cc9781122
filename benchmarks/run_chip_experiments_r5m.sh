#!/bin/bash
# Round-5 queue M — refresh the two remaining round-2-era README perf
# rows with same-session captures under the final round-5 defaults, and
# re-validate the on-chip accuracy closed loop:
#   1. train_b32 / train_b128: donated-jit train-step samples/s (README
#      "Training throughput" row dates to round 2: 1939 / 2199).
#   2. r152_384_clip: ResNet-152 @384x288 + FlowNetS whole-clip tracking
#      (README table row "95.6 frames/s" is the round-2 capture; current
#      defaults batch independent streams and auto-halve on OOM).
#   3. acc_decode: BENCH_ACCURACY=1 closed loop (AP + decode round-trip
#      error on the real chip).
set -u
LOG=${1:-/tmp/chip_experiments_r5m.jsonl}
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  echo "== $desc" >&2
  ( "$@" 2>"/tmp/chip_err_$desc.log" \
    || echo "{\"step\": \"$desc\", \"error\": true}" ) | tail -1 >> "$LOG"
  tail -3 "/tmp/chip_err_$desc.log" >&2 || true
}

run train_b32 env BENCH_TRAIN=1 BENCH_TRAIN_BATCH=32 BENCH_SKIP_ORACLE=1 \
  timeout 3600 python bench.py
run train_b128 env BENCH_TRAIN=1 BENCH_TRAIN_BATCH=128 BENCH_SKIP_ORACLE=1 \
  timeout 3600 python bench.py
run r152_384_clip env BENCH_CFG=coco_res152_384x288 BENCH_SKIP_ORACLE=1 \
  timeout 3600 python bench.py
run acc_decode env BENCH_ACCURACY=1 BENCH_SKIP_ORACLE=1 \
  timeout 3600 python bench.py
echo "done: $LOG" >&2
