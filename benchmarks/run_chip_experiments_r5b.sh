#!/bin/bash
# Round-5 queue B — attack the b4 gap the r5 per-stage trace attributed
# (pose R152 = 56.5% of the device program, 87% of conv time; warps 22%;
# cascade's own convs <10%):
#   1. p0: isolated R152@256x192 pose MFU at batches 256/1024 — is the
#      pose net at its shape ceiling inside b4 or being degraded?
#   2. b4 with the BN-FOLDED pose path (BENCH_QUANT=folded): XLA fuses
#      inference BN into epilogues, but folding removes the scale/shift
#      entirely — measure whether any of the r4 trace's 6.4% BN glue is
#      recoverable end-to-end.
#   3. b4 headline re-run for the same-session baseline.
set -u
LOG=${1:-/tmp/chip_experiments_r5b.jsonl}
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  echo "== $desc" >&2
  ( "$@" 2>"/tmp/chip_err_$desc.log" \
    || echo "{\"step\": \"$desc\", \"error\": true}" ) | tail -1 >> "$LOG"
  tail -3 "/tmp/chip_err_$desc.log" >&2 || true
}

run p0_b256 env BENCH_MATRIX=1 BENCH_MATRIX_ONLY=p0 \
  timeout 3600 python bench.py
run p0_b1024 env BENCH_MATRIX=1 BENCH_MATRIX_ONLY=p0 \
  BENCH_MATRIX_BATCH=1024 timeout 3600 python bench.py
run b4_baseline env BENCH_CFG=flowtrack_posetrack BENCH_FLOW=flownet2 \
  BENCH_SKIP_ORACLE=1 timeout 3600 python bench.py
run b4_folded env BENCH_CFG=flowtrack_posetrack BENCH_FLOW=flownet2 \
  BENCH_QUANT=folded BENCH_SKIP_ORACLE=1 timeout 3600 python bench.py

echo "done: $LOG" >&2
