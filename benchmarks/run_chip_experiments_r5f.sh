#!/bin/bash
# Round-5 queue F — re-capture the b4 family matrix lines under the v3
# (closed-form relu) warp weight default adopted after the r5e A/B
# (benchmarks/PROBE_WARP_AB_r05.jsonl). b0-b3 don't touch the warp and
# keep their r5 capture.
set -u
LOG=${1:-/tmp/chip_experiments_r5f.jsonl}
cd "$(dirname "$0")/.."
env BENCH_MATRIX=1 BENCH_MATRIX_ONLY=b4 timeout 7200 python bench.py \
  >> "$LOG" 2>/tmp/chip_err_matrix_r5f.log \
  || echo '{"step": "matrix_b4_r5f", "error": true}' >> "$LOG"
tail -3 /tmp/chip_err_matrix_r5f.log >&2 || true
echo "done: $LOG" >&2
