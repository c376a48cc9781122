#!/bin/bash
# Round-4 queue, part 6: validate the NEW DEFAULTS end-to-end
#   1. headline `python bench.py` (now C=8 x F=48, reps=8, mm warp for
#      cascades) — must reproduce the 481.9 f/s / >=10.0x envelope line,
#   2. full BENCH_MATRIX refresh (b4 now runs the matmul warp kernel by
#      default) -> candidate BENCH_MATRIX_r04.jsonl,
#   3. b4 3-stream probe: does C=3 fit with bf16 glue + mm warp
#      (C=2 glue+mm = 136.1; C=4 glue+XLA-warp OOMs)?
set -u
LOG=${1:-/tmp/chip_experiments_r4g.jsonl}
MATRIX=/tmp/bench_matrix_r04_candidate.jsonl
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  echo "== $desc" >&2
  ( "$@" 2>"/tmp/chip_err_$desc.log" \
    || echo "{\"step\": \"$desc\", \"error\": true}" ) | tail -1 >> "$LOG"
  tail -3 "/tmp/chip_err_$desc.log" >&2 || true
}

run hl_defaults timeout 3600 python bench.py

echo "== matrix" >&2
timeout 7200 env BENCH_MATRIX=1 python bench.py > "$MATRIX" \
  2>/tmp/chip_err_matrix_r04.log \
  || echo '{"step": "matrix", "error": true}' >> "$LOG"
cat "$MATRIX" >> "$LOG"

run b4p_c3_glue_warp_mm env BENCH_CFG=flowtrack_posetrack \
  BENCH_FLOW=flownet2 BENCH_CLIPS=3 BENCH_GLUE_DTYPE=bfloat16 \
  timeout 3600 python bench.py

echo "done: $LOG" >&2
