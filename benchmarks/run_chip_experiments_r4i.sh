#!/bin/bash
# Round-4 queue, part 8 (after the packed-dy warp kernel landed):
#   1. 384x288 R152+FlowNet2 bf16-glue with the v2 kernel (was 52.5 with
#      v1; isolated warp 2.4x faster at cascade statistics),
#   2. BENCH_MATRIX refresh so the b4 line carries the v2 number,
#   3. fresh b4 device trace for the post-fix attribution record.
set -u
LOG=${1:-/tmp/chip_experiments_r4i.jsonl}
MATRIX=/tmp/bench_matrix_r04b_candidate.jsonl
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  echo "== $desc" >&2
  ( "$@" 2>"/tmp/chip_err_$desc.log" \
    || echo "{\"step\": \"$desc\", \"error\": true}" ) | tail -1 >> "$LOG"
  tail -3 "/tmp/chip_err_$desc.log" >&2 || true
}

run b4_384_glue_mm_v2 env BENCH_CFG=coco_res152_384x288 BENCH_FLOW=flownet2 \
  BENCH_CLIPS=1 BENCH_GLUE_DTYPE=bfloat16 timeout 3600 python bench.py

echo "== matrix" >&2
timeout 7200 env BENCH_MATRIX=1 python bench.py > "$MATRIX" \
  2>/tmp/chip_err_matrix_r04b.log \
  || echo '{"step": "matrix", "error": true}' >> "$LOG"
cat "$MATRIX" >> "$LOG"

echo "== trace_b4_v2" >&2
env BENCH_CFG=flowtrack_posetrack BENCH_FLOW=flownet2 \
  TRACE_DIR=/tmp/trace_b4_v2 timeout 3600 \
  python benchmarks/probe_trace.py > /tmp/trace_b4_v2.out \
  2>/tmp/chip_err_trace_b4_v2.log \
  || echo '{"step": "trace_b4_v2", "error": true}' >> "$LOG"

echo "done: $LOG" >&2
