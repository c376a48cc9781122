#!/bin/bash
# Round-4 queue, part 2.
#  A. 10.0x leads (cont.): equal-HBM clip geometries (C*F ~ 384-432 frames
#     in flight — the C6/F64 baseline's budget) trade per-clip dispatch
#     amortization against stream-batching MFU; plus the recovery-pass
#     ablation as a cost DIAGNOSTIC (not a headline candidate — recovery
#     is reference semantics).
#  B. b4 (R152 + FlowNet2 @384x288): the Pallas warp kernel on-chip, the
#     bf16 cascade glue, and whether glue+warp admit 2 batched streams.
#  C. HBM breakdowns (memory_analysis, compile-only) for the headline and
#     b4 programs at 1/2 streams -> STATUS table.
set -u
LOG=${1:-/tmp/chip_experiments_r4b.jsonl}
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  echo "== $desc" >&2
  ( "$@" 2>/tmp/chip_step_err.log || echo "{\"step\": \"$desc\", \"error\": true}" ) | tail -1 >> "$LOG"
  tail -3 /tmp/chip_step_err.log >&2 || true
}

# A. equal-budget geometries
run c4_f96  env BENCH_CLIPS=4 BENCH_FRAMES=96 timeout 2400 python bench.py
run c8_f48  env BENCH_CLIPS=8 BENCH_FRAMES=48 timeout 2400 python bench.py
run c6_f72  env BENCH_CLIPS=6 BENCH_FRAMES=72 timeout 2400 python bench.py
run c5_f80  env BENCH_CLIPS=5 BENCH_FRAMES=80 timeout 2400 python bench.py
# diagnostic only: what the recovery pass costs at the headline config
run c6_norecover env BENCH_RECOVER=0 timeout 2400 python bench.py

# B. b4 cascade variants (single stream first: kernel vs XLA gather)
B4="env BENCH_CFG=coco_res152_384x288 BENCH_FLOW=flownet2"
run b4_baseline      $B4 BENCH_CLIPS=1 timeout 3000 python bench.py
run b4_pallas_warp   $B4 BENCH_CLIPS=1 BENCH_PALLAS_WARP=1 timeout 3600 python bench.py
run b4_glue_bf16     $B4 BENCH_CLIPS=1 BENCH_GLUE_DTYPE=bfloat16 timeout 3000 python bench.py
# 2-stream attempts (bench halves C on OOM, so a fit shows streams=2)
run b4_c2_glue       $B4 BENCH_CLIPS=2 BENCH_GLUE_DTYPE=bfloat16 timeout 3600 python bench.py
run b4_c2_glue_warp  $B4 BENCH_CLIPS=2 BENCH_GLUE_DTYPE=bfloat16 BENCH_PALLAS_WARP=1 timeout 3600 python bench.py

# C. HBM breakdowns (compile-only; append every JSON line)
echo "== breakdown headline" >&2
env BREAKDOWN_CLIPS=1,6,7 timeout 3000 python benchmarks/hbm_breakdown.py \
  >> "$LOG" 2>>/tmp/chip_step_err.log || echo '{"step": "breakdown_headline", "error": true}' >> "$LOG"
echo "== breakdown b4" >&2
env BENCH_CFG=coco_res152_384x288 BENCH_FLOW=flownet2 BREAKDOWN_CLIPS=1,2 \
  timeout 3000 python benchmarks/hbm_breakdown.py \
  >> "$LOG" 2>>/tmp/chip_step_err.log || echo '{"step": "breakdown_b4", "error": true}' >> "$LOG"
echo "== breakdown b4 glue" >&2
env BENCH_CFG=coco_res152_384x288 BENCH_FLOW=flownet2 BENCH_GLUE_DTYPE=bfloat16 \
  BREAKDOWN_CLIPS=2 timeout 3000 python benchmarks/hbm_breakdown.py \
  >> "$LOG" 2>>/tmp/chip_step_err.log || echo '{"step": "breakdown_b4_glue", "error": true}' >> "$LOG"

echo "done: $LOG" >&2
