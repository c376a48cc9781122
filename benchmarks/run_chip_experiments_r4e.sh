#!/bin/bash
# Round-4 queue, part 4: the Pallas warp kernel A/B at the b4 MATRIX
# config (flowtrack_posetrack = R152@256x192 + FlowNet2, round-3 line:
# 104.55 f/s / 25.8% MFU), 2-stream attempts at that resolution, and a
# full-traceback retry of the 384x288 fp32 baseline whose error was lost
# (hypothesis: C=1 HBM OOM -> re-raise, bf16 glue fits at 44.8 f/s).
# Per-step stderr is KEPT (/tmp/chip_err_<step>.log) — the shared
# chip_step_err.log overwrite is how b4_baseline's error got lost.
set -u
LOG=${1:-/tmp/chip_experiments_r4e.jsonl}
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  echo "== $desc" >&2
  ( "$@" 2>"/tmp/chip_err_$desc.log" \
    || echo "{\"step\": \"$desc\", \"error\": true}" ) | tail -1 >> "$LOG"
  tail -3 "/tmp/chip_err_$desc.log" >&2 || true
}

B4P="env BENCH_CFG=flowtrack_posetrack BENCH_FLOW=flownet2"

# A/B that decides VERDICT item 3 (same config as the matrix b4 line)
run b4p_baseline $B4P BENCH_CLIPS=1 timeout 3000 python bench.py
run b4p_warp     $B4P BENCH_CLIPS=1 BENCH_PALLAS_WARP=1 timeout 3600 python bench.py

# 2 streams at 256x192 (VERDICT item 4 follow-up; 384x288 needs bf16 glue)
run b4p_c2_glue      $B4P BENCH_CLIPS=2 BENCH_GLUE_DTYPE=bfloat16 timeout 3600 python bench.py
run b4p_c2_glue_warp $B4P BENCH_CLIPS=2 BENCH_GLUE_DTYPE=bfloat16 BENCH_PALLAS_WARP=1 timeout 3600 python bench.py

# 384x288 2-stream retry: r4b's "exceeded HBM" at C=2 was actually the
# vmapped-correlation Pallas lowering error masked by the loose OOM
# matcher (both fixed) — C=2 at 384x288 has never been truly HBM-tested
run b4_384_c2_glue_retry env BENCH_CFG=coco_res152_384x288 BENCH_FLOW=flownet2 \
  BENCH_CLIPS=2 BENCH_GLUE_DTYPE=bfloat16 timeout 3600 python bench.py

# 384x288 bf16-glue + warp kernel at C=1 — the direct A/B against
# b4_glue_bf16's 44.83 f/s (the r4b attempt died on bf16 tpu.dynamic_rotate;
# fixed via the f32-round-trip lane rotate in ops/warp.py)
run b4_384_glue_warp env BENCH_CFG=coco_res152_384x288 BENCH_FLOW=flownet2 \
  BENCH_CLIPS=1 BENCH_GLUE_DTYPE=bfloat16 BENCH_PALLAS_WARP=1 \
  timeout 3600 python bench.py

# the lost error, with full traceback this time
run b4_384_fp32_err env BENCH_CFG=coco_res152_384x288 BENCH_FLOW=flownet2 \
  BENCH_CLIPS=1 JAX_TRACEBACK_FILTERING=off timeout 3000 python bench.py

# does per-rep relay dispatch/readback depress the 3-rep figure? If the
# 8-rep number is higher, steady state was under-measured (serving runs
# an unbroken clip stream; this is protocol honesty, not a code change)
run hl_c6_reps8 env BENCH_REPS=8 timeout 2400 python bench.py
run hl_c8f48_reps8 env BENCH_CLIPS=8 BENCH_FRAMES=48 BENCH_REPS=8 timeout 2400 python bench.py

echo "done: $LOG" >&2
