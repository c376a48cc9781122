#!/bin/bash
# Round-4 queue, part 5: the MATMUL warp kernel (ops/warp.py
# _warp_kernel_mm — x-interp as a one-hot-matrix MXU contraction; built
# after the shift-accumulate kernel's dynamic_rotate hit three Mosaic
# limits on-chip) vs the shift kernel vs XLA:
#   1. the isolated 3-regime probe (both kernels now compile),
#   2. the b4 matrix config (R152@256x192 + FlowNet2) with the mm warp,
#   3. the 384x288 bf16-glue config with the mm warp,
#   4. 2-stream 256x192 with the mm warp.
set -u
LOG=${1:-/tmp/chip_experiments_r4f.jsonl}
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  echo "== $desc" >&2
  ( "$@" 2>"/tmp/chip_err_$desc.log" \
    || echo "{\"step\": \"$desc\", \"error\": true}" ) | tail -1 >> "$LOG"
  tail -3 "/tmp/chip_err_$desc.log" >&2 || true
}

echo "== probe_warp (xla / shift / matmul)" >&2
timeout 3600 python benchmarks/probe_warp.py >> "$LOG" \
  2>/tmp/chip_err_probe_warp.log \
  || echo '{"step": "probe_warp", "error": true}' >> "$LOG"

B4P="env BENCH_CFG=flowtrack_posetrack BENCH_FLOW=flownet2"
run b4p_warp_mm $B4P BENCH_CLIPS=1 BENCH_PALLAS_WARP=mm timeout 3600 python bench.py
run b4_384_glue_warp_mm env BENCH_CFG=coco_res152_384x288 BENCH_FLOW=flownet2 \
  BENCH_CLIPS=1 BENCH_GLUE_DTYPE=bfloat16 BENCH_PALLAS_WARP=mm \
  timeout 3600 python bench.py
run b4p_c2_glue_warp_mm $B4P BENCH_CLIPS=2 BENCH_GLUE_DTYPE=bfloat16 \
  BENCH_PALLAS_WARP=mm timeout 3600 python bench.py

# b4 stream scaling at 256x192 (2 streams measured 106.47 with bf16
# glue after the correlation vmap fix): does fp32 reference glue also
# fit 2 streams, and do 4 bf16-glue streams fit / win?
run b4p_c2_fp32 env BENCH_CFG=flowtrack_posetrack BENCH_FLOW=flownet2 \
  BENCH_CLIPS=2 timeout 3600 python bench.py
run b4p_c4_glue env BENCH_CFG=flowtrack_posetrack BENCH_FLOW=flownet2 \
  BENCH_CLIPS=4 BENCH_GLUE_DTYPE=bfloat16 timeout 3600 python bench.py

# continue the equal-HBM-budget stream-batching curve (c12_f32 = 478.67,
# the current best full-semantics point; target raw >= 479.5)
run c16_f24 env BENCH_CLIPS=16 BENCH_FRAMES=24 timeout 2400 python bench.py
run c14_f28 env BENCH_CLIPS=14 BENCH_FRAMES=28 timeout 2400 python bench.py
run c12_f32_reps8 env BENCH_CLIPS=12 BENCH_FRAMES=32 BENCH_REPS=8 timeout 2400 python bench.py

echo "done: $LOG" >&2
