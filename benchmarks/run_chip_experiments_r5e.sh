#!/bin/bash
# Round-5 queue E — warp kernel construction A/B. The r5 trace attributes
# 21.8% of the b4 device program to the mm warp kernel, and its cost is
# the O(bh*wp^2) VPU a_mat construction, not the MXU dots. Candidates:
#   v3  = relu(1-|i-sx|) closed-form weights (4 f32 elementwise ops vs
#         int iota + 2 compares + 2 selects + add)
#   S32 = _WARP_MM_CHUNK 32 (packed dot M=120 vs 72 — same single
#         systolic pass, half the chunks for wide-dy flows)
# Microbench at both cascade shapes + e2e b4; keep the winner as default.
set -u
LOG=${1:-/tmp/chip_experiments_r5e.jsonl}
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  echo "== $desc" >&2
  ( "$@" 2>"/tmp/chip_err_$desc.log" \
    || echo "{\"step\": \"$desc\", \"error\": true}" ) | tail -1 >> "$LOG"
  tail -3 "/tmp/chip_err_$desc.log" >&2 || true
}

# microbench: all impls (incl. v3) at 384x288 and at b4's 256x192
for HW in "384 288" "256 192"; do
  set -- $HW
  echo "== probe_warp ${1}x${2}" >&2
  env PROBE_WARP_H=$1 PROBE_WARP_W=$2 timeout 3600 \
    python benchmarks/probe_warp.py >> "$LOG" \
    2>"/tmp/chip_err_probe_warp_$1.log" \
    || echo "{\"step\": \"probe_warp_$1\", \"error\": true}" >> "$LOG"
  tail -3 "/tmp/chip_err_probe_warp_$1.log" >&2 || true
done

# chunk-32 microbench (mm rows are the ones that move)
run probe_warp_s32 env FLOWTRACK_WARP_MM_CHUNK=32 PROBE_WARP_H=256 \
  PROBE_WARP_W=192 timeout 3600 python benchmarks/probe_warp.py

# e2e b4 with v3 weights (compare vs same-session 165.55 baseline, r5b)
run b4_v3 env BENCH_CFG=flowtrack_posetrack BENCH_FLOW=flownet2 \
  FLOWTRACK_WARP_MM_WEIGHTS=v3 BENCH_SKIP_ORACLE=1 \
  timeout 3600 python bench.py

echo "done: $LOG" >&2
