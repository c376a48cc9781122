#!/bin/bash
# Round-5 queue D — clean on-chip re-capture of the warp VMEM boundary
# after the cap fix (32 MB -> Mosaic's measured 16 MB scoped limit; the
# first capture CRASHED at the then-admitted wp=640, which was the
# falsification that drove the fix).
set -u
LOG=${1:-/tmp/chip_experiments_r5d.jsonl}
cd "$(dirname "$0")/.."

timeout 3600 python benchmarks/probe_warp_boundary.py >> "$LOG" \
  2>/tmp/chip_err_warp_boundary_r5d.log \
  || echo '{"step": "warp_boundary_r5d", "error": true}' >> "$LOG"
tail -3 /tmp/chip_err_warp_boundary_r5d.log >&2 || true

echo "done: $LOG" >&2
