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

# Real-time serving latency: paced 30 fps at the low-latency clip
# geometries with the production ingest levers (pipelined dispatch +
# uint8 frame transport) — the row a serving user actually runs.
run() {
  desc=$1; shift
  echo "== $desc" >&2
  ( "$@" 2>"/tmp/chip_err_$desc.log" \
    || echo "{\"step\": \"$desc\", \"error\": true}" ) | tail -1 >> "$LOG"
  tail -3 "/tmp/chip_err_$desc.log" >&2 || true
}
for F in 8 16; do
  run "lat_f${F}_paced30_pipe_u8" env BENCH_LATENCY=1 BENCH_FRAMES=$F \
    BENCH_LATENCY_PACE_FPS=30 BENCH_LATENCY_PIPELINE=1 \
    BENCH_LATENCY_DTYPE=uint8 BENCH_SKIP_ORACLE=1 \
    timeout 3600 python bench.py
done

echo "done: $LOG" >&2
