#!/bin/bash
# Round-5 queue G — host-fetch strategy A/B + the fused streaming mode.
#   1. probe_fetch: seq vs async-batched (new default) vs packed-single-
#      buffer readback of the five clip-output leaves.
#   2. BENCH_LATENCY=stream2 (fused clip_len=2 per-frame step), f32 and
#      uint8 — candidate replacement for the host-orchestrated
#      "streaming" README row (122.8 ms p50).
#   3. Refreshed saturated low-latency serving rows (f8/f16 + uint8)
#      under the async-batched fetch.
set -u
LOG=${1:-/tmp/chip_experiments_r5g.jsonl}
cd "$(dirname "$0")/.."

run() {
  desc=$1; shift
  echo "== $desc" >&2
  ( "$@" 2>"/tmp/chip_err_$desc.log" \
    || echo "{\"step\": \"$desc\", \"error\": true}" ) | tail -1 >> "$LOG"
  tail -3 "/tmp/chip_err_$desc.log" >&2 || true
}

run probe_fetch timeout 1800 python benchmarks/probe_fetch.py
# probe_fetch prints 3 lines but run() tails 1 — re-grab them all:
timeout 1800 python benchmarks/probe_fetch.py > /tmp/probe_fetch_full.jsonl \
  2>/dev/null || true

run lat_stream2_f32 env BENCH_LATENCY=stream2 BENCH_SKIP_ORACLE=1 \
  timeout 3600 python bench.py
run lat_stream2_u8 env BENCH_LATENCY=stream2 BENCH_LATENCY_DTYPE=uint8 \
  BENCH_SKIP_ORACLE=1 timeout 3600 python bench.py
for F in 8 16; do
  run "lat_f${F}_u8_batchedfetch" env BENCH_LATENCY=1 BENCH_FRAMES=$F \
    BENCH_LATENCY_DTYPE=uint8 BENCH_SKIP_ORACLE=1 \
    timeout 3600 python bench.py
done
echo "done: $LOG" >&2
