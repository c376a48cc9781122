#!/bin/bash
# Relay watcher: probe the axon backend until it answers, then run the
# queued chip-experiment scripts passed as arguments (in order).
# Usage: relay_watch.sh run_chip_experiments_r5j.sh [more queues...]
# Probes are bounded (timeout 240) per CLAUDE.md outage guidance; the
# watcher gives up after MAX_WAIT_S of continuous outage.
set -u
cd "$(dirname "$0")/.."
MAX_WAIT_S=${MAX_WAIT_S:-28800}
SLEEP_S=${SLEEP_S:-600}
start=$(date +%s)
while true; do
  if timeout 240 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "relay up at $(date -u +%H:%M:%S)" >&2
    break
  fi
  now=$(date +%s)
  if [ $((now - start)) -gt "$MAX_WAIT_S" ]; then
    echo "relay still down after ${MAX_WAIT_S}s; giving up" >&2
    exit 1
  fi
  echo "relay down at $(date -u +%H:%M:%S); retry in ${SLEEP_S}s" >&2
  sleep "$SLEEP_S"
done
for q in "$@"; do
  echo "== queue $q" >&2
  bash "benchmarks/$q"
done
echo "relay_watch done" >&2
