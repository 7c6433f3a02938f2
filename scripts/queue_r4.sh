#!/bin/bash
# Fourth chip queue link: fill in the vs-V100 forward table for every
# preset the reference publishes FPS for (BASELINE.md / SURVEY §6) —
# PERF.md only has Mini/Small so far — plus the Base 22kto1k @384 model
# (no published FPS; high-res clustering stress config in BASELINE.json).
# Waits on pid $1 if given.
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

for preset in tiny mini_1_5th tiny_1_5th small_1_5th; do
  echo "=== fwd $preset $(date) ==="
  timeout 5400 python scripts/bench_train.py fwd "$preset"
done
echo "=== fwd base_22kto1k_384 $(date) ==="
timeout 7200 python scripts/bench_train.py fwd base_22kto1k_384
echo "=== queue_r4 done $(date) ==="
