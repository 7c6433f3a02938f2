#!/bin/bash
# Round-2 chip queue, batch R — WSTACK (stage-1 row stacking) A/Bs.
# Waits for the r2q script pid passed as $1.
# Stop marker: .queue_stop_r2r
cd "$(dirname "$0")/.."
REPO=$PWD
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon
stop() { [ -e "$REPO/.queue_stop_r2r" ] && echo "=== STOPPED by .queue_stop_r2r $(date) ===" && exit 0; }
if [ -n "$1" ]; then
  echo "=== waiting for queue_r2q pid $1 $(date) ==="
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
stop; echo "=== [R2R-1] mini fwd MLAFF_WSTACK=2 $(date) ==="
MLAFF_WSTACK=2 timeout 3600 python bench.py
stop; echo "=== [R2R-2] mini fwd MLAFF_WSTACK=4 $(date) ==="
MLAFF_WSTACK=4 timeout 3600 python bench.py
stop; echo "=== [R2R-3] small fwd MLAFF_WSTACK=2 $(date) ==="
MLAFF_WSTACK=2 timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2R-4] mini fwd STACK_NMAX=800 GB_CAP=2 (fit scoped vmem) $(date) ==="
MLAFF_STACK_NMAX=800 MLAFF_STACK_GB=2 timeout 3600 python bench.py
stop; echo "=== [R2R-5] small fwd STACK_NMAX=800 GB_CAP=2 $(date) ==="
MLAFF_STACK_NMAX=800 MLAFF_STACK_GB=2 timeout 3600 python scripts/bench_train.py fwd small
echo "=== queue_r2r done $(date) ==="
