#!/bin/bash
# Round-2 chip queue, batch O — compact-union re-probes after the
# block-unit starts fix (batch N's B1/B2b failed Mosaic's alignment
# proof with the old row-offset starts). Waits for the r2n script pid.
#
# Stop marker: .queue_stop_r2o
cd "$(dirname "$0")/.."
REPO=$PWD
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

stop() { [ -e "$REPO/.queue_stop_r2o" ] && echo "=== STOPPED by .queue_stop_r2o $(date) ===" && exit 0; }

if [ -n "$1" ]; then
  echo "=== waiting for queue_r2n pid $1 $(date) ==="
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

stop; echo "=== [R2O-1] parity_probe MLAFF_COMPACT=1 (block-unit starts) $(date) ==="
MLAFF_COMPACT=1 timeout 3000 python scripts/parity_probe.py
stop; echo "=== [R2O-2] stage1 kernel compact $(date) ==="
MLAFF_COMPACT=1 timeout 3000 python scripts/bench_stage1.py 128
stop; echo "=== [R2O-3] bench.py MLAFF_COMPACT=1 (model-level, if N-B3 predated the fix) $(date) ==="
MLAFF_COMPACT=1 timeout 3600 python bench.py
stop; echo "=== [R2O-4] small fwd MLAFF_COMPACT=1 $(date) ==="
MLAFF_COMPACT=1 timeout 3600 python scripts/bench_train.py fwd small
echo "=== queue_r2o done $(date) ==="
