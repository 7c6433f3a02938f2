#!/bin/bash
# Round-2 chip queue, batch E: the v2 merge kernel (rolled fori loops,
# s-leading layouts, no width-1 lane slices — v1 was rejected by Mosaic
# with an 80 MB scoped-VMEM stack, see queue_r2c.log) — on-chip parity
# first, then the model-level A/Bs that batch C could not run.
# Waits for the r2d pid passed as $1.
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

stop() { [ -e .queue_stop_r2c ] && echo "=== STOPPED by .queue_stop_r2c $(date) ===" && exit 0; }

if [ -n "$1" ]; then
  echo "=== waiting for queue_r2d pid $1 $(date) ==="
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

stop; echo "=== [R2E-1] merge-kernel v2 parity probe on chip (fwd + Pallas bwd) $(date) ==="
timeout 3000 python scripts/parity_merge.py
stop; echo "=== [R2E-2] bench.py MLAFF_MERGE=pallas (mini fwd A/B) $(date) ==="
MLAFF_MERGE=pallas timeout 3600 python bench.py
stop; echo "=== [R2E-3] small fwd MLAFF_MERGE=pallas $(date) ==="
MLAFF_MERGE=pallas timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2E-4] mini_train MLAFF_MERGE=pallas (Pallas merge bwd) $(date) ==="
MLAFF_MERGE=pallas timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2E-5] mini_train MLAFF_MERGE=pallas, XLA merge bwd $(date) ==="
MLAFF_MERGE=pallas MLAFF_MERGE_BWD=xla timeout 5400 python scripts/bench_train.py mini_train
echo "=== queue_r2e done $(date) ==="
