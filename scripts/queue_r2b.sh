#!/bin/bash
# Round-2 chip queue, batch B (after queue_r2a.sh): the fused Pallas
# cluster-merge A/B (the main mini north-star lever — ~9.6 ms/iter of
# XLA merge glue in the r2 profile), then train refresh + remat A/Bs and
# the published-FPS preset table.
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

stop() { [ -e .queue_stop ] && echo "=== STOPPED by .queue_stop $(date) ===" && exit 0; }

if [ -n "$1" ]; then
  echo "=== waiting for queue_r2a pid $1 $(date) ==="
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

stop; echo "=== [R2B-0] parity_probe re-run: d_blank_v bwd-kernel fix $(date) ==="
timeout 3000 python scripts/parity_probe.py
stop; echo "=== [R2B-1] merge-kernel parity probe on chip $(date) ==="
timeout 3000 python scripts/parity_merge.py
stop; echo "=== [R2B-2] bench.py MLAFF_MERGE=pallas $(date) ==="
MLAFF_MERGE=pallas timeout 3000 python bench.py
stop; echo "=== [R2B-3] bench.py MLAFF_MERGE=pallas + WF ic (fallback paths) $(date) ==="
MLAFF_MERGE=pallas MLAFF_WF_MODE=ic timeout 3000 python bench.py
stop; echo "=== [R2B-3b] small fwd MLAFF_WF_MODE=einsum (1083-regression hypothesis: vpu default was never A/Bed on Small) $(date) ==="
MLAFF_WF_MODE=einsum timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2B-4] small fwd MLAFF_MERGE=pallas $(date) ==="
MLAFF_MERGE=pallas timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2B-5] mini_train refresh (MERGE=pallas) $(date) ==="
MLAFF_MERGE=pallas timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2B-6] mini_train baseline (MERGE=xla) $(date) ==="
timeout 5400 python scripts/bench_train.py mini_train
for preset in tiny mini_1_5th tiny_1_5th small_1_5th; do
  stop; echo "=== [R2B-7] fwd $preset $(date) ==="
  timeout 5400 python scripts/bench_train.py fwd "$preset"
done
stop; echo "=== [R2B-8] fwd base_22kto1k_384 $(date) ==="
timeout 7200 python scripts/bench_train.py fwd base_22kto1k_384
stop; echo "=== [R2B-9] mini_train REMAT=blocks $(date) ==="
MLAFF_BENCH_OPTS="TPU.REMAT blocks" timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2B-10] mini_train b512 REMAT=blocks (capacity) $(date) ==="
MLAFF_BATCH=512 MLAFF_BENCH_OPTS="TPU.REMAT blocks" timeout 5400 python scripts/bench_train.py mini_train
echo "=== queue_r2b done $(date) ==="
