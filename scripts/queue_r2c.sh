#!/bin/bash
# Round-2 chip queue, batch C — reprioritized replacement for queue_r2b:
# the fused Pallas cluster-merge A/B (the main mini north-star lever,
# ~9.6 ms/iter of XLA merge glue in the r2 profile) runs FIRST, then the
# Small-regression WF hypothesis, train refreshes, the MaskFiner-UD train
# bench (moved here from r2a), the published-FPS preset table, and the
# remat A/Bs. Waits for the r2a worker pid passed as $1.
#
# Stop marker: .queue_stop_r2c (r2a's .queue_stop was used to stop r2a
# after its in-flight item and is cleared here once r2a is gone).
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

stop() { [ -e .queue_stop_r2c ] && echo "=== STOPPED by .queue_stop_r2c $(date) ===" && exit 0; }

if [ -n "$1" ]; then
  echo "=== waiting for queue_r2a pid $1 $(date) ==="
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
rm -f .queue_stop  # was set solely to stop r2a after its current item

stop; echo "=== [R2C-1] merge-kernel parity probe on chip (fwd + Pallas bwd) $(date) ==="
timeout 3000 python scripts/parity_merge.py
stop; echo "=== [R2C-2] bench.py MLAFF_MERGE=pallas $(date) ==="
MLAFF_MERGE=pallas timeout 3600 python bench.py
stop; echo "=== [R2C-3] bench.py MLAFF_MERGE=pallas + WF ic (fallback paths) $(date) ==="
MLAFF_MERGE=pallas MLAFF_WF_MODE=ic timeout 3000 python bench.py
stop; echo "=== [R2C-4] small fwd MLAFF_WF_MODE=einsum (1083-regression hypothesis) $(date) ==="
MLAFF_WF_MODE=einsum timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2C-5] small fwd MLAFF_MERGE=pallas $(date) ==="
MLAFF_MERGE=pallas timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2C-6] parity_probe re-run: d_blank_v bwd-kernel fix $(date) ==="
timeout 3000 python scripts/parity_probe.py
stop; echo "=== [R2C-7] mini_train refresh (MERGE=pallas, Pallas merge bwd) $(date) ==="
MLAFF_MERGE=pallas timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2C-8] mini_train baseline (MERGE=xla) $(date) ==="
timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2C-9] maskfiner_ud train b32 (moved from r2a) $(date) ==="
timeout 7200 python scripts/bench_maskfiner.py 32 train
for preset in tiny mini_1_5th tiny_1_5th small_1_5th; do
  stop; echo "=== [R2C-10] fwd $preset $(date) ==="
  timeout 5400 python scripts/bench_train.py fwd "$preset"
done
stop; echo "=== [R2C-11] fwd base_22kto1k_384 $(date) ==="
timeout 7200 python scripts/bench_train.py fwd base_22kto1k_384
stop; echo "=== [R2C-12] mini_train REMAT=blocks $(date) ==="
MLAFF_BENCH_OPTS="TPU.REMAT blocks" timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2C-13] mini_train b512 REMAT=blocks (capacity) $(date) ==="
MLAFF_BATCH=512 MLAFF_BENCH_OPTS="TPU.REMAT blocks" timeout 5400 python scripts/bench_train.py mini_train
echo "=== queue_r2c done $(date) ==="
