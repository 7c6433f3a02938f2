#!/bin/bash
# Round-2 chip queue, batch F — REPRIORITIZED replacement for the tail of
# r2c + r2d + r2e (those were stopped via .queue_stop_r2c after r2c's
# in-flight MaskFiner-UD train bench finished): the merge-kernel v2 A/Bs
# (the #1 north-star lever) run FIRST, then the MaskFiner fwd retry, the
# compact/banded window A/Bs, the published-FPS preset table, the remat
# capacity runs, and one protocol A/B to explain the mini_train 874->777
# delta. Waits for the r2e shell pid passed as $1.
#
# Stop marker: .queue_stop_r2f
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

stop() { [ -e .queue_stop_r2f ] && echo "=== STOPPED by .queue_stop_r2f $(date) ===" && exit 0; }

if [ -n "$1" ]; then
  echo "=== waiting for queue_r2e pid $1 $(date) ==="
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
rm -f .queue_stop_r2c  # was set solely to retire the r2c/r2d/r2e chain

stop; echo "=== [R2F-1] merge-kernel v2 parity probe on chip (fwd + Pallas bwd) $(date) ==="
timeout 3000 python scripts/parity_merge.py
stop; echo "=== [R2F-2] bench.py MLAFF_MERGE=pallas (mini fwd A/B, north star) $(date) ==="
MLAFF_MERGE=pallas timeout 3600 python bench.py
stop; echo "=== [R2F-3] small fwd MLAFF_MERGE=pallas $(date) ==="
MLAFF_MERGE=pallas timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2F-4] mini_train MLAFF_MERGE=pallas (Pallas merge bwd) $(date) ==="
MLAFF_MERGE=pallas timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2F-5] mini_train MLAFF_MERGE=pallas, XLA merge bwd $(date) ==="
MLAFF_MERGE=pallas MLAFF_MERGE_BWD=xla timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2F-6] maskfiner_ud fwd b64 retry (sub-compiles cached) $(date) ==="
timeout 5400 python scripts/bench_maskfiner.py 64
stop; echo "=== [R2F-7] parity_probe MLAFF_COMPACT=1 (Mosaic numerics before benching) $(date) ==="
MLAFF_COMPACT=1 timeout 3000 python scripts/parity_probe.py
stop; echo "=== [R2F-8] stage1 kernel bench: window baseline $(date) ==="
timeout 3000 python scripts/bench_stage1.py 128
stop; echo "=== [R2F-8b] compact $(date) ==="
MLAFF_COMPACT=1 timeout 3000 python scripts/bench_stage1.py 128
stop; echo "=== [R2F-8c] bands $(date) ==="
MLAFF_BANDS=1 timeout 3000 python scripts/bench_stage1.py 128
stop; echo "=== [R2F-9] bench.py MLAFF_COMPACT=1 (model-level, only meaningful if 8b won) $(date) ==="
MLAFF_COMPACT=1 timeout 3600 python bench.py
for preset in tiny mini_1_5th tiny_1_5th small_1_5th; do
  stop; echo "=== [R2F-10] fwd $preset $(date) ==="
  timeout 5400 python scripts/bench_train.py fwd "$preset"
done
stop; echo "=== [R2F-11] fwd base_22kto1k_384 $(date) ==="
timeout 7200 python scripts/bench_train.py fwd base_22kto1k_384
stop; echo "=== [R2F-12] mini_train REMAT=blocks $(date) ==="
MLAFF_BENCH_OPTS="TPU.REMAT blocks" timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2F-13] mini_train b512 REMAT=blocks (capacity) $(date) ==="
MLAFF_BATCH=512 MLAFF_BENCH_OPTS="TPU.REMAT blocks" timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2F-14] mini_train MLAFF_CHAIN=unroll (protocol A/B for the 874->777 delta) $(date) ==="
MLAFF_CHAIN=unroll timeout 5400 python scripts/bench_train.py mini_train
echo "=== queue_r2f done $(date) ==="
