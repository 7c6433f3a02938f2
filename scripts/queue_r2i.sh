#!/bin/bash
# Round-2 chip queue, batch I — masked-dense routing A/Bs (commit 5efcd50)
# + the MaskFiner-UD train retry (its sub-compiles are cached from R2C-9,
# a relaunch resumes progress). Token counts at 224^2 are n = 3136 / 784 /
# 196 / 49 per stage, so DENSE_NMAX=200 routes stage 3 (stage 4 is already
# global) and 800 routes stages 2-3.
# Waits for the r2h script pid passed as $1.
#
# Stop marker: .queue_stop_r2f (shared with batches F/G/H).
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

stop() { [ -e .queue_stop_r2f ] && echo "=== STOPPED by .queue_stop_r2f $(date) ===" && exit 0; }

if [ -n "$1" ]; then
  echo "=== waiting for queue_r2h pid $1 $(date) ==="
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

stop; echo "=== [R2I-1] small fwd MLAFF_DENSE_NMAX=200 (stage 3 dense) $(date) ==="
MLAFF_DENSE_NMAX=200 timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2I-2] small fwd MLAFF_DENSE_NMAX=800 (stages 2-3 dense) $(date) ==="
MLAFF_DENSE_NMAX=800 timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2I-3] mini fwd MLAFF_DENSE_NMAX=200 $(date) ==="
MLAFF_DENSE_NMAX=200 timeout 3600 python bench.py
stop; echo "=== [R2I-4] mini fwd MLAFF_DENSE_NMAX=800 $(date) ==="
MLAFF_DENSE_NMAX=800 timeout 3600 python bench.py
stop; echo "=== [R2I-5] maskfiner_ud train b32 retry (cached sub-compiles) $(date) ==="
timeout 7200 python scripts/bench_maskfiner.py 32 train
echo "=== queue_r2i done $(date) ==="
