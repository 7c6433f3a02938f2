#!/bin/bash
# Round-2 chip queue, batch H — MLAFF_XLA_NMAX routing A/Bs: route the
# issue-bound small-n stages to the XLA attention path (commit 6a49863).
# Token counts at 224^2: mini/small stages are n = 3136 / 784 / 196 / 49,
# so NMAX=200 routes stages 3-4 and NMAX=800 routes stages 2-4.
# Waits for the r2g script pid passed as $1.
#
# Stop marker: .queue_stop_r2f (shared with batches F/G).
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

stop() { [ -e .queue_stop_r2f ] && echo "=== STOPPED by .queue_stop_r2f $(date) ===" && exit 0; }

if [ -n "$1" ]; then
  echo "=== waiting for queue_r2g pid $1 $(date) ==="
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

stop; echo "=== [R2H-1] small fwd MLAFF_XLA_NMAX=200 (stages 3-4 via XLA) $(date) ==="
MLAFF_XLA_NMAX=200 timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2H-2] small fwd MLAFF_XLA_NMAX=800 (stages 2-4 via XLA) $(date) ==="
MLAFF_XLA_NMAX=800 timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2H-3] mini fwd MLAFF_XLA_NMAX=200 $(date) ==="
MLAFF_XLA_NMAX=200 timeout 3600 python bench.py
stop; echo "=== [R2H-4] mini fwd MLAFF_XLA_NMAX=800 $(date) ==="
MLAFF_XLA_NMAX=800 timeout 3600 python bench.py
echo "=== queue_r2h done $(date) ==="
