#!/bin/bash
# Round-2 chip queue, batch P — stage-2 stacking A/Bs (STACK_NMAX=800
# covers the n=784 stage) + the untested b64 protocol point.
# Waits for the r2o script pid passed as $1.
#
# Stop marker: .queue_stop_r2p
cd "$(dirname "$0")/.."
REPO=$PWD
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

stop() { [ -e "$REPO/.queue_stop_r2p" ] && echo "=== STOPPED by .queue_stop_r2p $(date) ===" && exit 0; }

if [ -n "$1" ]; then
  echo "=== waiting for queue_r2o pid $1 $(date) ==="
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

stop; echo "=== [R2P-1] mini fwd MLAFF_STACK_NMAX=800 (stages 2-4 stacked) $(date) ==="
MLAFF_STACK_NMAX=800 timeout 3600 python bench.py
stop; echo "=== [R2P-2] small fwd MLAFF_STACK_NMAX=800 $(date) ==="
MLAFF_STACK_NMAX=800 timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2P-3] mini fwd b64 $(date) ==="
MLAFF_BATCH=64 timeout 3600 python bench.py
echo "=== queue_r2p done $(date) ==="
