#!/bin/bash
# Round-2 chip queue, batch M — model-level A/Bs of the two parity-pinned
# but never-benched kernel dispatch modes: traced windows (MLAFF_TWIN=1,
# banded K/V windows from the traced ncc at the off-grid stages — cuts the
# stage-2 dense plane width) and the stacked small-n path (MLAFF_STACK=1,
# image group folded into rows at stages 3/4 — one VPU chain per head
# instead of per (image, head)). Waits for the r2l script pid in $1.
#
# Stop marker: .queue_stop_r2m
cd "$(dirname "$0")/.."
REPO=$PWD
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

stop() { [ -e "$REPO/.queue_stop_r2m" ] && echo "=== STOPPED by .queue_stop_r2m $(date) ===" && exit 0; }

if [ -n "$1" ]; then
  echo "=== waiting for queue_r2l pid $1 $(date) ==="
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

stop; echo "=== [R2M-1] mini fwd MLAFF_STACK=1 $(date) ==="
MLAFF_STACK=1 timeout 3600 python bench.py
stop; echo "=== [R2M-2] mini fwd MLAFF_TWIN=1 $(date) ==="
MLAFF_TWIN=1 timeout 3600 python bench.py
stop; echo "=== [R2M-3] mini fwd MLAFF_TWIN=1 MLAFF_STACK=1 $(date) ==="
MLAFF_TWIN=1 MLAFF_STACK=1 timeout 3600 python bench.py
stop; echo "=== [R2M-4] small fwd MLAFF_STACK=1 $(date) ==="
MLAFF_STACK=1 timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2M-5] small fwd MLAFF_TWIN=1 $(date) ==="
MLAFF_TWIN=1 timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2M-6] small fwd MLAFF_TWIN=1 MLAFF_STACK=1 $(date) ==="
MLAFF_TWIN=1 MLAFF_STACK=1 timeout 3600 python scripts/bench_train.py fwd small
echo "=== queue_r2m done $(date) ==="
