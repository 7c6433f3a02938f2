#!/bin/bash
# Consolidated chip evaluation of the three new kernel paths:
#   compact (MLAFF_COMPACT, stage-1 on-grid), stacked (MLAFF_STACK,
#   stages 3/4), traced-window (MLAFF_TWIN, stage 2 / MixRes).
# Parity probes gate each flag; the model-level combined runs only
# enable flags whose probes passed. Waits on pid $1 if given.
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

echo "=== [1] mini fwd, new-default baseline ==="
timeout 3500 python bench.py

echo "=== [2] parity_stack ==="
STACK_OK=1
timeout 3500 python scripts/parity_stack.py || STACK_OK=0
echo "STACK_OK=$STACK_OK"

echo "=== [3] parity_twin ==="
TWIN_OK=1
timeout 4500 python scripts/parity_twin.py || TWIN_OK=0
echo "TWIN_OK=$TWIN_OK"

echo "=== [4] parity_probe COMPACT=1 ==="
COMPACT_OK=1
MLAFF_COMPACT=1 timeout 3500 python scripts/parity_probe.py || COMPACT_OK=0
echo "COMPACT_OK=$COMPACT_OK"

if [ "$STACK_OK" = 1 ]; then
  echo "=== [5] stacked dense 196 12 32 ==="
  MLAFF_STACK=1 timeout 2700 python scripts/bench_stage.py 196 12 32
  echo "=== [6] stacked dense 49 24 32 ==="
  MLAFF_STACK=1 timeout 2700 python scripts/bench_stage.py 49 24 32
fi
if [ "$COMPACT_OK" = 1 ]; then
  echo "=== [7] compact stage1 mini shapes (auto) ==="
  MLAFF_COMPACT=1 timeout 2700 python scripts/bench_stage1.py
  echo "=== [8] compact stage1 small shapes (auto) ==="
  MLAFF_COMPACT=1 timeout 2700 python scripts/bench_stage1.py 128 3 32
fi
if [ "$TWIN_OK" = 1 ]; then
  echo "=== [9] twin dense 784 6 32 (random ncc -> fallback cost) ==="
  MLAFF_TWIN=1 timeout 2700 python scripts/bench_stage.py 784 6 32
fi

FLAGS=""
[ "$STACK_OK" = 1 ] && FLAGS="$FLAGS MLAFF_STACK=1"
[ "$TWIN_OK" = 1 ] && FLAGS="$FLAGS MLAFF_TWIN=1"
[ "$COMPACT_OK" = 1 ] && FLAGS="$FLAGS MLAFF_COMPACT=1"
echo "combined flags:$FLAGS"

echo "=== [10] small fwd, new-default baseline ==="
timeout 5400 python scripts/bench_train.py fwd small
echo "=== [11] small fwd, combined ==="
env $FLAGS timeout 5400 python scripts/bench_train.py fwd small
echo "=== [12] mini fwd, combined ==="
env $FLAGS timeout 3500 python bench.py
echo "=== [13] mini train, combined ==="
env $FLAGS timeout 5400 python scripts/bench_train.py mini_train
echo "=== done ==="
