#!/bin/bash
# Stacked dense-path (MLAFF_STACK=1) chip evaluation at the small-token
# stages, then model level. Waits on an existing chip job (pid in $1).
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== stacked parity on chip ==="
timeout 2700 python scripts/parity_stack.py || { echo "PARITY FAILED"; exit 1; }
export MLAFF_STACK=1
for shape in "196 12 32" "49 24 32" "196 8 32" "49 16 32"; do
  echo "=== stacked dense $shape ==="
  timeout 2700 python scripts/bench_stage.py $shape
done
echo "=== small fwd, STACK=1 ==="
timeout 5400 python scripts/bench_train.py fwd small
echo "=== mini fwd, STACK=1 ==="
timeout 3500 python bench.py
echo "=== done ==="
