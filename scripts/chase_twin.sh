#!/bin/bash
# Traced-window path (MLAFF_TWIN=1) chip evaluation: parity (fwd+grad,
# windowed dispatch and dense fallback), kernel bench at stage-2 shapes,
# then model level. Waits on an existing chip job (pid in $1).
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== twin parity on chip ==="
timeout 3500 python scripts/parity_twin.py || { echo "PARITY FAILED"; exit 1; }
export MLAFF_TWIN=1
for shape in "784 6 32" "784 4 32"; do
  echo "=== twin dense $shape (random ncc -> fallback cost) ==="
  timeout 2700 python scripts/bench_stage.py $shape
done
echo "=== small fwd, TWIN=1 ==="
timeout 5400 python scripts/bench_train.py fwd small
echo "=== mini fwd, TWIN=1 ==="
timeout 3500 python bench.py
echo "=== mini train, TWIN=1 ==="
timeout 5400 python scripts/bench_train.py mini_train
echo "=== done ==="
