#!/bin/bash
# Part 4: dense-path kernel timings at Small's stage-2/3/4 shapes,
# default vs raised gb*h unroll bound. Waits on pid $1.
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
for shape in "784 6 32" "196 12 32" "49 24 32"; do
  echo "=== dense $shape default ==="
  timeout 2700 python scripts/bench_stage.py $shape
  echo "=== dense $shape GBH=192 ==="
  MLAFF_GBH=192 timeout 2700 python scripts/bench_stage.py $shape
done
echo "=== done ==="
