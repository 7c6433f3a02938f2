#!/bin/bash
# Part 3 of the Small-regression chase: raise the gb*h unroll bound
# (Small's head counts 3/6/12/24 leave tiny image groups under the
# default 64). Waits for an existing chip job (pid in $1).
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== stage1 small shapes, GBH=192 ==="
MLAFF_GBH=192 timeout 2700 python scripts/bench_stage1.py 128 3 32
echo "=== small fwd, GBH=192 ==="
MLAFF_GBH=192 timeout 5400 python scripts/bench_train.py fwd small
echo "=== done ==="
