#!/bin/bash
# A/B the WF contraction lowering (MLAFF_WF_MODE=vpu vs default einsum)
# at the model level. Waits for an existing chip job (pid in $1).
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== mini fwd, WF_MODE=vpu ==="
MLAFF_WF_MODE=vpu timeout 3500 python bench.py
echo "=== mini train, WF_MODE=vpu ==="
MLAFF_WF_MODE=vpu timeout 3500 python scripts/bench_train.py mini_train
echo "=== done ==="
