#!/bin/bash
# Part 5 of the Small-regression chase: model-level A/Bs that isolate the
# three commits landed between the 1083 img/s measurement and 915:
#   (a) WF contraction lowering (vpu default vs einsum)
#   (b) stage-1 resident-window path entirely off (WFRAC=0 -> dense)
#   (c) raised unroll bound + einsum WF combined (best-known stack)
# Waits on an existing chip job (pid in $1).
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== small fwd, WF_MODE=einsum ==="
MLAFF_WF_MODE=einsum timeout 5400 python scripts/bench_train.py fwd small
echo "=== small fwd, WFRAC=0 (stage-1 dense) ==="
MLAFF_WFRAC=0 timeout 5400 python scripts/bench_train.py fwd small
echo "=== small fwd, GBH=192 + WF einsum ==="
MLAFF_GBH=192 MLAFF_WF_MODE=einsum timeout 5400 python scripts/bench_train.py fwd small
echo "=== done ==="
