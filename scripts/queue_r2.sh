#!/bin/bash
# Follow-up chip queue: WF-contraction lowering A/B (MLAFF_WF_MODE=ic
# vs the vpu default). The Small b128 forward profile shows the vpu
# mode's rank-5 broadcast materializing the gathered merge features
# twice ((b, n'*m, c) producer fusion + full relayout copy, ~5.9 ms of
# ~133 ms per iteration); the per-inner-channel mode keeps rank 4 so
# the gather can fuse into the reduce. Baselines (vpu) come from
# queue_r1 items [1]/[3a]/[3b]. Waits on pid $1 if given.
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

echo "=== [1] small fwd, WF_MODE=ic $(date) ==="
MLAFF_WF_MODE=ic timeout 5400 python scripts/bench_train.py fwd small
echo "=== [2] mini fwd, WF_MODE=ic $(date) ==="
MLAFF_WF_MODE=ic timeout 3500 python bench.py
echo "=== [3] mini train, WF_MODE=ic $(date) ==="
MLAFF_WF_MODE=ic timeout 5400 python scripts/bench_train.py mini_train
echo "=== queue_r2 done $(date) ==="
