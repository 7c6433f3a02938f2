#!/bin/bash
# Third chip queue link: capture the FIRST train-step profile. The
# forward glue is profiled and being attacked (queue_r1/r2); the
# backward+optimizer side (93 ms of the 146 ms mini b128 train step)
# has never been traced — in particular the ClusterMerging gather
# transposes, which JAX AD turns into XLA scatter-adds of the gathered
# (b, n', m, c) cotangent. Waits on pid $1 if given.
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

echo "=== [1] profile mini_train $(date) ==="
timeout 5400 python scripts/profile_fwd.py mini_train /tmp/prof_train
echo "=== queue_r3 done $(date) ==="
