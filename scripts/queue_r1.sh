#!/bin/bash
# Master chip queue for the current evaluation backlog. Waits for the
# wedged lease to recover, then runs, in priority order:
#   1. LN lowering microbench (cheap, fast signal)
#   2. bench.py with MLAFF_LN=dot (the new default) and =vpu
#   3. Small fwd + mini train refresh
#   4. the consolidated new-kernel-path evaluation (chase_all.sh body)
#   5. MaskFiner-UD bench
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

echo "=== waiting for chip lease $(date) ==="
for i in $(seq 1 300); do
  if timeout 300 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('lease OK', float((x@x).sum()))
" 2>/tmp/claim_err.log; then
    break
  fi
  echo "claim attempt $i failed $(date +%H:%M:%S)"
  sleep 120
done

echo "=== [1] bench_ln $(date) ==="
timeout 2700 python scripts/bench_ln.py
echo "=== [2a] bench.py MLAFF_LN=dot $(date) ==="
MLAFF_LN=dot timeout 3500 python bench.py
echo "=== [2b] bench.py MLAFF_LN=vpu $(date) ==="
MLAFF_LN=vpu timeout 3500 python bench.py
echo "=== [3a] fwd small (dot) $(date) ==="
timeout 5400 python scripts/bench_train.py fwd small
echo "=== [3b] mini_train (dot) $(date) ==="
timeout 5400 python scripts/bench_train.py mini_train
echo "=== [4] chase_all $(date) ==="
bash scripts/chase_all.sh
echo "=== [5] maskfiner_ud $(date) ==="
timeout 4500 python scripts/bench_maskfiner.py 64
echo "=== queue_r1 done $(date) ==="
