#!/bin/bash
# Wait for the axon tunnel to grant a chip lease, then A/B the LayerNorm
# lowering (MLAFF_LN=dot default vs vpu) and refresh the headline benches.
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

echo "=== waiting for chip lease $(date) ==="
for i in $(seq 1 200); do
  if timeout 300 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('lease OK', float((x@x).sum()))
" 2>/tmp/claim_err.log; then
    break
  fi
  echo "claim attempt $i failed $(date +%H:%M:%S)"
  sleep 120
done

echo "=== [A] bench.py MLAFF_LN=dot $(date) ==="
MLAFF_LN=dot timeout 3500 python bench.py
echo "=== [B] bench.py MLAFF_LN=vpu $(date) ==="
MLAFF_LN=vpu timeout 3500 python bench.py
echo "=== [C] fwd small (dot) $(date) ==="
timeout 5400 python scripts/bench_train.py fwd small
echo "=== [D] mini_train (dot) $(date) ==="
timeout 5400 python scripts/bench_train.py mini_train
echo "=== ln_ab done $(date) ==="
