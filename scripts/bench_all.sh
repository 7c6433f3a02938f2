#!/bin/bash
# Sequential bench sweep on the one real chip. Each line prints one JSON
# metric; compiles are cached under .jax_cache so reruns are fast.
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon
for mode in "mini_train" "fwd small" "fwd tiny" "fwd tiny_1_5th" \
            "fwd mini_1_5th" "fwd small_1_5th" "fwd base_22kto1k_384"; do
  echo "=== bench_train $mode ==="
  timeout 2700 python scripts/bench_train.py $mode
done
echo "=== maskfiner_ud ==="
timeout 3500 python scripts/bench_maskfiner.py 64
