#!/bin/bash
# Compact-union K/V layout (MLAFF_COMPACT=1) chip evaluation:
# 1. parity probe (fwd + Pallas bwd vs XLA oracle) — the compact backward
#    only runs on real hardware, gate everything on this
# 2. stage-1 kernel bench, auto + forced tile sizes, mini & small shapes
# 3. model-level: mini fwd (bench.py), small fwd, mini train step
# Waits on an existing chip job (pid in $1).
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== small fwd, new small-n unroll default (no compact) ==="
timeout 5400 python scripts/bench_train.py fwd small
echo "=== mini fwd, new small-n unroll default (no compact) ==="
timeout 3500 python bench.py
export MLAFF_COMPACT=1
echo "=== parity probe, COMPACT=1 ==="
timeout 2700 python scripts/parity_probe.py || { echo "PARITY FAILED"; exit 1; }
echo "=== stage1 mini shapes, COMPACT=1 auto ==="
timeout 2700 python scripts/bench_stage1.py
for t in 56 112 224; do
  echo "=== stage1 mini shapes, COMPACT=1 tq=$t ==="
  MLAFF_TQ=$t timeout 2700 python scripts/bench_stage1.py
done
echo "=== stage1 small shapes, COMPACT=1 auto ==="
timeout 2700 python scripts/bench_stage1.py 128 3 32
echo "=== mini fwd, COMPACT=1 ==="
timeout 3500 python bench.py
echo "=== small fwd, COMPACT=1 ==="
timeout 5400 python scripts/bench_train.py fwd small
echo "=== mini train, COMPACT=1 ==="
timeout 5400 python scripts/bench_train.py mini_train
echo "=== done ==="
