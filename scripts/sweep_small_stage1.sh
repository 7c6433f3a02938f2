#!/bin/bash
# Stage-1 fused-attention sweep at AFF-Small head shapes (h=3, c_=32).
# Waits for an existing chip job (pid in $1) to finish first: one chip,
# one process.
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi
echo "=== default (cost-model tq, 16MB budget -> gb=8) ==="
timeout 2700 python scripts/bench_stage1.py 128 3 32
for tq in 112 448; do
  echo "=== tq=$tq ==="
  MLAFF_TQ=$tq timeout 2700 python scripts/bench_stage1.py 128 3 32
done
echo "=== 40MB resident budget (gb=16) ==="
MLAFF_WIN_BUDGET_MB=40 timeout 2700 python scripts/bench_stage1.py 128 3 32
echo "=== 40MB budget + tq=112 ==="
MLAFF_WIN_BUDGET_MB=40 MLAFF_TQ=112 timeout 2700 python scripts/bench_stage1.py 128 3 32
