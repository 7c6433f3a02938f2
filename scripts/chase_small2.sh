#!/bin/bash
# Part 2 of the Small-regression chase: resident-window VMEM budget
# variants (Small stage-1 has c=96, which halves the image-group size gb
# under the 16MB default). Waits for an existing chip job (pid in $1).
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
for mb in 32 48; do
  echo "=== stage1 small shapes, WIN_BUDGET=${mb}MB ==="
  MLAFF_WIN_BUDGET_MB=$mb timeout 2700 python scripts/bench_stage1.py 128 3 32
done
echo "=== small fwd, best-budget (48MB) ==="
MLAFF_WIN_BUDGET_MB=48 timeout 3500 python scripts/bench_train.py fwd small
echo "=== done ==="
