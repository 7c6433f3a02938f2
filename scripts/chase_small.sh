#!/bin/bash
# Chase the AFF-Small forward regression (1083 -> 916 img/s after the
# resident-K/V + kappa/tq-224 kernel commits). Waits for an existing chip
# job (pid in $1), then:
#   1. re-measures Small forward at the current default,
#   2. sweeps stage-1 kernel tiling at Small head shapes (h=3, c_=32),
#   3. re-measures Small forward with the sweep's likely winners.
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== small fwd (current default) ==="
timeout 3500 python scripts/bench_train.py fwd small
echo "=== stage1 sweep @ small head shapes (b128 h3 c32) ==="
for tq in "" 112 224 448; do
  echo "--- tq=${tq:-auto} ---"
  MLAFF_TQ=$tq timeout 2700 python scripts/bench_stage1.py 128 3 32
done
echo "=== small fwd, tq=112 ==="
MLAFF_TQ=112 timeout 3500 python scripts/bench_train.py fwd small
echo "=== small fwd, tq=448 ==="
MLAFF_TQ=448 timeout 3500 python scripts/bench_train.py fwd small
echo "=== done ==="
