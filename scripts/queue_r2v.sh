#!/bin/bash
# Round-2 chip queue, batch V — the benchmark families VERDICT item 4
# still lacks numbers for: MaskFiner-UD fwd/train, MaskFiner-OT fwd, and
# the mini train-step refresh (R2Q-9: 874-vs-777 protocol confound).
# Runs after batch U releases the chip (pass the U pid as $1).
# This VM's remote compile is ~4x faster than the one that forced the
# earlier UD abandons (full mini model: 396 s), so UD is feasible now.
# Stop marker: .queue_stop_r2v
cd "$(dirname "$0")/.."
REPO=$PWD
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

stop() { [ -e "$REPO/.queue_stop_r2v" ] && echo "=== STOPPED by .queue_stop_r2v $(date) ===" && exit 0; }

if [ -n "$1" ]; then
  echo "=== waiting for batch U pid $1 $(date) ==="
  while kill -0 "$1" 2>/dev/null; do sleep 10; done
fi
stop

stop; echo "=== [R2V-0a] mini fwd MLAFF_WSTACK=8 (wsg scaling: 2682.6 -> 2728 -> 2776.5 at 1/2/4) $(date) ==="
MLAFF_WSTACK=8 timeout 1800 python bench.py
stop; echo "=== [R2V-0b] small fwd MLAFF_WSTACK=4 $(date) ==="
MLAFF_WSTACK=4 timeout 1800 python scripts/bench_train.py fwd small
stop; echo "=== [R2V-1] mini train refresh (1-RTT protocol, current tree) $(date) ==="
timeout 3000 python scripts/bench_train.py mini_train
stop; echo "=== [R2V-2] maskfiner_ud fwd b64 $(date) ==="
timeout 3600 python scripts/bench_maskfiner.py 64
stop; echo "=== [R2V-3] maskfiner_ot fwd b64 $(date) ==="
MLAFF_BENCH_CFG=maskfiner_oracle_teacher.yaml timeout 3600 python scripts/bench_maskfiner.py 64
stop; echo "=== [R2V-4] maskfiner_ud train b32 $(date) ==="
timeout 5400 python scripts/bench_maskfiner.py 32 train
echo "=== queue_r2v done $(date) ==="
