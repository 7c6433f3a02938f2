#!/bin/bash
# Round-2 chip queue, batch T — wall-clock-trimmed replay of batch S for
# the restarted VM (.jax_cache was wiped; every item cold-compiles).
# Order = value per minute toward the unmet north star (mini >= 2x V100):
# default refresh first (warms the cache the driver's BENCH run reuses),
# then the WSTACK / stage-2-stacking levers, then Small refresh.
# Stop marker: .queue_stop_r2t
cd "$(dirname "$0")/.."
REPO=$PWD
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

stop() { [ -e "$REPO/.queue_stop_r2t" ] && echo "=== STOPPED by .queue_stop_r2t $(date) ===" && exit 0; }

stop; echo "=== [R2T-1] mini fwd default (cache warm + refresh) $(date) ==="
timeout 3000 python bench.py
stop; echo "=== [R2T-2] mini fwd MLAFF_WSTACK=2 $(date) ==="
MLAFF_WSTACK=2 timeout 3000 python bench.py
stop; echo "=== [R2T-3] mini fwd MLAFF_WSTACK=4 $(date) ==="
MLAFF_WSTACK=4 timeout 3000 python bench.py
stop; echo "=== [R2T-4] mini fwd STACK_NMAX=800 GB_CAP=2 $(date) ==="
MLAFF_STACK_NMAX=800 MLAFF_STACK_GB=2 timeout 3000 python bench.py
stop; echo "=== [R2T-5] small fwd default refresh $(date) ==="
timeout 3000 python scripts/bench_train.py fwd small
stop; echo "=== [R2T-6] small fwd MLAFF_WSTACK=2 $(date) ==="
MLAFF_WSTACK=2 timeout 3000 python scripts/bench_train.py fwd small
echo "=== queue_r2t done $(date) ==="
