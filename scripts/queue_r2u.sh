#!/bin/bash
# Round-2 chip queue, batch U — WSTACK (scratch-staged row stacking) A/Bs
# after the concat-of-slices rewrite (the old form blew up Mosaic compile,
# PERF.md batch T). Default tree already re-measured 2682.6 img/s = 2.006x
# on this VM (1-RTT protocol); these runs chase margin above 2.0x.
# Stop marker: .queue_stop_r2u
cd "$(dirname "$0")/.."
REPO=$PWD
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

stop() { [ -e "$REPO/.queue_stop_r2u" ] && echo "=== STOPPED by .queue_stop_r2u $(date) ===" && exit 0; }

stop; echo "=== [R2U-1] parity probe MLAFF_WSTACK=2 (windowed-vs-plain, fwd) $(date) ==="
MLAFF_WSTACK=2 timeout 1800 python scripts/parity_probe.py
stop; echo "=== [R2U-2] mini fwd MLAFF_WSTACK=2 $(date) ==="
MLAFF_WSTACK=2 timeout 1800 python bench.py
stop; echo "=== [R2U-3] mini fwd MLAFF_WSTACK=4 $(date) ==="
MLAFF_WSTACK=4 timeout 1800 python bench.py
stop; echo "=== [R2U-4] small fwd MLAFF_WSTACK=2 $(date) ==="
MLAFF_WSTACK=2 timeout 1800 python scripts/bench_train.py fwd small
stop; echo "=== [R2U-5] small fwd default refresh (1-RTT protocol) $(date) ==="
timeout 1800 python scripts/bench_train.py fwd small
echo "=== queue_r2u done $(date) ==="
