#!/bin/bash
# Round-2 chip queue, batch A (priority order from VERDICT.md "Next round"):
#   1-3: AFF-Mini north-star (refresh, WF ic A/B, fwd profile)
#   4-6: Small-forward regression (refresh, WF ic, stage-1 sweep)
#   7:   serving latency b1/b8 (VERDICT item 4)
#   8:   on-chip kernel parity probes (VERDICT item 5)
#   9-10: MaskFiner-UD fwd + train (VERDICT item 4)
# Respects .queue_stop between items. One chip, one process.
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

stop() { [ -e .queue_stop ] && echo "=== STOPPED by .queue_stop $(date) ===" && exit 0; }

stop; echo "=== [R2-1] bench.py refresh $(date) ==="
timeout 3000 python bench.py
stop; echo "=== [R2-2] bench.py MLAFF_WF_MODE=ic $(date) ==="
MLAFF_WF_MODE=ic timeout 3000 python bench.py
stop; echo "=== [R2-3] profile mini fwd $(date) ==="
timeout 3000 python scripts/profile_fwd.py mini_fwd /tmp/prof_mini
stop; echo "=== [R2-4] small fwd refresh $(date) ==="
timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2-5] small fwd MLAFF_WF_MODE=ic $(date) ==="
MLAFF_WF_MODE=ic timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2-6] sweep_small_stage1 $(date) ==="
bash scripts/sweep_small_stage1.sh
stop; echo "=== [R2-7] latency mini small $(date) ==="
timeout 3600 python scripts/bench_latency.py mini small
stop; echo "=== [R2-8a] parity_probe $(date) ==="
timeout 2700 python scripts/parity_probe.py
stop; echo "=== [R2-8b] parity_stack $(date) ==="
timeout 2700 python scripts/parity_stack.py
stop; echo "=== [R2-8c] parity_twin $(date) ==="
timeout 2700 python scripts/parity_twin.py
stop; echo "=== [R2-9] maskfiner_ud fwd b64 $(date) ==="
timeout 4500 python scripts/bench_maskfiner.py 64
stop; echo "=== [R2-10] maskfiner_ud train b32 $(date) ==="
timeout 7200 python scripts/bench_maskfiner.py 32 train
echo "=== queue_r2a done $(date) ==="
