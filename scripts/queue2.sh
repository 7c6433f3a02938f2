#!/bin/bash
# Follow-on chip queue (prioritized subset of the master backlog for a
# short session): waits for the master queue to release the chip, then
# runs the highest-value open questions first. Respects .queue_stop.
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

stop() { [ -e .queue_stop ] && echo "=== STOPPED by .queue_stop $(date) ===" && exit 0; }

if [ -n "$1" ]; then
  echo "=== waiting for master queue pid $1 $(date) ==="
  while kill -0 "$1" 2>/dev/null; do sleep 10; done
fi
# honour a stop marker set while we were waiting (operator intent: halt the
# whole session) BEFORE clearing it for our own run
stop
rm -f .queue_stop

stop; echo "=== [Q2-1] small fwd WF_MODE=ic (Small-regression hypothesis) $(date) ==="
MLAFF_WF_MODE=ic timeout 3500 python scripts/bench_train.py fwd small
stop; echo "=== [Q2-2] mini_train refresh $(date) ==="
timeout 3500 python scripts/bench_train.py mini_train
stop; echo "=== [Q2-3] serving latency mini+small b1/b8 $(date) ==="
timeout 3500 python scripts/bench_latency.py mini small
stop; echo "=== [Q2-4] mini fwd WF_MODE=ic $(date) ==="
MLAFF_WF_MODE=ic timeout 1800 python bench.py
stop; echo "=== [Q2-5] maskfiner_ud fwd b64 $(date) ==="
timeout 3500 python scripts/bench_maskfiner.py 64
stop; echo "=== [Q2-6] parity probe on chip $(date) ==="
timeout 1800 python scripts/parity_probe.py
echo "=== queue2 done $(date) ==="
