#!/bin/bash
# Round-2 chip queue, batch G — Small-forward regression bisect. Runs the
# CURRENT fori bench protocol (scripts copied into each worktree) against
# the kernel code BEFORE the resident-K/V rewrite (39261d5, the tree that
# measured 1083 img/s with the old unrolled protocol) and AFTER it
# (148fde0, resident K/V + kappa=64). Protocol is held fixed, so any
# delta between the three points is kernel/model code, not measurement.
# Waits for the r2f shell pid passed as $1.
#
# Stop marker: .queue_stop_r2f (shared with batch F).
cd "$(dirname "$0")/.."
REPO=$PWD
export JAX_PLATFORMS=axon

stop() { [ -e "$REPO/.queue_stop_r2f" ] && echo "=== STOPPED by .queue_stop_r2f $(date) ===" && exit 0; }

if [ -n "$1" ]; then
  echo "=== waiting for queue_r2f pid $1 $(date) ==="
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

stop; echo "=== [R2G-1] small fwd @ 39261d5 (pre-resident-K/V), fori protocol $(date) ==="
cd "$REPO/.bisect/pre-resident" && PYTHONPATH=$PWD:/root/.axon_site timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2G-2] small fwd @ 148fde0 (post-resident-K/V + kappa64), fori protocol $(date) ==="
cd "$REPO/.bisect/post-resident" && PYTHONPATH=$PWD:/root/.axon_site timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2G-3] small fwd @ HEAD refresh (LN=vpu default) $(date) ==="
cd "$REPO" && PYTHONPATH=$PWD:/root/.axon_site timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2G-4] mini fwd @ HEAD refresh (LN=vpu default) $(date) ==="
cd "$REPO" && PYTHONPATH=$PWD:/root/.axon_site timeout 3600 python bench.py
echo "=== queue_r2g done $(date) ==="
