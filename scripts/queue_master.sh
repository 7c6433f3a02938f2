#!/bin/bash
# Master chip queue: claim-wait, then run the whole evaluation backlog
# sequentially (one chip, one process). Between items it checks the
# stop file /root/repo/.queue_stop — touch it to halt the chain cleanly
# (e.g. before a driver bench run needs the chip).
#
# Backlog (priority order):
#   [A] LN lowering microbench + model-level LN=dot/vpu A/B
#   [B] Small fwd + mini train refresh (current defaults)
#   [C] chase_all body: parity-gate + bench the stacked / traced-window /
#       compact kernel paths, combined-flags model runs
#   [D] WF_MODE=ic A/B (small fwd, mini fwd, mini train)
#   [E] mini train-step profile (first backward trace)
#   [F] forward table for every published-FPS preset + Base@384
#   [G] MaskFiner-UD forward bench (host-side init)
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

stop() { [ -e .queue_stop ] && echo "=== STOPPED by .queue_stop $(date) ===" && exit 0; }

echo "=== waiting for chip lease $(date) ==="
CLAIMED=0
for i in $(seq 1 600); do
  stop
  if timeout 300 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('lease OK', float((x@x).sum()))
" 2>/tmp/claim_err.log; then
    CLAIMED=1
    break
  fi
  echo "claim attempt $i failed $(date +%H:%M:%S)"
  sleep 120
done
if [ "$CLAIMED" != 1 ]; then
  echo "=== GIVING UP: lease never granted $(date) ==="
  exit 1
fi

stop; echo "=== [A0] bench.py MLAFF_CHAIN=fori (compile-cost + protocol A/B vs [A2]) $(date) ==="
MLAFF_CHAIN=fori timeout 3500 python bench.py
stop; echo "=== [A1] bench_ln $(date) ==="
timeout 2700 python scripts/bench_ln.py
stop; echo "=== [A2] bench.py MLAFF_LN=dot $(date) ==="
MLAFF_LN=dot timeout 3500 python bench.py
stop; echo "=== [A3] bench.py MLAFF_LN=vpu $(date) ==="
MLAFF_LN=vpu timeout 3500 python bench.py
stop; echo "=== [B1] fwd small $(date) ==="
timeout 5400 python scripts/bench_train.py fwd small
stop; echo "=== [B2] mini_train $(date) ==="
timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [C] chase_all $(date) ==="
bash scripts/chase_all.sh
stop; echo "=== [D1] small fwd WF_MODE=ic $(date) ==="
MLAFF_WF_MODE=ic timeout 5400 python scripts/bench_train.py fwd small
stop; echo "=== [D2] mini fwd WF_MODE=ic $(date) ==="
MLAFF_WF_MODE=ic timeout 3500 python bench.py
stop; echo "=== [D3] mini train WF_MODE=ic $(date) ==="
MLAFF_WF_MODE=ic timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [E] profile mini_train $(date) ==="
timeout 5400 python scripts/profile_fwd.py mini_train /tmp/prof_train
for preset in tiny mini_1_5th tiny_1_5th small_1_5th; do
  stop; echo "=== [F] fwd $preset $(date) ==="
  timeout 5400 python scripts/bench_train.py fwd "$preset"
done
stop; echo "=== [F] fwd base_22kto1k_384 $(date) ==="
timeout 7200 python scripts/bench_train.py fwd base_22kto1k_384
stop; echo "=== [G] maskfiner_ud $(date) ==="
timeout 4500 python scripts/bench_maskfiner.py 64
stop; echo "=== [G2] maskfiner_ud train b32 (fori chain) $(date) ==="
MLAFF_CHAIN=fori timeout 7200 python scripts/bench_maskfiner.py 32 train
stop; echo "=== [H1] mini_train REMAT=blocks $(date) ==="
MLAFF_BENCH_OPTS="TPU.REMAT blocks" timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [H2] mini_train REMAT=dots $(date) ==="
MLAFF_BENCH_OPTS="TPU.REMAT dots" timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [H3] mini_train b512 REMAT=blocks (capacity) $(date) ==="
MLAFF_BATCH=512 MLAFF_BENCH_OPTS="TPU.REMAT blocks" timeout 5400 python scripts/bench_train.py mini_train
echo "=== queue_master done $(date) ==="
