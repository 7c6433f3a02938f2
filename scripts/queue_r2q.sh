#!/bin/bash
# Round-2 chip queue, batch Q — FINAL consolidated remainder, in value
# order (replaces N's tail and the waiting O/P): stage-2 stacking +
# b64 protocol point, train refresh, compact re-probes (block-unit
# starts fix), Small bisect, protocol/remat A/Bs, MaskFiner retries,
# preset table, profile, and a closing default refresh pair.
# Waits for the r2n script pid passed as $1.
#
# Stop marker: .queue_stop_r2q
cd "$(dirname "$0")/.."
REPO=$PWD
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

stop() { [ -e "$REPO/.queue_stop_r2q" ] && echo "=== STOPPED by .queue_stop_r2q $(date) ===" && exit 0; }

if [ -n "$1" ]; then
  echo "=== waiting for queue_r2n pid $1 $(date) ==="
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
rm -f "$REPO/.queue_stop_r2n"

stop; echo "=== [R2Q-1] mini fwd MLAFF_STACK_NMAX=800 (stages 2-4 stacked) $(date) ==="
MLAFF_STACK_NMAX=800 timeout 3600 python bench.py
stop; echo "=== [R2Q-2] small fwd MLAFF_STACK_NMAX=800 $(date) ==="
MLAFF_STACK_NMAX=800 timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2Q-3] mini fwd b64 $(date) ==="
MLAFF_BATCH=64 timeout 3600 python bench.py
stop; echo "=== [R2Q-4] mini_train DEFAULT refresh (stacked fwd) $(date) ==="
timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2Q-5] parity_probe MLAFF_COMPACT=1 (block-unit starts) $(date) ==="
MLAFF_COMPACT=1 timeout 3000 python scripts/parity_probe.py
stop; echo "=== [R2Q-6] stage1 kernel compact $(date) ==="
MLAFF_COMPACT=1 timeout 3000 python scripts/bench_stage1.py 128
stop; echo "=== [R2Q-7] small fwd @ 39261d5 (pre-resident-K/V bisect) $(date) ==="
( cd "$REPO/.bisect/pre-resident" && PYTHONPATH=$PWD:/root/.axon_site timeout 3600 python scripts/bench_train.py fwd small )
stop; echo "=== [R2Q-8] small fwd @ 148fde0 (post-resident-K/V bisect) $(date) ==="
( cd "$REPO/.bisect/post-resident" && PYTHONPATH=$PWD:/root/.axon_site timeout 3600 python scripts/bench_train.py fwd small )
stop; echo "=== [R2Q-9] mini_train MLAFF_CHAIN=unroll (protocol A/B) $(date) ==="
MLAFF_CHAIN=unroll timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2Q-10] mini_train REMAT=blocks $(date) ==="
MLAFF_BENCH_OPTS="TPU.REMAT blocks" timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2Q-11] maskfiner_ud fwd b64 $(date) ==="
timeout 5400 python scripts/bench_maskfiner.py 64
stop; echo "=== [R2Q-12] maskfiner_ud train b32 $(date) ==="
timeout 7200 python scripts/bench_maskfiner.py 32 train
for preset in tiny mini_1_5th tiny_1_5th small_1_5th; do
  stop; echo "=== [R2Q-13] fwd $preset $(date) ==="
  timeout 5400 python scripts/bench_train.py fwd "$preset"
done
stop; echo "=== [R2Q-14] fwd base_22kto1k_384 $(date) ==="
timeout 7200 python scripts/bench_train.py fwd base_22kto1k_384
stop; echo "=== [R2Q-15] mini fwd profile (post-winners) $(date) ==="
timeout 3600 python scripts/profile_fwd.py mini || true
stop; echo "=== [R2Q-16] FINAL bench.py default refresh $(date) ==="
timeout 3600 python bench.py
stop; echo "=== [R2Q-17] FINAL small fwd default refresh $(date) ==="
timeout 3600 python scripts/bench_train.py fwd small
echo "=== queue_r2q done $(date) ==="
