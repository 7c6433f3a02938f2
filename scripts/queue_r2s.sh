#!/bin/bash
# Round-2 chip queue, batch S — consolidated reorder of batches Q+R:
# the mini-north-star perf levers (WSTACK / gb-capped stage-2 stacking)
# and the post-winners profile run FIRST, then the long benches
# (MaskFiner-UD, preset table, Base@384, remat train A/B) and the final
# default refreshes. Replaces the killed batch-R waiter; Q was stopped
# after its in-flight item via .queue_stop_r2q.
#
# [R2Q-9] (unrolled-protocol mini_train A/B) is dropped: its purpose was
# to separate protocol from code in the 874-vs-777 train confound, and
# the default refresh [R2Q-4] already measured 902.1 img/s > 874 under
# the current protocol — no regression left to localize.
#
# Waits for the r2q script pid passed as $1.
# Stop marker: .queue_stop_r2s
cd "$(dirname "$0")/.."
REPO=$PWD
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

stop() { [ -e "$REPO/.queue_stop_r2s" ] && echo "=== STOPPED by .queue_stop_r2s $(date) ===" && exit 0; }

if [ -n "$1" ]; then
  echo "=== waiting for queue_r2q pid $1 $(date) ==="
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
rm -f "$REPO/.queue_stop_r2q"

# --- mini north-star perf levers (former batch R) ---
stop; echo "=== [R2S-1] mini fwd MLAFF_WSTACK=2 $(date) ==="
MLAFF_WSTACK=2 timeout 3600 python bench.py
stop; echo "=== [R2S-2] mini fwd MLAFF_WSTACK=4 $(date) ==="
MLAFF_WSTACK=4 timeout 3600 python bench.py
stop; echo "=== [R2S-3] small fwd MLAFF_WSTACK=2 $(date) ==="
MLAFF_WSTACK=2 timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2S-4] mini fwd STACK_NMAX=800 GB_CAP=2 (fit scoped vmem) $(date) ==="
MLAFF_STACK_NMAX=800 MLAFF_STACK_GB=2 timeout 3600 python bench.py
stop; echo "=== [R2S-5] small fwd STACK_NMAX=800 GB_CAP=2 $(date) ==="
MLAFF_STACK_NMAX=800 MLAFF_STACK_GB=2 timeout 3600 python scripts/bench_train.py fwd small

# --- fresh profile to aim the next glue kernel ---
stop; echo "=== [R2S-6] mini fwd profile (post-winners) $(date) ==="
timeout 3600 python scripts/profile_fwd.py mini || true

# --- missing benchmark families (VERDICT r1 item 4) ---
stop; echo "=== [R2S-7] maskfiner_ud fwd b64 $(date) ==="
timeout 7200 python scripts/bench_maskfiner.py 64
stop; echo "=== [R2S-8] maskfiner_ud train b32 $(date) ==="
timeout 9000 python scripts/bench_maskfiner.py 32 train

# --- published-FPS preset table ---
for preset in tiny mini_1_5th tiny_1_5th small_1_5th; do
  stop; echo "=== [R2S-9] fwd $preset $(date) ==="
  timeout 5400 python scripts/bench_train.py fwd "$preset"
done
stop; echo "=== [R2S-10] fwd base_22kto1k_384 $(date) ==="
timeout 7200 python scripts/bench_train.py fwd base_22kto1k_384

# --- train capacity A/B ---
stop; echo "=== [R2S-11] mini_train REMAT=blocks $(date) ==="
MLAFF_BENCH_OPTS="TPU.REMAT blocks" timeout 5400 python scripts/bench_train.py mini_train

# --- final default refreshes (pick up any default flips landed above) ---
stop; echo "=== [R2S-12] FINAL bench.py default refresh $(date) ==="
timeout 3600 python bench.py
stop; echo "=== [R2S-13] FINAL small fwd default refresh $(date) ==="
timeout 3600 python scripts/bench_train.py fwd small
echo "=== queue_r2s done $(date) ==="
