#!/bin/bash
# Round-2 chip queue, batch K — batch-size throughput A/B inserted ahead
# of the remaining batch-J items (per-iteration glue may amortize at
# b256/b512; the reference's own protocol benches one saturating batch),
# then the rest of batch J verbatim (J stopped after its in-flight item).
# NOTE: R2J-1/2 ran with the short-lived mini WF=ic default (since
# reverted); items here run with the vpu default.
# Waits for the r2j script pid passed as $1.
#
# Stop marker: .queue_stop_r2k
cd "$(dirname "$0")/.."
REPO=$PWD
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

stop() { [ -e "$REPO/.queue_stop_r2k" ] && echo "=== STOPPED by .queue_stop_r2k $(date) ===" && exit 0; }

if [ -n "$1" ]; then
  echo "=== waiting for queue_r2j pid $1 $(date) ==="
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
rm -f "$REPO/.queue_stop_r2j"

stop; echo "=== [R2K-0] bench.py DEFAULT (vpu WF restored) b128 $(date) ==="
timeout 3600 python bench.py
stop; echo "=== [R2K-1] bench.py b256 $(date) ==="
MLAFF_BATCH=256 timeout 3600 python bench.py
stop; echo "=== [R2K-2] bench.py b512 $(date) ==="
MLAFF_BATCH=512 timeout 3600 python bench.py
stop; echo "=== [R2K-3] mini fwd MLAFF_DENSE_NMAX=800 (stages 2-3 masked-dense) $(date) ==="
MLAFF_DENSE_NMAX=800 timeout 3600 python bench.py
stop; echo "=== [R2K-4] mini fwd MLAFF_XLA_NMAX=200 (stage 3 gathered-XLA) $(date) ==="
MLAFF_XLA_NMAX=200 timeout 3600 python bench.py
stop; echo "=== [R2K-5] small fwd MLAFF_DENSE_NMAX=200 $(date) ==="
MLAFF_DENSE_NMAX=200 timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2K-6] small fwd MLAFF_DENSE_NMAX=800 $(date) ==="
MLAFF_DENSE_NMAX=800 timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2K-7] small fwd DEFAULT refresh (LN=vpu) $(date) ==="
timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2K-8] small fwd @ 39261d5 (pre-resident-K/V bisect, fori protocol) $(date) ==="
( cd "$REPO/.bisect/pre-resident" && PYTHONPATH=$PWD:/root/.axon_site timeout 3600 python scripts/bench_train.py fwd small )
stop; echo "=== [R2K-9] small fwd @ 148fde0 (post-resident-K/V bisect) $(date) ==="
( cd "$REPO/.bisect/post-resident" && PYTHONPATH=$PWD:/root/.axon_site timeout 3600 python scripts/bench_train.py fwd small )
stop; echo "=== [R2K-10] maskfiner_ud fwd b64 retry (cached sub-compiles) $(date) ==="
timeout 5400 python scripts/bench_maskfiner.py 64
stop; echo "=== [R2K-11] maskfiner_ud train b32 retry (cached sub-compiles) $(date) ==="
timeout 7200 python scripts/bench_maskfiner.py 32 train
stop; echo "=== [R2K-12] parity_probe MLAFF_COMPACT=1 $(date) ==="
MLAFF_COMPACT=1 timeout 3000 python scripts/parity_probe.py
stop; echo "=== [R2K-13] stage1 kernel: window baseline $(date) ==="
timeout 3000 python scripts/bench_stage1.py 128
stop; echo "=== [R2K-13b] compact $(date) ==="
MLAFF_COMPACT=1 timeout 3000 python scripts/bench_stage1.py 128
stop; echo "=== [R2K-13c] bands $(date) ==="
MLAFF_BANDS=1 timeout 3000 python scripts/bench_stage1.py 128
for preset in tiny mini_1_5th tiny_1_5th small_1_5th; do
  stop; echo "=== [R2K-14] fwd $preset $(date) ==="
  timeout 5400 python scripts/bench_train.py fwd "$preset"
done
stop; echo "=== [R2K-15] fwd base_22kto1k_384 $(date) ==="
timeout 7200 python scripts/bench_train.py fwd base_22kto1k_384
stop; echo "=== [R2K-16] mini_train DEFAULT refresh $(date) ==="
timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2K-17] mini_train MLAFF_CHAIN=unroll (protocol A/B for 874->777) $(date) ==="
MLAFF_CHAIN=unroll timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2K-18] mini_train REMAT=blocks $(date) ==="
MLAFF_BENCH_OPTS="TPU.REMAT blocks" timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2K-19] mini fwd profile (post-winners) $(date) ==="
timeout 3600 python scripts/profile_fwd.py mini || true
echo "=== queue_r2k done $(date) ==="
