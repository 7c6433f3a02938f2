#!/bin/bash
# Round-2 chip queue, batch J — consolidated replacement for the tails of
# batches F/G/H/I after the merge-kernel A/Bs resolved (v2 compiles and is
# parity-clean but LOSES: mini 2346 vs 2483, small 961 vs 961 — stays
# opt-in). Priorities: (1) refreshed default mini bench (LN=vpu + per-
# preset WF ic now code defaults), (2) the masked-dense / XLA-path routing
# A/Bs, (3) Small bisect, (4) MaskFiner retries, (5) compact A/Bs,
# (6) the published-FPS preset table, (7) remat + protocol A/Bs,
# (8) final default refresh + profile.
# Waits for the r2i script pid passed as $1 (the last of the old chain).
#
# Stop marker: .queue_stop_r2j
cd "$(dirname "$0")/.."
REPO=$PWD
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

stop() { [ -e "$REPO/.queue_stop_r2j" ] && echo "=== STOPPED by .queue_stop_r2j $(date) ===" && exit 0; }

if [ -n "$1" ]; then
  echo "=== waiting for queue_r2i pid $1 $(date) ==="
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
rm -f "$REPO/.queue_stop_r2f"  # was set solely to retire the F/G/H/I tails

stop; echo "=== [R2J-1] bench.py DEFAULT refresh (LN=vpu + mini WF=ic defaults) $(date) ==="
timeout 3600 python bench.py
stop; echo "=== [R2J-2] mini fwd MLAFF_DENSE_NMAX=200 (stage 3 masked-dense) $(date) ==="
MLAFF_DENSE_NMAX=200 timeout 3600 python bench.py
stop; echo "=== [R2J-3] mini fwd MLAFF_DENSE_NMAX=800 (stages 2-3 masked-dense) $(date) ==="
MLAFF_DENSE_NMAX=800 timeout 3600 python bench.py
stop; echo "=== [R2J-4] mini fwd MLAFF_XLA_NMAX=200 (stage 3 gathered-XLA) $(date) ==="
MLAFF_XLA_NMAX=200 timeout 3600 python bench.py
stop; echo "=== [R2J-5] small fwd MLAFF_DENSE_NMAX=200 $(date) ==="
MLAFF_DENSE_NMAX=200 timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2J-6] small fwd MLAFF_DENSE_NMAX=800 $(date) ==="
MLAFF_DENSE_NMAX=800 timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2J-7] small fwd DEFAULT refresh (LN=vpu) $(date) ==="
timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2J-8] small fwd @ 39261d5 (pre-resident-K/V bisect, fori protocol) $(date) ==="
( cd "$REPO/.bisect/pre-resident" && PYTHONPATH=$PWD:/root/.axon_site timeout 3600 python scripts/bench_train.py fwd small )
stop; echo "=== [R2J-9] small fwd @ 148fde0 (post-resident-K/V bisect) $(date) ==="
( cd "$REPO/.bisect/post-resident" && PYTHONPATH=$PWD:/root/.axon_site timeout 3600 python scripts/bench_train.py fwd small )
stop; echo "=== [R2J-10] maskfiner_ud fwd b64 retry (cached sub-compiles) $(date) ==="
timeout 5400 python scripts/bench_maskfiner.py 64
stop; echo "=== [R2J-11] maskfiner_ud train b32 retry (cached sub-compiles) $(date) ==="
timeout 7200 python scripts/bench_maskfiner.py 32 train
stop; echo "=== [R2J-12] parity_probe MLAFF_COMPACT=1 $(date) ==="
MLAFF_COMPACT=1 timeout 3000 python scripts/parity_probe.py
stop; echo "=== [R2J-13] stage1 kernel: window vs compact vs bands $(date) ==="
timeout 3000 python scripts/bench_stage1.py 128
stop; echo "=== [R2J-13b] compact $(date) ==="
MLAFF_COMPACT=1 timeout 3000 python scripts/bench_stage1.py 128
stop; echo "=== [R2J-13c] bands $(date) ==="
MLAFF_BANDS=1 timeout 3000 python scripts/bench_stage1.py 128
for preset in tiny mini_1_5th tiny_1_5th small_1_5th; do
  stop; echo "=== [R2J-14] fwd $preset $(date) ==="
  timeout 5400 python scripts/bench_train.py fwd "$preset"
done
stop; echo "=== [R2J-15] fwd base_22kto1k_384 $(date) ==="
timeout 7200 python scripts/bench_train.py fwd base_22kto1k_384
stop; echo "=== [R2J-16] mini_train DEFAULT refresh $(date) ==="
timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2J-17] mini_train MLAFF_CHAIN=unroll (protocol A/B for 874->777) $(date) ==="
MLAFF_CHAIN=unroll timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2J-18] mini_train REMAT=blocks $(date) ==="
MLAFF_BENCH_OPTS="TPU.REMAT blocks" timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2J-19] mini fwd profile (post-winners) $(date) ==="
timeout 3600 python scripts/profile_fwd.py mini || true
echo "=== queue_r2j done $(date) ==="
