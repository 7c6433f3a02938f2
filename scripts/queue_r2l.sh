#!/bin/bash
# Round-2 chip queue, batch L — batch K pruned: the dense/XLA routing
# A/Bs were dropped after R2J-2 measured masked-dense stage 3 at 2042 vs
# 2464 img/s on mini (n^2 bias materialization dominates; the gathered-XLA
# route moves ~1.2 GB of K/V gathers per iteration and loses by the same
# math). Remainder = small refresh, Small bisect, MaskFiner retries,
# compact A/Bs, preset table, train refreshes, profile.
# Waits for the r2k script pid passed as $1.
#
# Stop marker: .queue_stop_r2l
cd "$(dirname "$0")/.."
REPO=$PWD
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

stop() { [ -e "$REPO/.queue_stop_r2l" ] && echo "=== STOPPED by .queue_stop_r2l $(date) ===" && exit 0; }

if [ -n "$1" ]; then
  echo "=== waiting for queue_r2k pid $1 $(date) ==="
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
rm -f "$REPO/.queue_stop_r2k"  # set to hand K's tail over to this batch

# --- current-tree lowering disentangle: LN dot-vs-vpu x aux fused-vs-split
# (2483 was measured before the aux-gather fusion c5ad098; vpu-LN + fused
# measured 2465 — find which knob carries the -18 on TODAY's tree) ---
stop; echo "=== [R2L-A1] mini fwd MLAFF_LN=dot (fused aux) $(date) ==="
MLAFF_LN=dot timeout 3600 python bench.py
stop; echo "=== [R2L-A2] mini fwd MLAFF_AUX_GATHER=split (vpu LN) $(date) ==="
MLAFF_AUX_GATHER=split timeout 3600 python bench.py
stop; echo "=== [R2L-A3] mini fwd MLAFF_LN=dot MLAFF_AUX_GATHER=split (the 2483 config) $(date) ==="
MLAFF_LN=dot MLAFF_AUX_GATHER=split timeout 3600 python bench.py

stop; echo "=== [R2L-7] small fwd DEFAULT refresh (LN=vpu) $(date) ==="
timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2L-8] small fwd @ 39261d5 (pre-resident-K/V bisect, fori protocol) $(date) ==="
( cd "$REPO/.bisect/pre-resident" && PYTHONPATH=$PWD:/root/.axon_site timeout 3600 python scripts/bench_train.py fwd small )
stop; echo "=== [R2L-9] small fwd @ 148fde0 (post-resident-K/V bisect) $(date) ==="
( cd "$REPO/.bisect/post-resident" && PYTHONPATH=$PWD:/root/.axon_site timeout 3600 python scripts/bench_train.py fwd small )
stop; echo "=== [R2L-10] maskfiner_ud fwd b64 retry (cached sub-compiles) $(date) ==="
timeout 5400 python scripts/bench_maskfiner.py 64
stop; echo "=== [R2L-11] maskfiner_ud train b32 retry (cached sub-compiles) $(date) ==="
timeout 7200 python scripts/bench_maskfiner.py 32 train
stop; echo "=== [R2L-12] parity_probe MLAFF_COMPACT=1 $(date) ==="
MLAFF_COMPACT=1 timeout 3000 python scripts/parity_probe.py
stop; echo "=== [R2L-13] stage1 kernel: window baseline $(date) ==="
timeout 3000 python scripts/bench_stage1.py 128
stop; echo "=== [R2L-13b] compact $(date) ==="
MLAFF_COMPACT=1 timeout 3000 python scripts/bench_stage1.py 128
stop; echo "=== [R2L-13c] bands $(date) ==="
MLAFF_BANDS=1 timeout 3000 python scripts/bench_stage1.py 128
stop; echo "=== [R2L-13d] bench.py MLAFF_COMPACT=1 (model-level) $(date) ==="
MLAFF_COMPACT=1 timeout 3600 python bench.py
for preset in tiny mini_1_5th tiny_1_5th small_1_5th; do
  stop; echo "=== [R2L-14] fwd $preset $(date) ==="
  timeout 5400 python scripts/bench_train.py fwd "$preset"
done
stop; echo "=== [R2L-15] fwd base_22kto1k_384 $(date) ==="
timeout 7200 python scripts/bench_train.py fwd base_22kto1k_384
stop; echo "=== [R2L-16] mini_train DEFAULT refresh $(date) ==="
timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2L-17] mini_train MLAFF_CHAIN=unroll (protocol A/B for 874->777) $(date) ==="
MLAFF_CHAIN=unroll timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2L-18] mini_train REMAT=blocks $(date) ==="
MLAFF_BENCH_OPTS="TPU.REMAT blocks" timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2L-19] mini fwd profile (post-winners) $(date) ==="
timeout 3600 python scripts/profile_fwd.py mini || true
echo "=== queue_r2l done $(date) ==="
