#!/bin/bash
# Round-2 chip queue, batch N — the consolidated remaining backlog,
# ordered by north-star value (replaces the waiting batches L and M):
#  A. current-tree lowering disentangle (LN dot/vpu x aux fused/split —
#     the 2483-vs-2465 mini delta)
#  B. compact-union window A/Bs (stage-1 plane width cut 2-3x)
#  C. TWIN / STACK dispatch-mode A/Bs (stage-2 window, stage-3/4 stacking)
#  D. small default refresh + pre/post-resident bisect
#  E. mini_train refresh + protocol/remat A/Bs
#  F. MaskFiner-UD fwd b64 + train b32 retries (cached sub-compiles)
#  G. published-FPS preset table + base384
#  H. post-winners mini profile
# Waits for the r2k script pid passed as $1.
#
# Stop marker: .queue_stop_r2n
cd "$(dirname "$0")/.."
REPO=$PWD
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

stop() { [ -e "$REPO/.queue_stop_r2n" ] && echo "=== STOPPED by .queue_stop_r2n $(date) ===" && exit 0; }

if [ -n "$1" ]; then
  echo "=== waiting for queue_r2k pid $1 $(date) ==="
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
rm -f "$REPO/.queue_stop_r2k"

stop; echo "=== [R2N-A1] mini fwd MLAFF_LN=dot (fused aux) $(date) ==="
MLAFF_LN=dot timeout 3600 python bench.py
stop; echo "=== [R2N-A2] mini fwd MLAFF_AUX_GATHER=split (vpu LN) $(date) ==="
MLAFF_AUX_GATHER=split timeout 3600 python bench.py
stop; echo "=== [R2N-A3] mini fwd MLAFF_LN=dot MLAFF_AUX_GATHER=split (the 2483 config) $(date) ==="
MLAFF_LN=dot MLAFF_AUX_GATHER=split timeout 3600 python bench.py

stop; echo "=== [R2N-B1] parity_probe MLAFF_COMPACT=1 $(date) ==="
MLAFF_COMPACT=1 timeout 3000 python scripts/parity_probe.py
stop; echo "=== [R2N-B2] stage1 kernel: window baseline $(date) ==="
timeout 3000 python scripts/bench_stage1.py 128
stop; echo "=== [R2N-B2b] compact $(date) ==="
MLAFF_COMPACT=1 timeout 3000 python scripts/bench_stage1.py 128
stop; echo "=== [R2N-B2c] bands $(date) ==="
MLAFF_BANDS=1 timeout 3000 python scripts/bench_stage1.py 128
stop; echo "=== [R2N-B3] bench.py MLAFF_COMPACT=1 (model-level) $(date) ==="
MLAFF_COMPACT=1 timeout 3600 python bench.py

stop; echo "=== [R2N-C1] mini fwd MLAFF_STACK=1 $(date) ==="
MLAFF_STACK=1 timeout 3600 python bench.py
stop; echo "=== [R2N-C2] mini fwd MLAFF_TWIN=1 $(date) ==="
MLAFF_TWIN=1 timeout 3600 python bench.py
stop; echo "=== [R2N-C3] mini fwd MLAFF_TWIN=1 MLAFF_STACK=1 $(date) ==="
MLAFF_TWIN=1 MLAFF_STACK=1 timeout 3600 python bench.py
stop; echo "=== [R2N-C4] small fwd MLAFF_STACK=1 $(date) ==="
MLAFF_STACK=1 timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2N-C5] small fwd MLAFF_TWIN=1 $(date) ==="
MLAFF_TWIN=1 timeout 3600 python scripts/bench_train.py fwd small

stop; echo "=== [R2N-D1] small fwd DEFAULT refresh (LN=vpu) $(date) ==="
timeout 3600 python scripts/bench_train.py fwd small
stop; echo "=== [R2N-D2] small fwd @ 39261d5 (pre-resident-K/V bisect, fori protocol) $(date) ==="
( cd "$REPO/.bisect/pre-resident" && PYTHONPATH=$PWD:/root/.axon_site timeout 3600 python scripts/bench_train.py fwd small )
stop; echo "=== [R2N-D3] small fwd @ 148fde0 (post-resident-K/V bisect) $(date) ==="
( cd "$REPO/.bisect/post-resident" && PYTHONPATH=$PWD:/root/.axon_site timeout 3600 python scripts/bench_train.py fwd small )

stop; echo "=== [R2N-E1] mini_train DEFAULT refresh $(date) ==="
timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2N-E2] mini_train MLAFF_CHAIN=unroll (protocol A/B for 874->777) $(date) ==="
MLAFF_CHAIN=unroll timeout 5400 python scripts/bench_train.py mini_train
stop; echo "=== [R2N-E3] mini_train REMAT=blocks $(date) ==="
MLAFF_BENCH_OPTS="TPU.REMAT blocks" timeout 5400 python scripts/bench_train.py mini_train

stop; echo "=== [R2N-F1] maskfiner_ud fwd b64 retry (cached sub-compiles) $(date) ==="
timeout 5400 python scripts/bench_maskfiner.py 64
stop; echo "=== [R2N-F2] maskfiner_ud train b32 retry (cached sub-compiles) $(date) ==="
timeout 7200 python scripts/bench_maskfiner.py 32 train

for preset in tiny mini_1_5th tiny_1_5th small_1_5th; do
  stop; echo "=== [R2N-G1] fwd $preset $(date) ==="
  timeout 5400 python scripts/bench_train.py fwd "$preset"
done
stop; echo "=== [R2N-G2] fwd base_22kto1k_384 $(date) ==="
timeout 7200 python scripts/bench_train.py fwd base_22kto1k_384

stop; echo "=== [R2N-H1] mini fwd profile (post-winners) $(date) ==="
timeout 3600 python scripts/profile_fwd.py mini || true
echo "=== queue_r2n done $(date) ==="
