#!/bin/bash
# Round-2 chip queue, batch D (after queue_r2c): the never-A/Bed kernel
# window layouts — compact-union (MLAFF_COMPACT=1, cuts the stage-1
# masked plane width ~2-3x) and banded resident-K/V slicing
# (MLAFF_BANDS=1, no extra DMAs now that K/V are resident) — first at
# kernel level (fast), then model-level bench.py for winners; plus the
# MaskFiner-UD fwd retry in case r2a's R2-9 timed out (its sub-compiles
# are cached, a retry resumes progress). Waits for the r2c pid in $1.
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

stop() { [ -e .queue_stop_r2c ] && echo "=== STOPPED by .queue_stop_r2c $(date) ===" && exit 0; }

if [ -n "$1" ]; then
  echo "=== waiting for queue_r2c pid $1 $(date) ==="
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

stop; echo "=== [R2D-0] parity_probe MLAFF_COMPACT=1 (Mosaic numerics before benching) $(date) ==="
MLAFF_COMPACT=1 timeout 3000 python scripts/parity_probe.py
stop; echo "=== [R2D-1] stage1 kernel bench: compact vs window vs bands $(date) ==="
timeout 3000 python scripts/bench_stage1.py 128
stop; echo "=== [R2D-1b] compact $(date) ==="
MLAFF_COMPACT=1 timeout 3000 python scripts/bench_stage1.py 128
stop; echo "=== [R2D-1c] bands $(date) ==="
MLAFF_BANDS=1 timeout 3000 python scripts/bench_stage1.py 128
stop; echo "=== [R2D-2] bench.py MLAFF_COMPACT=1 (model-level) $(date) ==="
MLAFF_COMPACT=1 timeout 3600 python bench.py
stop; echo "=== [R2D-3] maskfiner_ud fwd b64 retry $(date) ==="
timeout 5400 python scripts/bench_maskfiner.py 64
echo "=== queue_r2d done $(date) ==="
