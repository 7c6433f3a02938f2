"""The curriculum's ratio quantization bounds recompiles (VERDICT r2 #7).

Each distinct ratio tuple is one XLA program (main.py rebuilds the model
and train/eval steps only when the quantized tuple changes). Over a full
300-epoch schedule the quantized linear anneal 1.0 -> r must produce at
most ``|r - 1| * levels + 1`` distinct values per backbone — bounded by
``quantize_levels + 1`` — independent of epoch count.
"""

import glob
import os

import pytest

from ml_autofocusformermod_tpu.config import load_config
from ml_autofocusformermod_tpu.train import curriculum

CFG_DIR = os.path.join(
    os.path.dirname(__file__), "..", "ml_autofocusformermod_tpu", "configs"
)
MASKFINER_CONFIGS = sorted(
    os.path.basename(p)
    for p in glob.glob(os.path.join(CFG_DIR, "maskfiner*.yaml"))
)

EPOCHS = 300
LEVELS = 20


@pytest.mark.parametrize("cfg_name", MASKFINER_CONFIGS)
def test_quantized_schedule_bounds_programs(cfg_name):
    cfg = load_config(os.path.join(CFG_DIR, cfg_name))
    finals = list(cfg.MODEL.MR.UPSCALE_RATIO)

    tuples = {
        tuple(
            curriculum.epoch_upsample_ratios(
                finals, EPOCHS, e, quantize_levels=LEVELS
            )
        )
        for e in range(EPOCHS)
    }
    # per-backbone: the linear path 1.0 -> r on a 1/LEVELS lattice hits
    # exactly |r-1|*LEVELS + 1 values, independent of epoch count
    per_bb = list(zip(*tuples))
    for vals, r in zip(per_bb, finals):
        if r == 0.0:
            assert set(vals) == {0.0}
            continue
        expect = round(abs(r - 1.0) * LEVELS) + 1
        assert len(set(vals)) == expect, (r, sorted(set(vals)))
    # distinct TUPLES (programs) are the union of per-backbone step
    # boundaries — still bounded by the lattice, never by epoch count
    assert len(tuples) <= LEVELS + 1, len(tuples)

    # endpoints: epoch 0 is all-1.0 (off levels stay 0), the last step is
    # within one lattice step of the configured final ratios
    first = curriculum.epoch_upsample_ratios(finals, EPOCHS, 0, LEVELS)
    assert all(v in (0.0, 1.0) for v in first)
    last = curriculum.epoch_upsample_ratios(finals, EPOCHS, EPOCHS - 1, LEVELS)
    for v, r in zip(last, finals):
        if r == 0.0:
            assert v == 0.0
        else:
            assert abs(v - r) <= 1.0 / LEVELS + 1e-9


def test_quantize_lattice():
    assert curriculum.quantize(0.876, 20) == 0.9
    assert curriculum.quantize(0.874, 20) == 0.85
    assert curriculum.quantize(0.5, 0) == 0.5  # levels<=0: pass-through
