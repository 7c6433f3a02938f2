"""End-to-end CLI training: multi-epoch run with EMA + metrics JSONL, and
checkpoint-interrupt-resume producing a BITWISE-identical continuation
(VERDICT r1 item 10; reference trainer ``main.py:169-193``, exact-resume
RNG semantics ``utils.py:44-48,64-67``)."""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG_DIR = os.path.join(REPO, "ml_autofocusformermod_tpu", "configs")

TINY_OPTS = [
    "DATA.IMG_SIZE", "56",
    "MODEL.NUM_CLASSES", "10",
    "MODEL.AFF.EMBED_DIM", "[16,32,48,64]",
    "MODEL.AFF.DEPTHS", "[1,1,1,1]",
    "MODEL.AFF.NUM_HEADS", "[2,2,4,4]",
    "TPU.COMPUTE_DTYPE", "float32",
    "TRAIN.WARMUP_EPOCHS", "0",
    "TRAIN.USE_EMA", "True",
    "SAVE_FREQ", "1",
    "EVAL_FREQ", "1",
    "PRINT_FREQ", "2",
]


def _run(tmp_path, out_name, epochs):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    cmd = [
        sys.executable, os.path.join(REPO, "main.py"),
        "--cfg", os.path.join(CFG_DIR, "aff_mini.yaml"),
        "--batch-size", "8",
        "--epochs", str(epochs),
        "--data-path", str(tmp_path / "none"),
        "--output", str(tmp_path / out_name),
        "--opts", *TINY_OPTS,
    ]
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=1800
    )
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-4000:]
    return out.stdout, tmp_path / out_name / "aff_mini_1_4th" / "default"


def _load_state_tree(ckpt_dir):
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(str(ckpt_dir)))


def test_train_resume_bitwise_and_metrics(tmp_path):
    # --- run A: two epochs straight through ---
    stdout_a, out_a = _run(tmp_path, "A", epochs=2)
    assert "EMA Accuracy" in stdout_a  # EMA eval ran (main.py:361-367)
    assert (out_a / "ckpt_epoch_0").isdir() if hasattr(
        out_a / "ckpt_epoch_0", "isdir"
    ) else os.path.isdir(out_a / "ckpt_epoch_0")
    assert os.path.isdir(out_a / "ckpt_epoch_1")

    # metrics JSONL: train loss logged; epoch-1 average below epoch-0's
    # first logged loss (synthetic labels are a memorizable function)
    with open(out_a / "metrics.jsonl") as f:
        recs = [json.loads(l) for l in f]
    losses = [r["train/loss"] for r in recs if "train/loss" in r]
    assert len(losses) >= 4
    assert min(losses[len(losses) // 2:]) < losses[0], (
        f"loss never improved: {losses}"
    )
    assert any("val/acc1" in r for r in recs)

    # --- run B: epoch 0's checkpoint copied into a fresh dir, auto-resume
    # trains epoch 1 only — must continue BITWISE identically ---
    out_b = tmp_path / "B" / "aff_mini_1_4th" / "default"
    os.makedirs(out_b)
    shutil.copytree(out_a / "ckpt_epoch_0", out_b / "ckpt_epoch_0")
    stdout_b, _ = _run(tmp_path, "B", epochs=2)
    assert "resumed from" in stdout_b

    tree_a = _load_state_tree(out_a / "ckpt_epoch_1")
    tree_b = _load_state_tree(out_b / "ckpt_epoch_1")
    import jax

    leaves_a = jax.tree_util.tree_leaves_with_path(tree_a)
    leaves_b = jax.tree_util.tree_leaves_with_path(tree_b)
    assert len(leaves_a) == len(leaves_b)
    mismatched = [
        jax.tree_util.keystr(pa)
        for (pa, a), (_, b) in zip(leaves_a, leaves_b)
        # meta.max_accuracy legitimately differs: checkpoints are saved
        # BEFORE the epoch's validation updates it (same ordering as the
        # reference, main.py:174-186), so the resumed run cannot know
        # epoch-0's accuracy. Every bit of actual training state (params,
        # moments, EMA, BN stats, RNG, step) must match.
        if "max_accuracy" not in jax.tree_util.keystr(pa)
        and not np.array_equal(np.asarray(a), np.asarray(b))
    ]
    assert not mismatched, (
        f"resume not bitwise identical: {mismatched[:10]}"
    )
