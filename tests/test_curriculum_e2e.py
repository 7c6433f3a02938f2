"""Curriculum + smoke e2e of main.py entry surfaces (synthetic data)."""

import os
import subprocess
import sys

import pytest

from ml_autofocusformermod_tpu.train import curriculum

CFG_DIR = os.path.join(
    os.path.dirname(__file__), "..", "ml_autofocusformermod_tpu", "configs"
)
REPO = os.path.join(os.path.dirname(__file__), "..")


def test_get_upsample_ratio_matches_reference_formula():
    assert curriculum.get_upsample_ratio(0.5, 100, 0) == 1.0
    assert curriculum.get_upsample_ratio(0.5, 100, 100) == 0.5
    assert curriculum.get_upsample_ratio(0.5, 100, 50) == pytest.approx(0.75)


def test_epoch_ratios_quantized_and_zero_preserved():
    finals = [0.0, 0.85, 0.65, 0.5, 0.0, 0.0, 0.0]
    r0 = curriculum.epoch_upsample_ratios(finals, 300, 0)
    assert r0[0] == 0.0 and r0[1] == 1.0
    r_mid = curriculum.epoch_upsample_ratios(finals, 300, 150)
    assert r_mid[0] == 0.0
    # quantized to the 1/20 lattice
    for r in r_mid:
        assert abs(r * 20 - round(r * 20)) < 1e-9
    # monotone non-increasing toward final
    r_end = curriculum.epoch_upsample_ratios(finals, 300, 300)
    assert r_end[1] == pytest.approx(0.85)


def test_applies_to_guard():
    import jax.numpy as jnp

    from ml_autofocusformermod_tpu.config import load_config
    from ml_autofocusformermod_tpu.models.build import build_model

    aff_cfg = load_config(os.path.join(CFG_DIR, "aff_mini.yaml"))
    assert not curriculum.applies_to(build_model(aff_cfg))

    ud_cfg = load_config(os.path.join(CFG_DIR, "maskfiner_up_down_mini.yaml"))
    ud = build_model(ud_cfg)
    assert curriculum.applies_to(ud)
    assert ud.final_upsampling_ratios == list(ud_cfg.MODEL.MR.UPSCALE_RATIO)


def test_main_cli_smoke(tmp_path):
    """main.py --eval end-to-end on synthetic data (tiny model, CPU).
    Covers the --throughput surface too: the benchmark ALWAYS runs before
    eval/training, like the reference (main.py:113-118), so one
    invocation asserts both outputs."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    cmd = [
        sys.executable, os.path.join(REPO, "main.py"),
        "--cfg", os.path.join(CFG_DIR, "aff_mini.yaml"),
        "--eval",
        "--batch-size", "8",
        "--data-path", str(tmp_path / "none"),
        "--output", str(tmp_path / "out"),
        "--opts",
        "DATA.IMG_SIZE", "56",
        "MODEL.NUM_CLASSES", "10",
        "MODEL.AFF.EMBED_DIM", "[16,32,48,64]",
        "MODEL.AFF.DEPTHS", "[1,1,1,1]",
        "MODEL.AFF.NUM_HEADS", "[2,2,4,4]",
        "TPU.COMPUTE_DTYPE", "float32",
    ]
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=900
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "Accuracy of the network" in out.stdout
    assert "throughput averaged" in out.stdout


def test_main_cli_train_two_steps(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    cmd = [
        sys.executable, os.path.join(REPO, "main.py"),
        "--cfg", os.path.join(CFG_DIR, "aff_mini.yaml"),
        "--batch-size", "8",
        "--epochs", "1",
        "--data-path", str(tmp_path / "none"),
        "--output", str(tmp_path / "out"),
        "--opts",
        "DATA.IMG_SIZE", "56",
        "MODEL.NUM_CLASSES", "10",
        "MODEL.AFF.EMBED_DIM", "[16,32,48,64]",
        "MODEL.AFF.DEPTHS", "[1,1,1,1]",
        "MODEL.AFF.NUM_HEADS", "[2,2,4,4]",
        "TPU.COMPUTE_DTYPE", "float32",
        "TRAIN.WARMUP_EPOCHS", "0",
        "SAVE_FREQ", "1",
    ]
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=1800
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "Start training" in out.stdout
    assert "Accuracy" in out.stdout
    # checkpoint written and auto-resumable
    ckpts = [
        d for d in os.listdir(tmp_path / "out" / "aff_mini_1_4th" / "default")
        if d.startswith("ckpt_epoch_")
    ]
    assert ckpts, "no checkpoint written"


def test_main_cli_maskfiner_curriculum_train(tmp_path):
    """main.py trains a (tiny) MaskFiner-OT for two epochs: the upsampling
    curriculum must rebuild the model with DIFFERENT quantized ratios per
    epoch (reference main.py:231-235 semantics, crash-fixed + quantized),
    checkpoint, and validate."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    cmd = [
        sys.executable, os.path.join(REPO, "main.py"),
        "--cfg", os.path.join(CFG_DIR, "maskfiner_oracle_teacher.yaml"),
        "--batch-size", "8",
        "--epochs", "2",
        "--data-path", str(tmp_path / "none"),
        "--output", str(tmp_path / "out"),
        "--opts",
        "DATA.IMG_SIZE", "64",
        "MODEL.NUM_CLASSES", "10",
        "MODEL.MR.EMBED_DIM", "[32,24,16,8]",
        "MODEL.MR.DEPTHS", "[1,1,1,1]",
        "MODEL.MR.NUM_HEADS", "[2,2,2,2]",
        "MODEL.MR.MLP_RATIO", "[2.0,2.0,2.0,2.0]",
        "TPU.COMPUTE_DTYPE", "float32",
        "TRAIN.WARMUP_EPOCHS", "0",
        "SAVE_FREQ", "1",
        "EVAL_FREQ", "2",
        "PRINT_FREQ", "4",
    ]
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=2400
    )
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-4000:]
    ratio_lines = [
        l for l in out.stdout.splitlines() if "Upsampling ratios now" in l
    ]
    # epoch 0 anneals from 1.0, epoch 1 is half-way to the final ratios ->
    # two distinct rebuilds
    assert len(ratio_lines) == 2, out.stdout[-2000:]
    assert ratio_lines[0] != ratio_lines[1]
    assert "Start training" in out.stdout
