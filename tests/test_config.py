"""Config system: defaults, BASE inheritance, opts merge, CLI overrides."""

import os

import pytest

from ml_autofocusformermod_tpu.config import default_config, load_config

CFG_DIR = os.path.join(
    os.path.dirname(__file__), "..", "ml_autofocusformermod_tpu", "configs"
)


def test_defaults_frozen():
    c = default_config().freeze()
    with pytest.raises(AttributeError):
        c.SEED = 1
    c.defrost()
    c.SEED = 1
    assert c.SEED == 1


def test_unknown_key_rejected():
    c = default_config()
    with pytest.raises(KeyError):
        c.merge_from_dict({"NOPE": 1})
    with pytest.raises(KeyError):
        c.merge_from_list(["MODEL.DOES_NOT_EXIST", "3"])


def test_load_aff_small():
    c = load_config(os.path.join(CFG_DIR, "aff_small.yaml"))
    assert c.MODEL.TYPE == "aff"
    assert c.MODEL.NAME == "aff_small_1_4th"
    assert c.MODEL.AFF.DEPTHS == [3, 4, 18, 2]
    assert c.MODEL.AFF.EMBED_DIM == [96, 192, 384, 768]
    assert c.MODEL.AFF.LAYER_SCALE == 1e-5
    assert c.MODEL.DROP_PATH_RATE == 0.3
    assert c.AUG.MIXUP == 0.8
    assert c.OUTPUT == os.path.join("", "aff_small_1_4th", "default")


def test_all_presets_load():
    for name in sorted(n for n in os.listdir(CFG_DIR) if n.endswith(".yaml")):
        c = load_config(os.path.join(CFG_DIR, name))
        assert c.MODEL.TYPE in ("aff", "maskfinerOT", "maskfinerUD"), name


def test_base_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("TRAIN:\n  EPOCHS: 100\nSEED: 7\n")
    child = tmp_path / "child.yaml"
    child.write_text("BASE: ['base.yaml']\nTRAIN:\n  BASE_LR: 0.001\n")
    c = load_config(str(child))
    assert c.TRAIN.EPOCHS == 100
    assert c.SEED == 7
    assert c.TRAIN.BASE_LR == 0.001


def test_opts_and_cli_overrides():
    c = load_config(
        os.path.join(CFG_DIR, "aff_mini.yaml"),
        opts=["TRAIN.EPOCHS", "5", "MODEL.AFF.DS_RATE", "0.2"],
        batch_size=64,
        eval=True,
        tag="exp1",
    )
    assert c.TRAIN.EPOCHS == 5
    assert c.MODEL.AFF.DS_RATE == 0.2
    assert c.DATA.BATCH_SIZE == 64
    assert c.EVAL_MODE is True
    assert c.OUTPUT.endswith(os.path.join("aff_mini_1_4th", "exp1"))


def test_build_model_from_config():
    from ml_autofocusformermod_tpu.models.build import build_model

    c = load_config(os.path.join(CFG_DIR, "aff_mini.yaml"))
    model = build_model(c)
    assert model.embed_dim == (32, 128, 256, 384)
    assert model.depths == (2, 2, 6, 2)
