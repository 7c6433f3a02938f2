"""Data pipeline + orbax checkpoint round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from ml_autofocusformermod_tpu.config import load_config
from ml_autofocusformermod_tpu.data import imagenet, transforms

CFG_DIR = os.path.join(
    os.path.dirname(__file__), "..", "ml_autofocusformermod_tpu", "configs"
)


def make_fake_imagenet(root, n_classes=3, n_per_class=4, size=64):
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for c in range(n_classes):
            d = os.path.join(root, split, f"class_{c}")
            os.makedirs(d, exist_ok=True)
            for i in range(n_per_class):
                arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
                Image.fromarray(arr).save(os.path.join(d, f"img_{i}.jpg"))


@pytest.fixture()
def cfg(tmp_path):
    c = load_config(os.path.join(CFG_DIR, "aff_mini.yaml"))
    c.defrost()
    c.DATA.DATA_PATH = str(tmp_path / "imagenet")
    c.DATA.IMG_SIZE = 32
    c.DATA.BATCH_SIZE = 4
    c.DATA.NUM_WORKERS = 0
    return c


def test_folder_loader(cfg, tmp_path):
    make_fake_imagenet(cfg.DATA.DATA_PATH)
    train_loader, val_loader, num_classes = imagenet.build_loaders(cfg.freeze())
    assert num_classes == 3
    batches = list(train_loader)
    assert len(batches) == 3  # 12 imgs / bs 4
    b = batches[0]
    assert b["image"].shape == (4, 32, 32, 3)
    assert b["image"].dtype == np.float32
    assert b["label"].min() >= 0 and b["label"].max() < 3
    # val covers all samples (drop_last False)
    n_val = sum(vb["label"].shape[0] for vb in val_loader)
    assert n_val == 12


def test_loader_host_sharding(cfg):
    make_fake_imagenet(cfg.DATA.DATA_PATH, n_classes=2, n_per_class=8)
    cfg.freeze()
    ds, _ = imagenet.build_dataset(cfg, is_train=True)
    l0 = imagenet.Loader(ds, 2, shuffle=True, host=0, num_hosts=2, seed=1)
    l1 = imagenet.Loader(ds, 2, shuffle=True, host=1, num_hosts=2, seed=1)
    lab0 = np.concatenate([b["label"] for b in l0])
    lab1 = np.concatenate([b["label"] for b in l1])
    assert len(lab0) == len(lab1) == 8  # half each
    # epoch reshuffling changes the shard
    l0.set_epoch(1)
    lab0b = np.concatenate([b["label"] for b in l0])
    assert len(lab0b) == 8


def test_val_sharding_padded_equal_batches(cfg):
    """Strided val sharding pads with sentinels so every host yields the
    same number of batches (multi-host eval steps are collective), and the
    ``valid`` mask excludes the padding from metrics."""
    # 2 classes x 5 imgs = 10 val samples over 4 hosts -> 3/3/2/2
    make_fake_imagenet(cfg.DATA.DATA_PATH, n_classes=2, n_per_class=5)
    cfg.freeze()
    ds, _ = imagenet.build_dataset(cfg, is_train=False)
    loaders = [
        imagenet.Loader(
            ds, 2, shuffle=False, host=h, num_hosts=4, seed=1,
            drop_last=False, stride_shard=True,
        )
        for h in range(4)
    ]
    all_batches = [list(l) for l in loaders]
    counts = [len(bs) for bs in all_batches]
    assert counts == [counts[0]] * 4  # equal batch counts on every host
    assert all(len(l) == counts[0] for l in loaders)  # __len__ agrees
    n_valid = sum(
        int(b.get("valid", np.ones(b["label"].shape[0], bool)).sum())
        for bs in all_batches
        for b in bs
    )
    assert n_valid == 10  # padding excluded, every real sample once
    # padded rows are flagged invalid
    last = all_batches[2][-1]
    assert "valid" in last and not bool(last["valid"][-1])


def test_eval_step_ignores_padding():
    """make_eval_step with a validity mask matches the unpadded metrics."""
    from ml_autofocusformermod_tpu.train import trainer

    class _Head:
        def apply(self, variables, images, training=False, mutable=()):
            return images  # images already (b, num_classes) logits

    c = load_config(os.path.join(CFG_DIR, "aff_mini.yaml"))
    step = trainer.make_eval_step(c, _Head())
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(6, 7)).astype(np.float32)
    labels = rng.integers(0, 7, size=(6,)).astype(np.int32)
    ref = step({}, {}, {"image": jnp.asarray(logits), "label": jnp.asarray(labels)})
    padded = trainer.pad_batch_to_multiple(
        {"image": logits, "label": labels}, multiple=4
    )
    assert padded["label"].shape[0] == 8
    out = step(
        {},
        {},
        {k: jnp.asarray(v) for k, v in padded.items()},
    )
    for k in ("loss_sum", "top1", "top5", "count"):
        np.testing.assert_allclose(out[k], ref[k], rtol=1e-6)


def test_synthetic_fallback(cfg):
    cfg.DATA.DATA_PATH = "/nonexistent/path"
    cfg.freeze()
    train_loader, val_loader, num_classes = imagenet.build_loaders(cfg)
    b = next(iter(train_loader))
    assert b["image"].shape == (4, 32, 32, 3)


def test_transforms_shapes():
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (80, 100, 3), dtype=np.uint8)
    )
    import random

    rng = random.Random(0)
    c = load_config(os.path.join(CFG_DIR, "aff_small.yaml"))
    c.defrost()
    c.DATA.IMG_SIZE = 48
    tt = transforms.TrainTransform(c)
    out = tt(img, rng)
    assert out.shape == (48, 48, 3) and out.dtype == np.float32
    et = transforms.EvalTransform(c)
    out = et(img)
    assert out.shape == (48, 48, 3)
    # rand augment policy parses
    ra = transforms.parse_rand_augment("rand-m9-mstd0.5-inc1")
    assert ra.magnitude == 9 and ra.mstd == 0.5


def test_checkpoint_roundtrip(tmp_path):
    from ml_autofocusformermod_tpu.ckpt import orbax_io
    from ml_autofocusformermod_tpu.models.aff import AutoFocusFormer
    from ml_autofocusformermod_tpu.train import trainer

    c = load_config(os.path.join(CFG_DIR, "aff_mini.yaml"))
    c.defrost()
    c.MODEL.NUM_CLASSES = 10
    c.freeze()
    model = AutoFocusFormer(
        num_classes=10, embed_dim=(16, 32, 48, 64), depths=(1, 1, 1, 1),
        num_heads=(2, 2, 4, 4), img_size=56,
    )
    state, tx, _ = trainer.create_train_state(
        c, model, jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)), 10
    )
    rng = jax.random.PRNGKey(123)
    out = str(tmp_path / "out")
    orbax_io.save_checkpoint(out, 3, state, 55.5, rng)
    found = orbax_io.auto_resume_helper(out)
    assert found and found.endswith("ckpt_epoch_3")

    state2, tx2, _ = trainer.create_train_state(
        c, model, jax.random.PRNGKey(1), jnp.zeros((1, 56, 56, 3)), 10
    )
    restored, epoch, max_acc, rng2 = orbax_io.load_checkpoint(found, state2)
    assert epoch == 3 and max_acc == 55.5
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(rng2)),
        np.asarray(jax.random.key_data(rng)),
    )
    l1 = jax.tree_util.tree_leaves(state.params)
    l2 = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_prefetch_to_mesh_order_transform_and_errors():
    """data/prefetch.py: batches arrive sharded, in order, transformed;
    producer exceptions re-raise at the consumer."""
    from ml_autofocusformermod_tpu.data.prefetch import prefetch_to_mesh
    from ml_autofocusformermod_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh(data=len(jax.devices()))
    batches = [
        {"image": np.full((8, 4), i, np.float32), "label": np.arange(8) + i}
        for i in range(5)
    ]
    got = list(
        prefetch_to_mesh(
            iter(batches), mesh,
            transform=lambda b: {**b, "label": b["label"] * 2},
        )
    )
    assert len(got) == 5
    for i, b in enumerate(got):
        assert isinstance(b["image"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["image"])[:, 0], i)
        np.testing.assert_array_equal(
            np.asarray(b["label"]), (np.arange(8) + i) * 2
        )

    def boom():
        yield batches[0]
        raise RuntimeError("loader died")

    it = prefetch_to_mesh(boom(), mesh)
    next(it)
    with pytest.raises(RuntimeError, match="loader died"):
        list(it)


def test_loader_transport_dtype(cfg, tmp_path):
    """DATA.TRANSPORT_DTYPE=float16 ships normalized images as fp16 (half
    the worker-IPC and H2D payload); values are the float32 pipeline's
    rounded to fp16 — quantization well below bf16 compute rounding."""
    import numpy as np

    from ml_autofocusformermod_tpu.data.imagenet import (
        SyntheticDataset, Loader,
    )

    ds = SyntheticDataset(img_size=16, num_classes=4, length=8)
    base = next(iter(Loader(ds, 4, shuffle=False, drop_last=True)))
    half = next(iter(Loader(ds, 4, shuffle=False, drop_last=True,
                            transport_dtype="float16")))
    assert base["image"].dtype == np.float32
    assert half["image"].dtype == np.float16
    np.testing.assert_array_equal(
        half["image"], base["image"].astype(np.float16)
    )
