"""Sequence-parallel layout: shards the token axis of the stage
activations over the mesh ``seq`` axis (``parallel/mesh.py::shard_tokens``)
and must be numerically identical to pure data parallelism.

The reference has no sequence parallelism (SURVEY §2.5/§5); this is the
token-axis extension the survey names as the natural TPU mesh axis for the
per-token neighborhood attention. Runs on the virtual 8-device CPU mesh
from conftest: a (2 data, 2 model, 2 seq) mesh against the (8, 1, 1)
baseline, two full train steps each.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_autofocusformermod_tpu.config import load_config
from ml_autofocusformermod_tpu.models.aff import AutoFocusFormer
from ml_autofocusformermod_tpu.parallel import mesh as pmesh
from ml_autofocusformermod_tpu.parallel import tp
from ml_autofocusformermod_tpu.train import trainer

CFG = os.path.join(
    os.path.dirname(__file__), "..", "ml_autofocusformermod_tpu",
    "configs", "aff_mini.yaml",
)


def _tiny_cfg():
    cfg = load_config(CFG)
    cfg.defrost()
    cfg.MODEL.NUM_CLASSES = 10
    cfg.MODEL.AFF.EMBED_DIM = [16, 32, 48, 64]
    cfg.MODEL.AFF.DEPTHS = [1, 1, 1, 1]
    cfg.MODEL.AFF.NUM_HEADS = [2, 2, 4, 4]
    cfg.DATA.IMG_SIZE = 56
    cfg.AUG.MIXUP = 0.0
    cfg.AUG.CUTMIX = 0.0
    cfg.TRAIN.USE_EMA = True
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.freeze()
    return cfg


def _model():
    return AutoFocusFormer(
        num_classes=10,
        embed_dim=(16, 32, 48, 64),
        depths=(1, 1, 1, 1),
        num_heads=(2, 2, 4, 4),
        img_size=56,
        drop_path_rate=0.0,
    )


def _run_steps(data, model_axis, seq_axis, n_steps=2):
    cfg = _tiny_cfg()
    model = _model()
    mesh = pmesh.make_mesh(data=data, model=model_axis, seq=seq_axis)
    rng = jax.random.PRNGKey(0)
    state, tx, schedule = trainer.create_train_state(
        cfg, model, rng, jnp.zeros((1, 56, 56, 3)), n_steps_per_epoch=10
    )
    state = tp.shard_tree(mesh, state)
    step = jax.jit(trainer.make_train_step(cfg, model, tx, schedule))
    batch = {
        "image": np.linspace(0, 1, 8 * 56 * 56 * 3, dtype=np.float32)
        .reshape(8, 56, 56, 3),
        "label": np.arange(8) % 10,
    }
    sharded = pmesh.shard_batch(mesh, batch)
    losses = []
    with mesh:
        for _ in range(n_steps):
            state, metrics = step(state, sharded, jax.random.PRNGKey(7))
            losses.append(float(metrics["loss"]))
    assert bool(metrics["grads_finite"])
    return state, losses


def test_shard_tokens_noop_without_mesh():
    x = jnp.ones((2, 6, 4))
    out = pmesh.shard_tokens(x)
    assert out is x


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 CPU devices")
def test_shard_tokens_applies_constraint():
    mesh = pmesh.make_mesh(data=2, model=1, seq=4)

    def f(x):
        return pmesh.shard_tokens(x)

    x = jnp.ones((4, 8, 3))
    with mesh:
        out = jax.jit(f)(x)
    expected = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data", "seq", None)
    )
    assert out.sharding.is_equivalent_to(expected, x.ndim)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 CPU devices")
def test_sp2_tp2_matches_dp_only():
    state_dp, losses_dp = _run_steps(data=8, model_axis=1, seq_axis=1)
    state_sp, losses_sp = _run_steps(data=2, model_axis=2, seq_axis=2)

    np.testing.assert_allclose(losses_dp, losses_sp, rtol=2e-5, atol=2e-5)

    flat_dp = jax.tree_util.tree_leaves(state_dp.params)
    flat_sp = jax.tree_util.tree_leaves(state_sp.params)
    for a, b in zip(flat_dp, flat_sp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5
        )
