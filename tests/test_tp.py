"""Tensor-parallel layout: shards real parameters over the mesh ``model``
axis and must be numerically identical to pure data parallelism.

Runs on the virtual 8-device CPU mesh from conftest: a (4 data, 2 model)
mesh against the (8, 1) baseline, two full train steps each.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_autofocusformermod_tpu.config import load_config
from ml_autofocusformermod_tpu.models.aff import AutoFocusFormer
from ml_autofocusformermod_tpu.parallel import mesh as pmesh
from ml_autofocusformermod_tpu.parallel import tp
from ml_autofocusformermod_tpu.train import trainer

import os

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


def _model(cfg):
    return AutoFocusFormer(
        num_classes=10,
        embed_dim=(16, 32, 48, 64),
        depths=(1, 1, 1, 1),
        num_heads=(2, 2, 4, 4),
        img_size=56,
        drop_path_rate=0.0,
    )


def _run_steps(data, model_axis, n_steps=2):
    cfg = _tiny_cfg()
    model = _model(cfg)
    mesh = pmesh.make_mesh(data=data, model=model_axis)
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
        for i in range(n_steps):
            state, metrics = step(state, sharded, jax.random.PRNGKey(7))
            losses.append(float(metrics["loss"]))
    assert bool(metrics["grads_finite"])
    return state, losses


def test_specs_hit_expected_leaves():
    cfg = _tiny_cfg()
    model = _model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)), training=False
    )
    specs = tp.tree_specs(variables["params"], tp=2)
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): spec
        for path, spec in jax.tree_util.tree_flatten_with_path(specs)[0]
    }
    qs = [k for k in flat if k.endswith("attn/q/kernel")]
    assert qs and all(flat[k] == jax.sharding.PartitionSpec(None, "model")
                      for k in qs)
    projs = [k for k in flat if k.endswith("attn/proj/kernel")]
    assert projs and all(
        flat[k] == jax.sharding.PartitionSpec("model", None) for k in projs
    )
    # norms replicated
    norms = [k for k in flat if "norm1" in k]
    assert norms and all(flat[k] == jax.sharding.PartitionSpec()
                         for k in norms)


def test_indivisible_dims_fall_back_to_replication():
    spec = tp.spec_for_path("x/attn/q/kernel", (16, 18), tp=4)
    assert spec == jax.sharding.PartitionSpec()
    spec = tp.spec_for_path("x/attn/q/kernel", (16, 16), tp=4)
    assert spec == jax.sharding.PartitionSpec(None, "model")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 CPU devices")
def test_tp2_matches_dp_only():
    state_dp, losses_dp = _run_steps(data=8, model_axis=1)
    state_tp, losses_tp = _run_steps(data=4, model_axis=2)

    np.testing.assert_allclose(losses_dp, losses_tp, rtol=2e-5, atol=2e-5)

    # params identical after 2 optimizer steps
    flat_dp = jax.tree_util.tree_leaves(state_dp.params)
    flat_tp = jax.tree_util.tree_leaves(state_tp.params)
    for a, b in zip(flat_dp, flat_tp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5
        )

    # and the TP run really sharded: find a q kernel leaf and check its
    # per-device shard is half-width on the output axis
    def find_q(params):
        out = []

        def rec(path, tree):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    rec(path + [k], v)
            else:
                if path[-2:] == ["q", "kernel"]:
                    out.append(tree)

        rec([], params)
        return out

    q_leaves = find_q(
        jax.tree_util.tree_map(lambda x: x, state_tp.params)
    )
    assert q_leaves
    leaf = q_leaves[0]
    shard_shape = leaf.addressable_shards[0].data.shape
    assert shard_shape[1] == leaf.shape[1] // 2

    # EMA and optimizer moments shard along with the params
    ema_leaves = find_q(state_tp.ema_params)
    assert ema_leaves[0].addressable_shards[0].data.shape[1] == \
        ema_leaves[0].shape[1] // 2
