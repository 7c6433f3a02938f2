"""Training stack: schedules, optimizer masking, mixup, train-step, mesh DP."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_autofocusformermod_tpu.config import load_config
from ml_autofocusformermod_tpu.models.aff import AutoFocusFormer
from ml_autofocusformermod_tpu.parallel import mesh as pmesh
from ml_autofocusformermod_tpu.train import losses, optim, schedulers, trainer

CFG_DIR = os.path.join(
    os.path.dirname(__file__), "..", "ml_autofocusformermod_tpu", "configs"
)


def tiny_config(**opts):
    c = load_config(os.path.join(CFG_DIR, "aff_mini.yaml"))
    c.defrost()
    c.MODEL.NUM_CLASSES = 10
    c.MODEL.AFF.EMBED_DIM = [16, 32, 48, 64]
    c.MODEL.AFF.DEPTHS = [1, 1, 1, 1]
    c.MODEL.AFF.NUM_HEADS = [2, 2, 4, 4]
    c.DATA.IMG_SIZE = 56
    c.DATA.BATCH_SIZE = 8
    c.TPU.COMPUTE_DTYPE = "float32"
    for k, v in opts.items():
        node = c
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return c.freeze()


def test_cosine_schedule_endpoints():
    s = schedulers.cosine_schedule(
        base_lr=1e-3, min_lr=1e-5, warmup_lr=1e-7, warmup_steps=10,
        total_steps=100,
    )
    assert float(s(0)) == pytest.approx(1e-7)
    # end of warmup reaches base lr
    assert float(s(10)) == pytest.approx(
        1e-5 + 0.5 * (1e-3 - 1e-5) * (1 + np.cos(np.pi * 10 / 100)), rel=1e-5
    )
    # cosine tail approaches min_lr
    assert float(s(100)) == pytest.approx(1e-5, rel=1e-4)


def test_no_weight_decay_mask():
    params = {
        "dense": {"kernel": jnp.zeros((4, 4)), "bias": jnp.zeros((4,))},
        "norm": {"scale": jnp.zeros((4,)), "bias": jnp.zeros((4,))},
        "attn": {"blank_k": jnp.zeros((8,))},
    }
    mask = optim.no_weight_decay_mask(params)
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False
    assert mask["norm"]["scale"] is False
    assert mask["attn"]["blank_k"] is False


def test_mixup_cutmix_targets_sum_to_one():
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
    labels = jnp.array([0, 1, 2, 3])
    mixed, target = losses.mixup_cutmix(
        rng, images, labels, num_classes=10, smoothing=0.1
    )
    assert mixed.shape == images.shape
    np.testing.assert_allclose(np.asarray(target.sum(-1)), 1.0, atol=1e-5)
    # soft targets put mass on the label and its flip partner
    hot = np.asarray(target)
    for i, l in enumerate([0, 1, 2, 3]):
        assert hot[i, l] > 0.05


def test_train_step_reduces_loss():
    cfg = tiny_config()
    model = AutoFocusFormer(
        num_classes=10,
        embed_dim=(16, 32, 48, 64),
        depths=(1, 1, 1, 1),
        num_heads=(2, 2, 4, 4),
        img_size=56,
        drop_path_rate=0.0,
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 56, 56, 3))
    y = jnp.arange(8) % 10
    state, tx, schedule = trainer.create_train_state(
        cfg, model, rng, jnp.zeros((1, 56, 56, 3)), n_steps_per_epoch=10
    )
    step = jax.jit(trainer.make_train_step(cfg, model, tx, schedule))
    batch = {"image": x, "label": y}
    metrics0 = None
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        if metrics0 is None:
            metrics0 = metrics
        assert bool(metrics["grads_finite"])
    assert float(metrics["loss"]) < float(metrics0["loss"])
    assert int(state.step) == 8


def test_eval_step_counts():
    cfg = tiny_config()
    model = AutoFocusFormer(
        num_classes=10, embed_dim=(16, 32, 48, 64), depths=(1, 1, 1, 1),
        num_heads=(2, 2, 4, 4), img_size=56,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 56, 56, 3)))
    es = jax.jit(trainer.make_eval_step(cfg, model))
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(1), (4, 56, 56, 3)),
        "label": jnp.array([1, 2, 3, 4]),
    }
    out = es(variables["params"], variables.get("batch_stats", {}), batch)
    assert int(out["count"]) == 4
    assert 0 <= int(out["top1"]) <= int(out["top5"]) <= 4


def test_data_parallel_mesh_train_step():
    """Full DP train step over the virtual 8-device CPU mesh."""
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    cfg = tiny_config()
    model = AutoFocusFormer(
        num_classes=10, embed_dim=(16, 32, 48, 64), depths=(1, 1, 1, 1),
        num_heads=(2, 2, 4, 4), img_size=56, drop_path_rate=0.0,
    )
    mesh = pmesh.make_mesh(data=8)
    rng = jax.random.PRNGKey(0)
    state, tx, schedule = trainer.create_train_state(
        cfg, model, rng, jnp.zeros((1, 56, 56, 3)), n_steps_per_epoch=10
    )
    step = jax.jit(trainer.make_train_step(cfg, model, tx, schedule))

    batch = {
        "image": np.random.default_rng(0)
        .standard_normal((16, 56, 56, 3))
        .astype(np.float32),
        "label": np.arange(16) % 10,
    }
    sharded = pmesh.shard_batch(mesh, batch)
    assert len(sharded["image"].sharding.device_set) == 8

    with mesh:
        state, metrics = step(state, sharded, jax.random.PRNGKey(1))
        state, metrics = step(state, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert bool(metrics["grads_finite"])

    # sharded-batch result == single-device result (same math, psum'd grads)
    state2, tx2, schedule2 = trainer.create_train_state(
        cfg, model, rng, jnp.zeros((1, 56, 56, 3)), n_steps_per_epoch=10
    )
    step2 = jax.jit(trainer.make_train_step(cfg, model, tx2, schedule2))
    state2, m2 = step2(state2, batch, jax.random.PRNGKey(1))
    state2, m2 = step2(state2, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(m2["loss"]), rtol=1e-4
    )


def test_train_step_bitwise_deterministic():
    """SURVEY §5: the reference designs races out of its backward kernels
    (fastAtomicAdd) but cannot promise run-to-run determinism; here the
    whole step must be bitwise reproducible (XLA scatter-adds + fixed
    reduction order), pinned leaf-for-leaf.
    """
    cfg = tiny_config()
    model = AutoFocusFormer(
        num_classes=10, embed_dim=(16, 32, 48, 64), depths=(1, 1, 1, 1),
        num_heads=(2, 2, 4, 4), img_size=56, drop_path_rate=0.1,
    )
    rng = jax.random.PRNGKey(0)
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(1), (8, 56, 56, 3)),
        "label": jnp.arange(8) % 10,
    }

    def run():
        state, tx, schedule = trainer.create_train_state(
            cfg, model, rng, jnp.zeros((1, 56, 56, 3)), n_steps_per_epoch=10
        )
        step = jax.jit(trainer.make_train_step(cfg, model, tx, schedule))
        for i in range(2):
            state, metrics = step(state, batch, jax.random.PRNGKey(7))
        return state, metrics

    s1, m1 = run()
    s2, m2 = run()
    assert float(m1["loss"]) == float(m2["loss"])
    assert float(m1["grad_norm"]) == float(m2["grad_norm"])
    mismatches = [
        p
        for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(s1.params),
            jax.tree_util.tree_leaves_with_path(s2.params),
        )
        if not (np.asarray(a) == np.asarray(b)).all()
    ]
    assert not mismatches, f"non-deterministic leaves: {mismatches[:5]}"


def test_train_step_donation_with_ema():
    """main.py jits the step with donate_argnums=(0,); every TrainState leaf
    must own its buffer (an EMA tree aliasing params raises 'donated the
    same buffer twice') and donated inputs must not be reused after the call.
    """
    cfg = tiny_config(**{"TRAIN.USE_EMA": True})
    model = AutoFocusFormer(
        num_classes=10, embed_dim=(16, 32, 48, 64), depths=(1, 1, 1, 1),
        num_heads=(2, 2, 4, 4), img_size=56, drop_path_rate=0.0,
    )
    rng = jax.random.PRNGKey(0)
    state, tx, schedule = trainer.create_train_state(
        cfg, model, rng, jnp.zeros((1, 56, 56, 3)), n_steps_per_epoch=10
    )
    step = jax.jit(
        trainer.make_train_step(cfg, model, tx, schedule), donate_argnums=(0,)
    )
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(1), (8, 56, 56, 3)),
        "label": jnp.arange(8) % 10,
    }
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        assert bool(metrics["grads_finite"])
    assert int(state.step) == 3
    # EMA has drifted from params but tracks them (decay < 1)
    p = jax.tree_util.tree_leaves(state.params)[0]
    e = jax.tree_util.tree_leaves(state.ema_params)[0]
    assert not np.allclose(np.asarray(p), np.asarray(e))


def test_ema_timm_semantics_under_accumulation():
    """timm ModelEmaV2 oracle (reference main.py:155-163,265-269): with
    ACCUMULATION_STEPS=2 the shadow must decay once per OPTIMIZER update
    (every 2nd micro-step), not per micro-step, and must shadow BN
    running stats (buffers) alongside params."""
    decay = 0.5  # large 1-decay so a wrong update count is unmistakable
    cfg = tiny_config(**{
        "TRAIN.USE_EMA": True,
        "TRAIN.EMA_DECAY": decay,
        "TRAIN.ACCUMULATION_STEPS": 2,
        "AUG.MIXUP": 0.0,
        "AUG.CUTMIX": 0.0,
    })
    model = AutoFocusFormer(
        num_classes=10, embed_dim=(16, 32, 48, 64), depths=(1, 1, 1, 1),
        num_heads=(2, 2, 4, 4), img_size=56, drop_path_rate=0.0,
    )
    rng = jax.random.PRNGKey(0)
    state, tx, schedule = trainer.create_train_state(
        cfg, model, rng, jnp.zeros((1, 56, 56, 3)), n_steps_per_epoch=10
    )
    step = jax.jit(trainer.make_train_step(cfg, model, tx, schedule))
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(1), (4, 56, 56, 3)),
        "label": jnp.arange(4) % 10,
    }

    # timm-semantics oracle on the host: shadow = params+buffers, updated
    # only when the optimizer applies (micro-steps 2 and 4 of 4)
    as_np = lambda t: jax.tree_util.tree_map(np.asarray, t)
    ema_p = as_np(state.params)
    ema_bs = as_np(state.batch_stats)
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        assert bool(metrics["grads_finite"])
        if (i + 1) % 2 == 0:  # optimizer-update boundary
            upd = lambda e, p: e * decay + np.asarray(p) * (1.0 - decay)
            ema_p = jax.tree_util.tree_map(upd, ema_p, as_np(state.params))
            ema_bs = jax.tree_util.tree_map(upd, ema_bs, as_np(state.batch_stats))

    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(ema_p),
        jax.tree_util.tree_leaves_with_path(state.ema_params),
    ):
        np.testing.assert_allclose(
            a, np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=f"params EMA mismatch at {kp}",
        )
    bs_leaves = jax.tree_util.tree_leaves_with_path(ema_bs)
    assert bs_leaves, "model has no BN stats; test needs them"
    for (kp, a), (_, b) in zip(
        bs_leaves,
        jax.tree_util.tree_leaves_with_path(state.ema_batch_stats),
    ):
        np.testing.assert_allclose(
            a, np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=f"batch_stats EMA mismatch at {kp}",
        )
    # and the shadow actually differs from both init and live stats
    live = jax.tree_util.tree_leaves(state.batch_stats)[0]
    shadow = jax.tree_util.tree_leaves(state.ema_batch_stats)[0]
    assert not np.allclose(np.asarray(live), np.asarray(shadow))
