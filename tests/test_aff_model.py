"""AutoFocusFormer model: shapes, jit, determinism, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_autofocusformermod_tpu.models.aff import AutoFocusFormer


def tiny_model(**kw):
    defaults = dict(
        num_classes=10,
        embed_dim=(16, 32, 48, 64),
        cluster_size=8,
        nbhd_size=(48, 48, 48, 49),
        depths=(1, 1, 1, 1),
        num_heads=(2, 2, 4, 4),
        mlp_ratio=2.0,
        drop_path_rate=0.1,
        img_size=56,
    )
    defaults.update(kw)
    return AutoFocusFormer(**defaults)


@pytest.fixture(scope="module")
def model_and_vars():
    model = tiny_model()
    x = jnp.zeros((2, 56, 56, 3))
    variables = model.init(jax.random.PRNGKey(0), x, training=False)
    return model, variables


def test_forward_shape(model_and_vars):
    model, variables = model_and_vars
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    logits = model.apply(variables, x, training=False)
    assert logits.shape == (2, 10)
    assert np.isfinite(np.asarray(logits)).all()


def test_jit_and_determinism(model_and_vars):
    model, variables = model_and_vars
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 56, 56, 3))
    f = jax.jit(lambda v, x: model.apply(v, x, training=False))
    out1 = f(variables, x)
    out2 = f(variables, x)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_batch_consistency(model_and_vars):
    """Each image's logits are independent of the rest of the batch."""
    model, variables = model_and_vars
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 56, 56, 3))
    both = model.apply(variables, x, training=False)
    single = model.apply(variables, x[:1], training=False)
    np.testing.assert_allclose(
        np.asarray(both)[0], np.asarray(single)[0], atol=2e-5
    )


def test_train_mode_runs_and_grads_flow(model_and_vars):
    model, variables = model_and_vars
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 56, 56, 3))
    y = jnp.array([1, 3])

    def loss_fn(params):
        logits, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            training=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(5)},
        )
        onehot = jax.nn.one_hot(y, logits.shape[-1])
        return -(jax.nn.log_softmax(logits) * onehot).sum(-1).mean()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # learnable pieces specific to AFF get gradient signal
    nonzero = [
        float(jnp.abs(g).sum()) for g in flat
    ]
    assert sum(1 for g in nonzero if g > 0) > len(nonzero) * 0.8


def test_global_attention_only_model():
    """nbhd >= n everywhere -> pure global attention path."""
    model = tiny_model(img_size=32, nbhd_size=(100, 100, 100, 100))
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, training=False)
    logits = model.apply(variables, x, training=False)
    assert logits.shape == (1, 10)


def test_param_count_aff_mini():
    """AFF-Mini must land at the published 6.75M params (README.md:46)."""
    model = AutoFocusFormer(
        num_classes=1000,
        embed_dim=(32, 128, 256, 384),
        cluster_size=8,
        nbhd_size=(48, 48, 48, 49),
        depths=(2, 2, 6, 2),
        num_heads=(2, 4, 8, 16),
        mlp_ratio=2.0,
        img_size=224,
    )
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    )
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"])
    )
    assert abs(n_params - 6.75e6) / 6.75e6 < 0.01, f"{n_params=}"
