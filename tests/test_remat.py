"""Rematerialization (TPU.REMAT): identical numerics, recompute-in-backward.

The reference has no remat (torch keeps every activation); on TPU,
activation memory at b>=128 over the 3136-token stage dominates the
training footprint, so ``jax.checkpoint`` over the transformer blocks
(models/layers.py::remat_wrap) is the standard FLOPs-for-HBM trade.
Remat must never change numerics — only scheduling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_autofocusformermod_tpu.models.aff import AutoFocusFormer

TINY = dict(
    num_classes=10,
    embed_dim=(32, 64, 96, 128),
    cluster_size=4,
    nbhd_size=(8, 8, 8, 49),
    depths=(1, 1, 2, 1),
    num_heads=(2, 2, 4, 4),
    mlp_ratio=2.0,
    drop_path_rate=0.0,
    img_size=56,
    dtype=jnp.float32,
)


def _grad_fn(model, batch_stats, x):
    def loss_fn(params):
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, training=False
        )
        return (logits.astype(jnp.float32) ** 2).sum()

    return jax.jit(jax.value_and_grad(loss_fn))


@pytest.mark.parametrize("mode", ["blocks", "dots"])
def test_remat_grads_match_baseline(mode):
    base = AutoFocusFormer(**TINY)
    remat = AutoFocusFormer(remat=mode, **TINY)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    variables = base.init(jax.random.PRNGKey(0), x, training=False)
    params, bstats = variables["params"], variables["batch_stats"]

    loss0, g0 = _grad_fn(base, bstats, x)(params)
    loss1, g1 = _grad_fn(remat, bstats, x)(params)

    assert float(loss0) == float(loss1), "remat changed the forward value"
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(g0)[0],
        jax.tree_util.tree_leaves(g1),
    ):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5,
            err_msg=f"remat changed gradient: {name}",
        )


def test_remat_recomputes_forward_in_backward():
    """Pin the remat *mechanism* in the lowered program (compile-free).

    The HBM saving itself is a TPU scheduling property (the CPU backend's
    memory analysis does not realize it, and can even report a small
    regression from the prevent_cse barriers), so the byte win is measured
    on-chip (scripts/bench_train.py mini_train reports compiled temp bytes;
    queue item [H]). What is backend-invariant is the structure:
    ``blocks`` must re-emit every block's matmuls in the backward and erect
    one optimization barrier per block; the ``dots`` policy saves matmul
    outputs, so it re-emits strictly fewer than ``blocks``.
    """
    base = AutoFocusFormer(**TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    variables = base.init(jax.random.PRNGKey(0), x, training=False)
    params, bstats = variables["params"], variables["batch_stats"]

    def lowered_counts(model):
        def loss_fn(p):
            out = model.apply(
                {"params": p, "batch_stats": bstats}, x, training=False
            )
            return (out.astype(jnp.float32) ** 2).sum()

        txt = jax.jit(jax.grad(loss_fn)).lower(params).as_text()
        return txt.count("stablehlo.dot_general"), txt.count(
            "optimization_barrier"
        )

    n_blocks = sum(TINY["depths"])
    dots_base, bar_base = lowered_counts(base)
    dots_blocks, bar_blocks = lowered_counts(
        AutoFocusFormer(remat="blocks", **TINY)
    )
    dots_dots, bar_dots = lowered_counts(AutoFocusFormer(remat="dots", **TINY))

    assert bar_base == 0
    assert bar_blocks == n_blocks, "expected one remat barrier per block"
    assert bar_dots == n_blocks
    assert dots_blocks > dots_dots > dots_base, (
        f"recompute ordering violated: blocks={dots_blocks} "
        f"dots={dots_dots} base={dots_base}"
    )


def test_remat_maskfiner_ud_train_grads():
    """Remat composes with the full MaskFiner-UD cascade (ViT + Neighbour
    levels, dropout/upsample rng lifting through nn.remat)."""
    from test_maskfiner import tiny_mr

    from ml_autofocusformermod_tpu.models.build import build_model

    cfg = tiny_mr("maskfiner_up_down_mini.yaml", **{"TPU.REMAT": "blocks"})
    model = build_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "upsample": jax.random.PRNGKey(7)},
        x, training=False,
    )
    params = variables["params"]
    others = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, **others}, x, training=True,
            mutable=["batch_stats"],
            rngs={
                "dropout": jax.random.PRNGKey(3),
                "upsample": jax.random.PRNGKey(4),
            },
        )
        return (out.astype(jnp.float32) ** 2).mean()

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    assert all(
        np.isfinite(np.asarray(g)).all()
        for g in jax.tree_util.tree_leaves(grads)
    )
