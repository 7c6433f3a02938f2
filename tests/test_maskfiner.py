"""MaskFiner family: build, forward shapes, jit, gradients, curriculum."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_autofocusformermod_tpu.config import load_config
from ml_autofocusformermod_tpu.models.build import build_model

CFG_DIR = os.path.join(
    os.path.dirname(__file__), "..", "ml_autofocusformermod_tpu", "configs"
)


def tiny_mr(cfg_name, **opts):
    c = load_config(os.path.join(CFG_DIR, cfg_name))
    c.defrost()
    c.MODEL.NUM_CLASSES = 10
    c.DATA.IMG_SIZE = 64
    n = len(c.MODEL.MR.NAME)
    c.MODEL.MR.EMBED_DIM = ([32, 24, 16, 8] + [16, 24, 32])[:n]
    c.MODEL.MR.DEPTHS = [1] * n
    c.MODEL.MR.NUM_HEADS = [2] * n
    c.MODEL.MR.MLP_RATIO = [2.0] * n
    c.TPU.COMPUTE_DTYPE = "float32"
    for k, v in opts.items():
        node = c
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return c.freeze()


def _init_and_forward(cfg, batch=2):
    model = build_model(cfg)
    x = jax.random.normal(
        jax.random.PRNGKey(1), (batch, cfg.DATA.IMG_SIZE, cfg.DATA.IMG_SIZE, 3)
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "upsample": jax.random.PRNGKey(7)},
        x,
        training=False,
    )
    out = model.apply(
        variables, x, training=False, rngs={"upsample": jax.random.PRNGKey(7)}
    )
    return model, variables, out


def test_oracle_teacher_forward():
    cfg = tiny_mr("maskfiner_oracle_teacher.yaml")
    model, variables, out = _init_and_forward(cfg)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_up_down_forward():
    cfg = tiny_mr("maskfiner_up_down_mini.yaml")
    model, variables, out = _init_and_forward(cfg)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_up_down_aux_loss_heads():
    cfg = tiny_mr("maskfiner_up_down_mini.yaml", **{"MODEL.MR.AUX_LOSS": True})
    model, variables, out = _init_and_forward(cfg)
    assert isinstance(out, (list, tuple)) and len(out) == 4
    for o in out:
        assert o.shape == (2, 10)


def test_up_down_without_keep_old_scale():
    cfg = tiny_mr(
        "maskfiner_up_down_mini.yaml", **{"MODEL.MR.KEEP_OLD_SCALE": False}
    )
    _, _, out = _init_and_forward(cfg)
    assert out.shape == (2, 10)


def test_oracle_teacher_add_image_data_paths():
    # OT preset has ADD_IMAGE_DATA_TO_ALL: True; also cover the off path
    cfg = tiny_mr(
        "maskfiner_oracle_teacher.yaml",
        **{"MODEL.MR.ADD_IMAGE_DATA_TO_ALL": False},
    )
    _, _, out = _init_and_forward(cfg)
    assert out.shape == (2, 10)


def test_up_down_grads_and_jit():
    cfg = tiny_mr("maskfiner_up_down_mini.yaml")
    model = build_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    y = jnp.array([1, 2])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "upsample": jax.random.PRNGKey(7)},
        x,
        training=False,
    )
    params = variables["params"]
    others = {k: v for k, v in variables.items() if k != "params"}

    @jax.jit
    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, **others},
            x,
            training=True,
            mutable=["batch_stats"],
            rngs={
                "dropout": jax.random.PRNGKey(3),
                "upsample": jax.random.PRNGKey(4),
            },
        )
        onehot = jax.nn.one_hot(y, out.shape[-1])
        return -(jax.nn.log_softmax(out) * onehot).sum(-1).mean()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(1 for g in leaves if float(jnp.abs(g).sum()) > 0)
    assert nonzero > len(leaves) * 0.5


def test_curriculum_rebuild_changes_token_counts():
    """The trainer anneals upscale ratios by rebuilding the model; params
    stay compatible across ratios (shapes don't depend on the ratio)."""
    from ml_autofocusformermod_tpu.models.maskfiner_ud import build_up_down

    cfg = tiny_mr("maskfiner_up_down_mini.yaml")
    m1 = build_up_down(cfg, jnp.float32)
    m2 = build_up_down(
        cfg, jnp.float32, upscale_ratios=[0.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0]
    )
    x = jnp.zeros((1, 64, 64, 3))
    rngs = {"params": jax.random.PRNGKey(0), "upsample": jax.random.PRNGKey(1)}
    v1 = m1.init(rngs, x, training=False)
    out = m2.apply(
        v1, x, training=False, rngs={"upsample": jax.random.PRNGKey(2)}
    )
    assert out.shape == (1, 10)


def test_align_to_order_matches_cdist_oracle():
    """The live O(n log n) skip realignment (align_to_order) must produce
    exactly the cdist+argmin oracle's mapping whenever the two pos sets
    are equal up to permutation — the only case the reference permits
    (it asserts aligned == recorded, maskfiner_up_down.py:95)."""
    from ml_autofocusformermod_tpu.models.maskfiner_ud import (
        align_to_order,
        find_pos_org_order,
    )

    rng = np.random.default_rng(3)
    for n, half_units in [(17, False), (64, False), (33, True)]:
        b = 3
        # unique positions per image (sample w/o replacement from a grid)
        flat = np.stack([
            rng.choice(4096, size=n, replace=False) for _ in range(b)
        ])
        pos_shuffled = np.stack(
            [flat // 64, flat % 64], axis=-1
        ).astype(np.float32)
        if half_units:
            pos_shuffled = pos_shuffled / 2.0
        perm = np.stack([rng.permutation(n) for _ in range(b)])
        pos_org = np.take_along_axis(pos_shuffled, perm[..., None], axis=1)

        fast = np.asarray(align_to_order(
            jnp.asarray(pos_org), jnp.asarray(pos_shuffled)))
        oracle = np.asarray(find_pos_org_order(
            jnp.asarray(pos_org), jnp.asarray(pos_shuffled)))
        np.testing.assert_array_equal(fast, oracle)
        np.testing.assert_array_equal(fast, perm)
        # the reference's own post-alignment assert (:95)
        realigned = np.take_along_axis(pos_shuffled, fast[..., None], axis=1)
        np.testing.assert_array_equal(realigned, pos_org)


def test_upsampling_mask_oracles_match_reference_formulas():
    """The three (unused-by-default) upsampling-mask oracles pin the
    reference formulas: Manhattan-cdist skip realignment
    (maskfiner_up_down.py:150-154), feature-norm mask (:156-158) and the
    color-change oracle (:161-211)."""
    import torch

    from ml_autofocusformermod_tpu.models.maskfiner_ud import (
        color_change_upsampling_mask,
        compute_color_dist,
        find_pos_org_order,
        max_norm_upsampling_mask,
    )

    rng = np.random.default_rng(0)
    b, n, c = 2, 17, 8
    pos_shuffled = rng.integers(0, 31, (b, n, 2)).astype(np.float32)
    perm = np.stack([rng.permutation(n) for _ in range(b)])
    pos_org = np.take_along_axis(pos_shuffled, perm[..., None], axis=1)

    idx = np.asarray(find_pos_org_order(
        jnp.asarray(pos_org), jnp.asarray(pos_shuffled)
    ))
    t_d = torch.cdist(torch.tensor(pos_org), torch.tensor(pos_shuffled), p=1)
    t_idx = torch.argmin(t_d, dim=2).numpy()
    np.testing.assert_array_equal(idx, t_idx)
    # realignment recovers the permutation when positions are unique
    for bi in range(b):
        if len(np.unique(pos_shuffled[bi], axis=0)) == n:
            np.testing.assert_array_equal(idx[bi], perm[bi])

    feats = rng.normal(size=(b, n, c)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(max_norm_upsampling_mask(jnp.asarray(feats))),
        torch.tensor(feats).norm(dim=2).numpy(), rtol=1e-6)

    # color-change oracle vs a direct torch re-derivation (NCHW reference)
    H = W = 16
    ps, min_ps = 4, 2
    im = rng.normal(size=(b, H, W, 3)).astype(np.float32)
    t_im = torch.tensor(im).permute(0, 3, 1, 2)
    t_cd = torch.zeros(b, H, W)
    t_cd[:, 1:, :] += (t_im[:, :, 1:, :] - t_im[:, :, :-1, :]).abs().sum(1)
    t_cd[:, :-1, :] += (t_im[:, :, :-1, :] - t_im[:, :, 1:, :]).abs().sum(1)
    t_cd[:, :, 1:] += (t_im[:, :, :, 1:] - t_im[:, :, :, :-1]).abs().sum(1)
    t_cd[:, :, :-1] += (t_im[:, :, :, :-1] - t_im[:, :, :, 1:]).abs().sum(1)
    np.testing.assert_allclose(
        np.asarray(compute_color_dist(jnp.asarray(im))), t_cd.numpy(),
        rtol=1e-5, atol=1e-5)

    npos = 5
    # token anchors in min-patch units; patches stay inside the canvas
    pos = rng.integers(0, (H - ps) // min_ps + 1, (b, npos, 2)).astype(
        np.float32)
    ours = np.asarray(color_change_upsampling_mask(
        jnp.asarray(im), jnp.asarray(pos), ps, min_ps))
    # reference inner loop (maskfiner_up_down.py:165-185), batch by batch
    expect = np.zeros((b, npos), np.float32)
    for bi in range(b):
        p0 = (pos[bi] * min_ps).astype(np.int64)
        for ti in range(npos):
            x0, y0 = p0[ti]
            expect[bi, ti] = t_cd[bi, y0:y0 + ps, x0:x0 + ps].sum().item()
    np.testing.assert_allclose(ours, expect, rtol=1e-4, atol=1e-4)
