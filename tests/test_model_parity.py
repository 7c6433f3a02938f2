"""Full-model logit parity: reference torch AFF (CPU oracle) vs our JAX AFF.

The reference model runs untouched on CPU via ``ref_oracle`` (pure-torch
CLUSTEN + exact-kNN injection); its randomly-initialized weights are
exported through the ``.pth`` importer into our model, and logits are
compared end-to-end. This is the bit-level-fidelity harness BASELINE.json
asks for, minus the (non-downloadable) Apple weights.
"""

import numpy as np
import pytest

from conftest import requires_reference

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ml_autofocusformermod_tpu.ckpt.pth_import import import_torch_state_dict  # noqa: E402
from ml_autofocusformermod_tpu.models.aff import AutoFocusFormer  # noqa: E402

# nbhd sizes keep every downsampling stage on the local-attention path: the
# reference crashes when a global stage feeds its downsampler
# (aff_transformer.py:334 with member_idx=None), so that combination cannot
# be cross-checked.
# cluster_size 4 keeps >= 3 space-filling anchors at every local stage (the
# reference's anchor extrapolation indexes out of bounds below 2 anchors,
# point_utils.py:143); stage 2 exercises the cluster-padding path (49 % 4).
TINY = dict(
    num_classes=10,
    embed_dim=[16, 32, 48, 64],
    cluster_size=4,
    nbhd_size=[8, 8, 4, 49],
    depths=[1, 1, 2, 1],
    num_heads=[2, 2, 4, 4],
    mlp_ratio=2.0,
    drop_path_rate=0.0,
    layer_scale=0.0,
    img_size=56,
)


def build_pair(cfg, seed=0):
    import torch

    from ref_oracle import load_reference_package

    ref = load_reference_package()
    torch.manual_seed(seed)
    ref_model = ref.aff_transformer.AutoFocusFormer(
        in_chans=3,
        num_classes=cfg["num_classes"],
        embed_dim=cfg["embed_dim"],
        cluster_size=cfg["cluster_size"],
        nbhd_size=list(cfg["nbhd_size"]),
        depths=cfg["depths"],
        num_heads=cfg["num_heads"],
        mlp_ratio=cfg["mlp_ratio"],
        drop_path_rate=cfg["drop_path_rate"],
        layer_scale=cfg["layer_scale"],
        img_size=cfg["img_size"],
    )
    ref_model.eval()

    model = AutoFocusFormer(
        num_classes=cfg["num_classes"],
        embed_dim=tuple(cfg["embed_dim"]),
        cluster_size=cfg["cluster_size"],
        nbhd_size=tuple(cfg["nbhd_size"]),
        depths=tuple(cfg["depths"]),
        num_heads=tuple(cfg["num_heads"]),
        mlp_ratio=cfg["mlp_ratio"],
        drop_path_rate=cfg["drop_path_rate"],
        layer_scale=cfg["layer_scale"],
        img_size=cfg["img_size"],
        dtype=jnp.float32,
    )
    x0 = jnp.zeros((1, cfg["img_size"], cfg["img_size"], 3))
    variables = model.init(jax.random.PRNGKey(0), x0, training=False)

    state_dict = {
        k: v.detach().numpy() for k, v in ref_model.state_dict().items()
    }
    variables, missing, unexpected = import_torch_state_dict(
        dict(variables), state_dict
    )
    assert not missing, f"params missing from torch ckpt: {missing}"
    assert not unexpected, f"torch keys not consumed: {unexpected}"
    return ref_model, model, variables


@requires_reference
@pytest.mark.parametrize("layer_scale", [0.0, 1e-5])
def test_full_model_logit_parity(layer_scale):
    import torch

    cfg = dict(TINY, layer_scale=layer_scale)
    ref_model, model, variables = build_pair(cfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, cfg["img_size"], cfg["img_size"], 3)).astype(
        np.float32
    )

    with torch.no_grad():
        ref_logits = ref_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    with jax.default_matmul_precision("highest"):
        logits = model.apply(variables, jnp.asarray(x), training=False)

    np.testing.assert_allclose(
        np.asarray(logits),
        ref_logits.numpy(),
        atol=2e-4,
        rtol=1e-3,
        err_msg="full-model logits diverge from reference",
    )


@requires_reference
def test_patch_embed_parity():
    """Isolates the conv/BN/layout import path (OIHW->HWIO etc.)."""
    import torch

    cfg = dict(TINY)
    ref_model, model, variables = build_pair(cfg, seed=1)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)

    with torch.no_grad():
        ref_pos, ref_feat, ref_h, ref_w = ref_model.patch_embed(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        )

    from ml_autofocusformermod_tpu.models.layers import PatchEmbed

    pe = PatchEmbed(embed_dim=cfg["embed_dim"][0], dtype=jnp.float32)
    pe_vars = {
        "params": variables["params"]["patch_embed"],
        "batch_stats": variables["batch_stats"]["patch_embed"],
    }
    with jax.default_matmul_precision("highest"):
        pos, feat, h, w = pe.apply(pe_vars, jnp.asarray(x), training=False)

    assert (h, w) == (ref_h, ref_w)
    np.testing.assert_array_equal(np.asarray(pos), ref_pos.numpy())
    np.testing.assert_allclose(
        np.asarray(feat), ref_feat.numpy(), atol=1e-4, rtol=1e-4
    )
