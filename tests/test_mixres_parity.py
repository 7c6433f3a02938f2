"""Per-level MixRes parity vs the reference torch oracle (CPU).

The MaskFiner wrappers inject *random* oracle masks, so full-cascade parity
is not well-defined; each level, however, takes the mask as an explicit
argument — so levels are compared exactly: first-layer embedding, plain
projection, and the token-split upsampling path.
"""

import numpy as np
import pytest

from conftest import requires_reference

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ml_autofocusformermod_tpu.ckpt.pth_import import import_torch_state_dict  # noqa: E402


def _import_level(our_module, ref_module, sample_args, rngs=None):
    variables = our_module.init(
        rngs or {"params": jax.random.PRNGKey(0)}, *sample_args,
        training=False,
    )
    sd = {k: v.detach().numpy() for k, v in ref_module.state_dict().items()}
    variables, missing, unexpected = import_torch_state_dict(
        dict(variables), sd
    )
    assert not missing, f"missing: {missing}"
    assert not unexpected, f"unexpected: {unexpected}"
    return variables


def _compare_outs(ours, ref, scale, n_scales=4, atol=2e-4):
    for s in range(scale + 1):
        name = f"res{n_scales - s + 1}"
        if name not in ours:
            continue
        np.testing.assert_allclose(
            np.asarray(ours[name + "_pos"]),
            ref[name + "_pos"].detach().numpy(),
            err_msg=f"{name} positions diverge", atol=0,
        )
        np.testing.assert_allclose(
            np.asarray(ours[name]),
            ref[name].detach().numpy(),
            atol=atol, rtol=1e-3, err_msg=f"{name} features diverge",
        )


@requires_reference
def test_mixres_vit_first_layer_parity():
    import torch

    from ref_oracle import load_reference_package

    ref_pkg = load_reference_package()
    torch.manual_seed(0)
    ref = ref_pkg.mixres_vit.MixResViT(
        patch_sizes=[32], n_layers=2, d_model=32, n_heads=2, mlp_ratio=2.0,
        drop_path_rate=[0.0, 0.0], channels=3, n_scales=4, min_patch_size=4,
        upscale_ratio=0.0, first_layer=True, out_features=["res5"],
    )
    ref.eval()

    from ml_autofocusformermod_tpu.models.mixres_vit import MixResViT

    ours = MixResViT(
        patch_sizes=(32,), n_layers=2, d_model=32, n_heads=2, mlp_ratio=2.0,
        drop_path_rate=(0.0, 0.0), channels=3, n_scales=4, min_patch_size=4,
        upscale_ratio=0.0, first_layer=True, out_features=("res5",),
        dtype=jnp.float32,
    )
    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(
        np.float32
    )
    variables = _import_level(
        ours, ref, (jnp.asarray(x), 0, None, None, None, {})
    )
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)), 0, None,
                      None, None)
    with jax.default_matmul_precision("highest"):
        our_out, layout = ours.apply(
            variables, jnp.asarray(x), 0, None, None, None, {},
            training=False,
        )
    assert layout == {0: 4}
    _compare_outs(our_out, ref_out, scale=0)


@requires_reference
@pytest.mark.parametrize("keep_old_scale", [True, False])
def test_mixres_neighbour_upsample_parity(keep_old_scale):
    """Upsample level: explicit mask, split machinery, global attention."""
    import torch

    from ref_oracle import load_reference_package

    ref_pkg = load_reference_package()
    torch.manual_seed(1)
    kw = dict(
        patch_sizes=[32, 16], n_layers=1, d_model=24, n_heads=2,
        mlp_ratio=2.0, channels=16, split_ratio=4, n_scales=4,
        cluster_size=8, nbhd_size=48, min_patch_size=4, upscale_ratio=0.5,
        keep_old_scale=keep_old_scale, scale=1, add_image_data_to_all=False,
        first_layer=False, out_features=["res4", "res5"],
    )
    ref = ref_pkg.mixres_neighbour.MixResNeighbour(
        drop_path_rate=[0.0], **kw
    )
    ref.eval()

    from ml_autofocusformermod_tpu.models.mixres_neighbour import (
        MixResNeighbour,
    )

    ours = MixResNeighbour(
        drop_path_rate=(0.0,),
        **{k: tuple(v) if isinstance(v, list) else v for k, v in kw.items()},
        dtype=jnp.float32,
    )

    rng = np.random.default_rng(2)
    b, n0 = 2, 4  # 64px / 32 patch -> 4 coarse tokens at scale 0
    im = rng.standard_normal((b, 64, 64, 3)).astype(np.float32)
    feat = rng.standard_normal((b, n0, 16)).astype(np.float32)
    # scale-0 grid positions in min-patch units: (scale, x, y)
    xs, ys = np.meshgrid([0, 8], [0, 8], indexing="xy")
    pos2 = np.stack([xs, ys], 2).reshape(-1, 2)
    pos = np.concatenate(
        [np.zeros((n0, 1)), pos2], axis=1
    )[None].repeat(b, 0).astype(np.float32)
    mask = rng.standard_normal((b, n0)).astype(np.float32)
    layout = {0: n0}

    variables = _import_level(
        ours, ref,
        (jnp.asarray(im), 1, jnp.asarray(feat), jnp.asarray(pos),
         jnp.asarray(mask), layout),
    )
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(im.transpose(0, 3, 1, 2)), 1,
            torch.from_numpy(feat), torch.from_numpy(pos),
            torch.from_numpy(mask),
        )
    with jax.default_matmul_precision("highest"):
        our_out, new_layout = ours.apply(
            variables, jnp.asarray(im), 1, jnp.asarray(feat),
            jnp.asarray(pos), jnp.asarray(mask), layout, training=False,
        )
    k_split = int(n0 * 0.5)
    expect_s1 = k_split * 4
    assert new_layout[1] == expect_s1
    assert new_layout[0] == (n0 if keep_old_scale else n0 - k_split)
    _compare_outs(our_out, ref_out, scale=1)
