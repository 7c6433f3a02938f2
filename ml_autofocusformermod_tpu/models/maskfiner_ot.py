"""MaskFiner Oracle-Teacher: coarse-to-fine cascade of MixRes backbones
(reference ``models/maskfiner_oracle_teacher_model.py:28-154``).

For scale 0..n-1 runs the scale's backbone, concatenating every scale's
features/positions as the next input. The upsampling mask is the oracle
placeholder: random scores (``:143-145``). Head: LayerNorm + 3-layer ReLU
MLP over the concatenation of per-scale mean-pools.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .mixres_common import MLP
from .layers import LayerNormFp32

Dtype = Any


def _upsample_rng(module: nn.Module, step_tag: int) -> jax.Array:
    """Random scores for the oracle upsampling mask. Uses the 'upsample' rng
    stream when provided (training); falls back to a fixed key so eval is
    deterministic (the reference calls torch.randn unconditionally)."""
    if module.has_rng("upsample"):
        return module.make_rng("upsample")
    return jax.random.fold_in(jax.random.PRNGKey(0), step_tag)


class OracleTeacherBackbone(nn.Module):
    backbones: Sequence[nn.Module]
    backbone_dims: Sequence[int]
    out_dim: int
    all_out_features: Sequence[str]
    n_scales: int
    num_classes: int
    dtype: Dtype = jnp.float32

    @property
    def final_upsampling_ratios(self) -> List[float]:
        return [b.upscale_ratio for b in self.backbones]

    @nn.compact
    def __call__(self, im: jax.Array, training: bool = False) -> jax.Array:
        upsampling_mask = None
        features = None
        features_pos = None
        layout: Dict[int, int] = {}
        outs: Dict[str, Any] = {}

        for scale, backbone in enumerate(self.backbones):
            output, layout = backbone(
                im, scale, features, features_pos, upsampling_mask, layout,
                training=training,
            )
            bb_out_features = backbone.out_features
            all_feat, all_scale, all_pos = [], [], []
            for f in bb_out_features:
                outs[f] = output[f]
                outs[f + "_pos"] = output[f + "_pos"]
                outs[f + "_scale"] = output[f + "_scale"]
                outs[f + "_spatial_shape"] = output[f + "_spatial_shape"]
                all_feat.append(output[f])
                all_pos.append(output[f + "_pos"])
                all_scale.append(output[f + "_scale"])

            if scale < len(self.backbones) - 1:
                b, n, _ = all_feat[0].shape
                upsampling_mask = jax.random.normal(
                    _upsample_rng(self, scale), (b, n), jnp.float32
                )

            all_pos_cat = jnp.concatenate(all_pos, axis=1)
            all_scale_cat = jnp.concatenate(all_scale, axis=1)
            features_pos = jnp.concatenate(
                [all_scale_cat[..., None], all_pos_cat], axis=2
            )
            features = jnp.concatenate(all_feat, axis=1)
            # layout of the concatenated input for the next backbone: each
            # emitted feature f holds exactly the tokens of its scale
            layout = {
                self.n_scales - 1 - (int(f[3:]) - 2): output[f].shape[1]
                for f in bb_out_features
            }

        outs["min_spatial_shape"] = output["min_spatial_shape"]

        pooled = []
        for f in list(bb_out_features)[::-1]:
            pooled.append(outs[f].mean(axis=1))
        vec = jnp.concatenate(pooled, axis=1)
        vec = LayerNormFp32(epsilon=1e-5, name="head_norm")(vec)
        tot = self.backbone_dims[-1] * self.n_scales
        out = MLP(
            hidden_dim=tot, output_dim=self.num_classes, num_layers=3,
            dtype=self.dtype, name="head",
        )(vec)
        return out


def build_oracle_teacher(
    config, dtype, upscale_ratios=None
) -> OracleTeacherBackbone:
    """Factory (reference ``models/build.py:35-84``)."""
    from .mixres_neighbour import MixResNeighbour
    from .mixres_vit import MixResViT

    mr = config.MODEL.MR
    ratios = (
        list(upscale_ratios) if upscale_ratios else list(mr.UPSCALE_RATIO)
    )
    backbones = []
    for i, name in enumerate(mr.NAME):
        in_chans = 3 if i == 0 else mr.EMBED_DIM[i - 1]
        dpr = mr.DROP_PATH_RATE
        dpr_i = dpr[i] if isinstance(dpr, (list, tuple)) else dpr
        # The reference passes a scalar per backbone (build.py:49,63) that
        # applies uniformly to every block; our MixResBasicLayer indexes
        # drop_path per block, so replicate to DEPTHS[i] entries.
        drop_path = (float(dpr_i),) * int(mr.DEPTHS[i])
        common = dict(
            patch_sizes=tuple(mr.PATCH_SIZES[: i + 1]),
            n_layers=mr.DEPTHS[i],
            d_model=mr.EMBED_DIM[i],
            n_heads=mr.NUM_HEADS[i],
            mlp_ratio=mr.MLP_RATIO[i],
            dropout=mr.DROP_RATE[i],
            drop_path_rate=drop_path,
            split_ratio=mr.SPLIT_RATIO[i],
            channels=in_chans,
            n_scales=mr.N_RESOLUTION_SCALES,
            min_patch_size=mr.PATCH_SIZES[-1],
            upscale_ratio=ratios[i],
            out_features=tuple(mr.OUT_FEATURES[-(i + 1):]),
            remat=str(config.TPU.REMAT),
            dtype=dtype,
        )
        if name == "MixResViT":
            bb = MixResViT(**common)
        elif name == "MixResNeighbour":
            bb = MixResNeighbour(
                attn_drop_rate=mr.ATTN_DROP_RATE[i],
                cluster_size=mr.CLUSTER_SIZE[i],
                nbhd_size=mr.NBHD_SIZE[i],
                keep_old_scale=mr.KEEP_OLD_SCALE,
                scale=i,
                add_image_data_to_all=mr.ADD_IMAGE_DATA_TO_ALL,
                use_pallas=(
                    bool(config.TPU.USE_PALLAS)
                    and jax.default_backend() == "tpu"
                ),
                **common,
            )
        else:
            raise NotImplementedError(f"Unknown backbone: {name}")
        backbones.append(bb)
    return OracleTeacherBackbone(
        backbones=tuple(backbones),
        backbone_dims=tuple(mr.EMBED_DIM),
        out_dim=mr.OUT_DIM,
        all_out_features=tuple(mr.OUT_FEATURES),
        n_scales=mr.N_RESOLUTION_SCALES,
        num_classes=config.MODEL.NUM_CLASSES,
        dtype=dtype,
    )
