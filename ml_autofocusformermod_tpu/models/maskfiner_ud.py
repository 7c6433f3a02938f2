"""MaskFiner Up-Down: U-shaped encoder-decoder over 7 MixRes backbones
(reference ``models/maskfiner_up_down.py:28-211``).

Encoder levels (scales 0..n-1) progressively split tokens to finer scales;
decoder levels re-coarsen by consuming fewer scales, with skip connections
that channel-concat the matching encoder feature after re-aligning the
shuffled token order to the first-recorded order. The reference does that
by Manhattan cdist+argmin (``:150-154``) and then asserts the aligned
positions EQUAL the recorded ones (``:95``) — i.e. nearest-match is
always exact-match — so this rebuild aligns by integer-key sort matching
(:func:`align_to_order`, O(n log n)) instead of the O(n²) distance
tensor, keeping :func:`find_pos_org_order` as the parity oracle. The
upsampling mask is the random oracle placeholder; the max-norm and
color-change oracle variants are provided as utilities (``:156-186``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import trunc_normal_init
from .maskfiner_ot import _upsample_rng

Dtype = Any


def find_pos_org_order(pos_org: jax.Array, pos_shuffled: jax.Array) -> jax.Array:
    """Index of each original position within the shuffled set (Manhattan
    cdist + argmin, reference ``maskfiner_up_down.py:150-154``).

    Test oracle only — the live forward uses :func:`align_to_order`,
    which produces the identical mapping without the O(n²) distance
    tensor (the reference itself asserts the aligned positions EQUAL the
    recorded ones, ``maskfiner_up_down.py:95``, so nearest-match is
    always exact-match)."""
    d = jnp.abs(
        pos_org[:, :, None, :].astype(jnp.float32)
        - pos_shuffled[:, None, :, :].astype(jnp.float32)
    ).sum(-1)
    return jnp.argmin(d, axis=2)


def _pos_key(pos: jax.Array) -> jax.Array:
    """Unique int32 sort key per 2-D position. Coords are integer (or
    half-integer) min-patch-unit grid coords < 4096 (the MixRes rel-pos
    table is pre-sized for 2048-px inputs, ``mixres_neighbour.py:13-14``);
    x2/y2 doubling keeps half-units exact."""
    p2 = jnp.round(pos.astype(jnp.float32) * 2.0).astype(jnp.int32)
    return p2[..., 1] * 32768 + p2[..., 0]


def align_to_order(pos_org: jax.Array, pos_shuffled: jax.Array) -> jax.Array:
    """``idx`` with ``pos_shuffled[b, idx[b, t]] == pos_org[b, t]``.

    The decoder's skip connections must restore each feature scale's
    token order to the first-recorded order; the token SET is identical
    (cluster-sorting inside the backbones only permutes it — the
    reference asserts exact pos equality after alignment). Exact-match
    by integer-key double-argsort, O(n log n) and one (b, n) int plane —
    replaces the reference's b×n×n Manhattan cdist (at res2 scale
    n≈3136 that is a 39 MB fp32 tensor per skip per step).
    Equivalence vs the cdist+argmin oracle is pinned by
    ``tests/test_maskfiner.py``."""
    k_org = _pos_key(pos_org)
    k_sh = _pos_key(pos_shuffled)
    p = jnp.argsort(k_sh, axis=1)
    rank = jnp.argsort(jnp.argsort(k_org, axis=1), axis=1)
    return jnp.take_along_axis(p, rank, axis=1)


def max_norm_upsampling_mask(features: jax.Array) -> jax.Array:
    """(``maskfiner_up_down.py:156-158``)"""
    return jnp.linalg.norm(features.astype(jnp.float32), axis=2)


def compute_color_dist(im: jax.Array) -> jax.Array:
    """Sum of absolute RGB differences with 4-neighbors; im NHWC
    (``maskfiner_up_down.py:192-211``)."""
    x = im.astype(jnp.float32)
    d = lambda a, b: jnp.abs(a - b).sum(-1)
    edge = jnp.zeros(x.shape[:3], jnp.float32)
    edge = edge.at[:, 1:, :].add(d(x[:, 1:], x[:, :-1]))
    edge = edge.at[:, :-1, :].add(d(x[:, :-1], x[:, 1:]))
    edge = edge.at[:, :, 1:].add(d(x[:, :, 1:], x[:, :, :-1]))
    edge = edge.at[:, :, :-1].add(d(x[:, :, :-1], x[:, :, 1:]))
    return edge


def color_change_upsampling_mask(
    images: jax.Array, pos: jax.Array, patch_size: int, min_patch_size: int
) -> jax.Array:
    """Per-token color-gradient oracle: sum of :func:`compute_color_dist`
    over each token's ``patch_size``² pixel patch anchored at
    ``pos * min_patch_size`` (reference
    ``maskfiner_up_down.py:161-186``, an unused mask alternative kept for
    API parity). The reference loops over the batch and gathers pixel by
    pixel; here one batched gather. images NHWC; pos channel order (x, y)
    in min-patch units."""
    cd = compute_color_dist(images)  # (b, H, W)
    p0 = (pos.astype(jnp.float32) * min_patch_size).astype(jnp.int32)
    ii = jnp.arange(patch_size)
    dy, dx = jnp.meshgrid(ii, ii, indexing="ij")
    ys = p0[..., 1][..., None, None] + dy  # (b, n, ps, ps)
    xs = p0[..., 0][..., None, None] + dx
    patch = jax.vmap(lambda c, y, x: c[y, x])(cd, ys, xs)
    return patch.sum(axis=(-1, -2))


def random_upsampling_mask(
    module: nn.Module, j: int, b: int, n: int
) -> jax.Array:
    """Random-oracle upsampling mask (reference
    ``maskfiner_up_down.py:147-149``). Module-level so the twin-oracle
    parity tests can monkeypatch identical masks into both frameworks."""
    return jax.random.normal(_upsample_rng(module, j), (b, n), jnp.float32)


class UpDownBackbone(nn.Module):
    backbones: Sequence[nn.Module]
    backbone_dims: Sequence[int]
    out_dim: int
    all_out_features: Sequence[str]
    n_scales: int
    num_classes: int
    bb_in_feats: Sequence[Sequence[Optional[str]]]
    aux_loss: bool = False
    dtype: Dtype = jnp.float32

    @property
    def final_upsampling_ratios(self) -> List[float]:
        return [b.upscale_ratio for b in self.backbones]

    @property
    def bb_scales(self) -> List[int]:
        scales = list(range(self.n_scales))
        return scales + scales[-2::-1]

    def _feature_scale(self, f: str) -> int:
        # all_out_features_scales: res2 -> 3, ..., res5 -> 0 (reference :39)
        return len(self.all_out_features) - 1 - self.all_out_features.index(f)

    @nn.compact
    def __call__(self, im: jax.Array, training: bool = False):
        up = True
        upsampling_mask = None
        features = None
        features_pos = None
        layout: Dict[int, int] = {}
        outs: Dict[str, Any] = {}

        for j, backbone in enumerate(self.backbones):
            scale = self.bb_scales[j]
            output, layout = backbone(
                im, scale, features, features_pos, upsampling_mask, layout,
                training=training,
            )
            bb_out_features = backbone.out_features
            all_feat, all_scale, all_pos = [], [], []
            next_layout: Dict[int, int] = {}
            for f in bb_out_features:
                feat = output[f]
                feat_pos = output[f + "_pos"]
                feat_scale = output[f + "_scale"]
                feat_ss = output[f + "_spatial_shape"]
                b, n, c = feat.shape
                if f + "_pos" in outs:
                    # re-align the (cluster-shuffled) token order to the first
                    # recorded order for this feature (:89-95)
                    idx = align_to_order(outs[f + "_pos"], feat_pos)
                    feat = jnp.take_along_axis(feat, idx[..., None], axis=1)
                    feat_pos = jnp.take_along_axis(
                        feat_pos, idx[..., None], axis=1
                    )
                    feat_scale = jnp.take_along_axis(feat_scale, idx, axis=1)
                    outs[f].append(feat)
                else:
                    outs[f] = [feat]
                    outs[f + "_pos"] = feat_pos
                    outs[f + "_scale"] = feat_scale
                    outs[f + "_spatial_shape"] = feat_ss
                if j + 1 < len(self.bb_in_feats) and f in self.bb_in_feats[j + 1]:
                    if j >= self.n_scales - 1:
                        # skip connection: channel-concat the matching
                        # encoder feature (:102-106)
                        res = outs[f][-((j - self.n_scales + 1) * 2 + 2)]
                        out_feat = jnp.concatenate([feat, res], axis=2)
                    else:
                        out_feat = feat
                    all_feat.append(out_feat)
                    all_pos.append(feat_pos)
                    all_scale.append(feat_scale)
                    next_layout[self._feature_scale(f)] = n

            if j == self.n_scales - 1:
                up = False
            if up:
                b, n, _ = all_feat[0].shape
                upsampling_mask = random_upsampling_mask(self, j, b, n)

            if j < len(self.backbones) - 1:
                all_pos_cat = jnp.concatenate(all_pos, axis=1)
                all_scale_cat = jnp.concatenate(all_scale, axis=1)
                features_pos = jnp.concatenate(
                    [all_scale_cat[..., None], all_pos_cat], axis=2
                )
                features = jnp.concatenate(all_feat, axis=1)
                layout = next_layout

        outs["min_spatial_shape"] = output["min_spatial_shape"]

        if self.aux_loss:
            result = []
            for i, f in enumerate(self.all_out_features):
                feat = outs[f][-1]
                pooled = feat.mean(axis=1)
                pred = nn.Dense(
                    self.num_classes, dtype=self.dtype,
                    kernel_init=trunc_normal_init(), name=f"heads_{i}",
                )(pooled)
                result.append(pred)
            return result
        vec = output[self.all_out_features[-1]].mean(axis=1)
        return nn.Dense(
            self.num_classes, dtype=self.dtype,
            kernel_init=trunc_normal_init(), name="head",
        )(vec)


BB_IN_FEATS = [
    [None], ["res5"], ["res5", "res4"], ["res5", "res4", "res3"],
    ["res5", "res4", "res3"], ["res5", "res4"], ["res5"], [None],
]  # reference models/build.py:86-87


def build_up_down(config, dtype, upscale_ratios=None) -> UpDownBackbone:
    """Factory (reference ``models/build.py:85-161``).

    ``upscale_ratios`` overrides the configured ratios — the trainer's
    curriculum rebuilds the model each epoch with annealed ratios (the
    reference mutates module attributes in place, ``main.py:231-235``).
    """
    import numpy as np

    from .mixres_neighbour import MixResNeighbour
    from .mixres_vit import MixResViT

    mr = config.MODEL.MR
    n_scales = mr.N_RESOLUTION_SCALES
    n_layers_total = len(mr.NAME)
    min_patch_size = mr.PATCH_SIZES[n_scales - 1]
    ratios = list(upscale_ratios) if upscale_ratios else list(mr.UPSCALE_RATIO)

    dpr_all = np.linspace(0, mr.DROP_PATH_RATE, sum(mr.DEPTHS)).tolist()

    backbones = []
    for i, name in enumerate(mr.NAME):
        first_layer = i == 0
        in_chans = 3 if first_layer else mr.EMBED_DIM[i - 1]
        if i >= n_scales:
            scale = n_layers_total - i - 1
            patch_sizes = tuple(mr.PATCH_SIZES[i:])
            out_features = tuple(mr.OUT_FEATURES[-(n_layers_total - i):])
            in_chans = (
                mr.EMBED_DIM[i - 1] + mr.EMBED_DIM[n_layers_total - i - 1]
            )
        else:
            scale = i
            patch_sizes = tuple(mr.PATCH_SIZES[: i + 1])
            out_features = tuple(mr.OUT_FEATURES[-(i + 1):])
        drop_path = tuple(
            dpr_all[sum(mr.DEPTHS[:i]): sum(mr.DEPTHS[: i + 1])]
        )
        common = dict(
            patch_sizes=patch_sizes,
            n_layers=mr.DEPTHS[i],
            d_model=mr.EMBED_DIM[i],
            n_heads=mr.NUM_HEADS[i],
            mlp_ratio=mr.MLP_RATIO[i],
            dropout=mr.DROP_RATE[i],
            drop_path_rate=drop_path,
            split_ratio=mr.SPLIT_RATIO[i],
            channels=in_chans,
            n_scales=n_scales,
            min_patch_size=min_patch_size,
            upscale_ratio=ratios[i],
            out_features=out_features,
            first_layer=first_layer,
            layer_scale=mr.LAYER_SCALE,
            remat=str(config.TPU.REMAT),
            dtype=dtype,
        )
        if name == "MixResViT":
            bb = MixResViT(
                num_register_tokens=mr.NUM_REGISTER_TOKENS, **common
            )
        elif name == "MixResNeighbour":
            bb = MixResNeighbour(
                attn_drop_rate=mr.ATTN_DROP_RATE[i],
                cluster_size=mr.CLUSTER_SIZE[i],
                nbhd_size=mr.NBHD_SIZE[i],
                keep_old_scale=mr.KEEP_OLD_SCALE,
                scale=scale,
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
    return UpDownBackbone(
        backbones=tuple(backbones),
        backbone_dims=tuple(mr.EMBED_DIM),
        out_dim=mr.OUT_DIM,
        all_out_features=tuple(mr.OUT_FEATURES),
        n_scales=n_scales,
        num_classes=config.MODEL.NUM_CLASSES,
        bb_in_feats=tuple(tuple(x) for x in BB_IN_FEATS),
        aux_loss=mr.AUX_LOSS,
        dtype=dtype,
    )
