"""MixResNeighbour: cluster-attention MaskFiner level with token splitting
(reference ``models/mixres_neighbour.py:408-973``).

One pyramid level of the MaskFiner backbones. Three entry modes:
* ``first_layer``: overlap patch embed (BatchNorm convs) + sine PE,
* upsample mode: split the most important previous-scale tokens into
  ``split_ratio`` finer children (straight-through estimator), optionally
  fusing raw image pixels into the new tokens,
* plain mode: LayerNorm + linear projection of incoming tokens.

Then one cluster-attention stage over the mixed-resolution token cloud and
per-scale ``res*`` outputs.

TPU design: token scales are tracked via a static ``layout {scale: count}``
so every reshape/partition is static; relative-position features are
computed directly from clamped coordinates instead of gathering from the
reference's 1023^2-row lookup table (identical values, no 21 MB constant).
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.cluster_gather import gather_clusters_onehot
from ..ops.knn import knn
from ..ops.sfc import space_filling_cluster
from ..parallel.mesh import shard_tokens
from .layers import (
    ClusterTransformerBlock,
    LayerNormFp32,
    rel_pos_features,
    remat_wrap,
    trunc_normal_init,
)
from .mixres_common import (
    MIXRES_REL_POS_WIDTH,
    MIXRES_TABLE_WIDTH,
    MLPDeepNorm,
    OverlapPatchEmbedding,
    extract_scale,
    gather_image_patches,
    scale_grid_positions,
    sine_position_embedding,
)

Dtype = Any


class MixResBasicLayer(nn.Module):
    """Cluster-attention stage over a (scale, x, y) token cloud
    (``mixres_neighbour.py:408-543``). No downsampler; the scale channel is
    stripped before clustering and re-attached after."""

    dim: int
    cluster_size: int
    nbhd_size: int
    depth: int
    num_heads: int
    mlp_ratio: float
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = ()
    layer_scale: float = 0.0
    use_pallas: bool = False
    remat: str = ""  # '' | 'blocks' | 'dots' (models/layers.py::remat_wrap)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        pos: jax.Array,  # b x n x 3 (scale, x, y)
        feat: jax.Array,  # b x n x c
        h: int,
        w: int,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        R = MIXRES_REL_POS_WIDTH
        tw = MIXRES_TABLE_WIDTH
        pos_scale = pos[:, :, :1]  # keep as b x n x 1
        pos = pos[:, :, 1:]
        b, n, d = pos.shape

        if self.nbhd_size >= n:
            global_attn = True
            member_idx, cluster_mask = None, None
        else:
            global_attn = False
            k = int(math.ceil(n / float(self.cluster_size)))
            nnc = min(int(round(self.nbhd_size / float(self.cluster_size))), k)
            nbhd_size = self.cluster_size * nnc

        if global_attn:
            rel_pos = (pos[:, None, :, :] + R) - pos[:, :, None, :]
        else:
            m = self.cluster_size
            if k == n:
                m = 1
                nbhd_size = nnc
                cluster_mean_pos = pos
                member_idx = jnp.broadcast_to(
                    jnp.arange(n, dtype=jnp.int32).reshape(1, n, 1), (b, n, 1)
                )
                cluster_mask = None
            else:
                pos, cluster_mean_pos, member_idx, cluster_mask, reorder = (
                    space_filling_cluster(pos, m, h, w)
                )
                member_idx = member_idx.astype(jnp.int32)
                feat = jnp.take_along_axis(feat, reorder, axis=1)
                pos_scale = jnp.take_along_axis(pos_scale, reorder, axis=1)

            nearest_cluster = knn(pos, cluster_mean_pos, nnc)
            # arithmetic cluster expansion (cluster c = rows [c*m, (c+1)*m));
            # padded slots point past n and are masked
            slot = jnp.arange(m, dtype=jnp.int32)
            member_idx = (
                nearest_cluster[..., None] * m + slot
            ).reshape(b, n, nbhd_size)
            cluster_mask = (
                (member_idx < n).astype(jnp.int32) if k * m != n else None
            )
            # Wide dense stages (np_ > 2048, e.g. curriculum ratio-1.0's
            # np_ = 4168) run the kernel's static K-band path — every
            # compute plane split below the faulting >4096-lane class
            # (ops/clusten_pallas.py::_kband_split) — so the kernel now
            # covers every width like the reference's CLUSTEN does
            # (clustenqk_cuda_kernel.cu:18-49 has no shape carve-outs).
            # MLAFF_PALLAS_NMAX survives as an escape hatch only: set a
            # bound to route wider stages to gathered-XLA instead.
            nmax = int(os.environ.get("MLAFF_PALLAS_NMAX", "0"))
            use_pallas = self.use_pallas and (nmax <= 0 or k * m <= nmax)
            if use_pallas:
                rel_pos = None  # fused kernel computes bias from pos
            else:
                pos_gathered = gather_clusters_onehot(
                    pos[:, None], nearest_cluster, m
                )[:, 0]
                rel_pos = pos_gathered - (pos[:, :, None, :] - R)

        if global_attn:
            use_pallas = self.use_pallas
        ncc = None if global_attn else nearest_cluster
        csize = 0 if global_attn else m
        fused = use_pallas and not global_attn
        if fused:
            pe_feat = None
        else:
            rel_pos = jnp.clip(rel_pos, 0, tw - 1)  # mixres_neighbour.py:527
            pe_feat = rel_pos_features(rel_pos, R)

        # sequence-parallel layout hint (no-op without a `seq` mesh axis)
        feat = shard_tokens(feat)

        # __call__ args with self at 0: 4=global_attn, 6=deterministic,
        # 8=cluster_size (no host-constant statics on this path)
        block_cls = remat_wrap(
            ClusterTransformerBlock, self.remat, (4, 6, 8)
        )

        for i_blk in range(self.depth):
            dp = (
                self.drop_path[i_blk]
                if isinstance(self.drop_path, (list, tuple))
                else self.drop_path
            )
            feat = block_cls(
                dim=self.dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path=dp,
                layer_scale=self.layer_scale,
                use_pallas=use_pallas,
                rel_pos_width=R,
                clamp_width=tw,
                dtype=self.dtype,
                name=f"blocks_{i_blk}",
            )(feat, member_idx, cluster_mask, global_attn, pe_feat,
              deterministic, ncc, csize, pos)
            feat = shard_tokens(feat)

        pos = jnp.concatenate([pos_scale, pos], axis=2)
        return pos, feat


class MixResNeighbour(nn.Module):
    """One MaskFiner pyramid level (``mixres_neighbour.py:582-973``)."""

    patch_sizes: Sequence[int]
    n_layers: int
    d_model: int
    n_heads: int
    dropout: float = 0.0
    drop_path_rate: Sequence[float] = (0.0,)
    attn_drop_rate: float = 0.0
    channels: int = 1
    mlp_ratio: float = 4.0
    split_ratio: int = 4
    n_scales: int = 4
    cluster_size: int = 8
    nbhd_size: int = 48
    layer_scale: float = 0.0
    min_patch_size: int = 4
    upscale_ratio: float = 0.25
    keep_old_scale: bool = False
    scale: int = 1
    add_image_data_to_all: bool = False
    first_layer: bool = False
    out_features: Sequence[str] = ("res5",)
    use_pallas: bool = False
    remat: str = ""  # rematerialize blocks in backward (layers.py::remat_wrap)
    dtype: Dtype = jnp.float32

    @property
    def patch_size(self) -> int:
        return self.patch_sizes[-1]

    @property
    def do_upsample(self) -> bool:
        return not (self.upscale_ratio == 0 or self.first_layer)

    # ---- token split machinery (mixres_neighbour.py:711-828) ----

    def _divide_split_keep(self, feat, pos, scores):
        """Straight-through top-k split selection
        (``mixres_neighbour.py:731-755``). Returns
        (tokens_to_split, pos_to_split, tokens_to_keep, pos_to_keep)."""
        b, n_, c = feat.shape
        k_split = int(n_ * self.upscale_ratio)
        order = jnp.argsort(scores, axis=1, stable=True)  # ascending
        bottom_idx = order[:, : n_ - k_split]
        top_idx = order[:, n_ - k_split:]

        soft = jax.nn.softmax(scores.astype(jnp.float32), axis=1)
        ste = soft - jax.lax.stop_gradient(soft)  # 0 forward, grad flows
        mask_split = 1.0 + ste
        mask_keep = 1.0 + (-ste)

        take = lambda x, idx: jnp.take_along_axis(x, idx[..., None], axis=1)
        g_split = jnp.take_along_axis(mask_split, top_idx, axis=1)
        g_keep = jnp.take_along_axis(mask_keep, bottom_idx, axis=1)
        tokens_to_split = take(feat, top_idx) * g_split[..., None].astype(feat.dtype)
        tokens_to_keep = take(feat, bottom_idx) * g_keep[..., None].astype(feat.dtype)
        pos_to_split = take(pos, top_idx)
        pos_to_keep = take(pos, bottom_idx)
        return tokens_to_split, pos_to_split, tokens_to_keep, pos_to_keep

    def _split_features(self, tokens):
        """Repeat x split_ratio + learned child/scale embeddings
        (``mixres_neighbour.py:780-786``)."""
        b, n_, c = tokens.shape
        rel_pos_emb = self.param(
            "rel_pos_emb", nn.initializers.normal(1.0), (1, self.split_ratio, c)
        )
        scale_emb = self.param(
            "scale_emb", nn.initializers.normal(1.0), (1, 1, c)
        )
        x = jnp.repeat(tokens[:, :, None, :], self.split_ratio, axis=2)
        x = x + (rel_pos_emb[:, None] + scale_emb[:, None]).astype(x.dtype)
        return x.reshape(b, n_ * self.split_ratio, c)

    def _split_pos(self, pos_to_split, curr_scale):
        """2x2 child coordinates (``mixres_neighbour.py:788-804``)."""
        b, n_, _ = pos_to_split.shape
        r = 2 ** (self.n_scales - curr_scale - 1)
        x = pos_to_split[:, :, 1]
        y = pos_to_split[:, :, 2]
        children = jnp.stack(
            [
                jnp.stack([x, y], axis=2),
                jnp.stack([x + r, y], axis=2),
                jnp.stack([x, y + r], axis=2),
                jnp.stack([x + r, y + r], axis=2),
            ],
            axis=2,
        )  # b n 4 2
        children = children.reshape(b, n_ * self.split_ratio, 2)
        scale_col = jnp.full(
            (b, children.shape[1], 1), curr_scale, children.dtype
        )
        return jnp.concatenate([scale_col, children], axis=2)

    def _add_high_res_feat(self, tokens, pos2d, im):
        """Gather raw pixels under each new token, project + MLP, blend with
        learned importances (``mixres_neighbour.py:807-828``)."""
        ps = self.patch_size
        pix = gather_image_patches(im, pos2d, ps, self.min_patch_size)
        x = nn.Dense(
            self.channels, dtype=self.dtype, kernel_init=trunc_normal_init(),
            name="image_patch_projection",
        )(pix.astype(self.dtype))
        x = nn.gelu(x, approximate=False)
        x = LayerNormFp32(epsilon=1e-5, name="high_res_norm1")(x)
        x = MLPDeepNorm(
            hidden_features=self.channels, out_features=self.channels,
            dtype=self.dtype, name="high_res_mlp",
        )(x)
        x = LayerNormFp32(epsilon=1e-5, name="high_res_norm2")(x)
        img_imp = self.param("image_feat_importance", nn.initializers.ones, (1,))
        old_imp = self.param("old_feat_importance", nn.initializers.ones, (1,))
        return old_imp.astype(tokens.dtype) * tokens + img_imp.astype(x.dtype) * x

    def _add_image_data_to_all(self, feat, pos, max_scale, im, layout):
        """Re-sort tokens by scale and add per-scale projected image features
        (``mixres_neighbour.py:830-852``)."""
        feats, poss, projs = [], [], []
        rem_f, rem_p = feat, pos
        for s in range(max_scale + 1):
            cnt = layout.get(s, 0)
            if cnt == 0:
                continue
            f_s, p_s, rem_f, rem_p = extract_scale(rem_f, rem_p, s, cnt)
            pix = gather_image_patches(
                im, p_s[:, :, 1:], self.patch_sizes[s], self.min_patch_size
            )
            proj = nn.Dense(
                self.channels, dtype=self.dtype,
                kernel_init=trunc_normal_init(),
                name=f"image_patch_projectors_{s}",
            )(pix.astype(self.dtype))
            feats.append(f_s)
            poss.append(p_s)
            projs.append(proj)
        feat = jnp.concatenate(feats, axis=1)
        pos = jnp.concatenate(poss, axis=1)
        x = jnp.concatenate(projs, axis=1)
        x = nn.gelu(x, approximate=False)
        x = LayerNormFp32(epsilon=1e-5, name="high_res_norm1")(x)
        x = MLPDeepNorm(
            hidden_features=self.channels, out_features=self.channels,
            dtype=self.dtype, name="high_res_mlp",
        )(x)
        x = LayerNormFp32(epsilon=1e-5, name="high_res_norm2")(x)
        return feat + x.astype(feat.dtype), pos

    def _upsample(self, im, scale, features, features_pos, upsampling_mask,
                  layout):
        """(``mixres_neighbour.py:885-933``) Returns (feat, pos, new_layout)
        BEFORE token_norm/projection (applied by caller)."""
        old_scale = scale - 1
        m_old = layout[old_scale]
        n_total = features.shape[1]

        if upsampling_mask.shape[1] == n_total:
            feat_curr, pos_curr, feat_old, pos_old, mask_curr = extract_scale(
                features, features_pos, old_scale, m_old, extra=upsampling_mask
            )
        else:
            feat_curr, pos_curr, feat_old, pos_old = extract_scale(
                features, features_pos, old_scale, m_old
            )
            mask_curr = upsampling_mask

        f_split, p_split, f_keep, p_keep = self._divide_split_keep(
            feat_curr, pos_curr, mask_curr
        )
        k_split = f_split.shape[1]

        new_layout = dict(layout)
        all_feat = [feat_old, f_keep]
        all_pos = [pos_old, p_keep]

        if self.keep_old_scale:
            all_feat.append(f_split)
            all_pos.append(p_split)
            up_feat = self._split_features(f_split)
            up_pos = self._split_pos(p_split, scale)
            new_layout[old_scale] = m_old
            new_layout[scale] = (
                new_layout.get(scale, 0) + k_split * self.split_ratio
            )
            if self.add_image_data_to_all:
                all_feat.append(up_feat)
                all_pos.append(up_pos)
                feat = jnp.concatenate(all_feat, axis=1)
                pos = jnp.concatenate(all_pos, axis=1)
                feat, pos = self._add_image_data_to_all(
                    feat, pos, scale, im, new_layout
                )
            else:
                up_feat = self._add_high_res_feat(up_feat, up_pos[:, :, 1:], im)
                all_feat.append(up_feat)
                all_pos.append(up_pos)
                feat = jnp.concatenate(all_feat, axis=1)
                pos = jnp.concatenate(all_pos, axis=1)
        else:
            up_feat = self._split_features(f_split)
            up_pos = self._split_pos(p_split, scale)
            new_layout[old_scale] = m_old - k_split
            new_layout[scale] = (
                new_layout.get(scale, 0) + k_split * self.split_ratio
            )
            if self.add_image_data_to_all:
                all_feat.append(up_feat)
                all_pos.append(up_pos)
                feat = jnp.concatenate(all_feat, axis=1)
                pos = jnp.concatenate(all_pos, axis=1)
                feat, pos = self._add_image_data_to_all(
                    feat, pos, scale, im, new_layout
                )
            else:
                up_feat = self._add_high_res_feat(up_feat, up_pos[:, :, 1:], im)
                all_feat.append(up_feat)
                all_pos.append(up_pos)
                feat = jnp.concatenate(all_feat, axis=1)
                pos = jnp.concatenate(all_pos, axis=1)
        return feat, pos, new_layout

    @nn.compact
    def __call__(
        self,
        im: jax.Array,  # b x H x W x 3 (NHWC)
        scale: int,
        features: Optional[jax.Array],
        features_pos: Optional[jax.Array],
        upsampling_mask: Optional[jax.Array],
        layout: Dict[int, int],
        training: bool = False,
    ) -> Tuple[Dict[str, Any], Dict[int, int]]:
        b, H, W, _ = im.shape
        ps = self.patch_size
        min_patched = (H // self.min_patch_size, W // self.min_patch_size)
        det = not training

        if self.first_layer:
            x = OverlapPatchEmbedding(
                ps, self.d_model, norm="batch", dtype=self.dtype,
                name="patch_embed",
            )(im, training=training)
            import numpy as np

            pos_np = scale_grid_positions(H, W, ps, self.min_patch_size, scale)
            pos = jnp.broadcast_to(jnp.asarray(pos_np)[None], (b,) + pos_np.shape)
            x = x + sine_position_embedding(
                pos[:, :, 1:], self.d_model // 2
            ).astype(x.dtype)
            layout = {scale: pos_np.shape[0]}
        elif self.do_upsample:
            x, pos, layout = self._upsample(
                im, scale, features, features_pos, upsampling_mask, layout
            )
            x = LayerNormFp32(epsilon=1e-5, name="token_norm")(x)
            if self.channels != self.d_model:
                x = nn.Dense(
                    self.d_model, dtype=self.dtype,
                    kernel_init=trunc_normal_init(), name="token_projection",
                )(x)
        else:
            x = LayerNormFp32(epsilon=1e-5, name="token_norm")(features,)
            if self.channels != self.d_model:
                x = nn.Dense(
                    self.d_model, dtype=self.dtype,
                    kernel_init=trunc_normal_init(), name="token_projection",
                )(x)
            pos = features_pos
            layout = dict(layout)

        pos, x = MixResBasicLayer(
            dim=self.d_model,
            cluster_size=self.cluster_size,
            nbhd_size=self.nbhd_size,
            depth=self.n_layers,
            num_heads=self.n_heads,
            mlp_ratio=self.mlp_ratio,
            drop=self.dropout,
            attn_drop=self.attn_drop_rate,
            drop_path=tuple(self.drop_path_rate),
            layer_scale=self.layer_scale,
            use_pallas=self.use_pallas,
            remat=self.remat,
            dtype=self.dtype,
            name="layers",
        )(pos, x, h=min_patched[0], w=min_patched[1], deterministic=det)

        norm_out = LayerNormFp32(epsilon=1e-5, name="norm_out")
        outs: Dict[str, Any] = {}
        rem_f, rem_p = x, pos
        for s in range(scale + 1):
            out_idx = self.n_scales - s + 1
            patched = (H // self.patch_sizes[s], W // self.patch_sizes[s])
            cnt = layout.get(s, 0)
            if cnt == 0:
                continue
            f_s, p_s, rem_f, rem_p = extract_scale(rem_f, rem_p, s, cnt)
            outs[f"res{out_idx}"] = norm_out(f_s)
            outs[f"res{out_idx}_pos"] = p_s[:, :, 1:]
            outs[f"res{out_idx}_scale"] = p_s[:, :, 0]
            outs[f"res{out_idx}_spatial_shape"] = patched
        outs["min_spatial_shape"] = min_patched
        return outs, dict(layout)
