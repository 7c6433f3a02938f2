"""AutoFocusFormer: 4-stage off-grid vision backbone (Flax linen).

Re-design of reference ``models/aff_transformer.py:368-670`` with static
shapes end-to-end: per-stage token counts, cluster counts, neighborhood
sizes, keep/reserve counts are all Python-level constants for a given
``(config, img_size)``, so the whole forward pass jits into one XLA program.
Stage-1 clustering (tokens on the regular grid) is precomputed on the host
and enters the program as constants (reference caches it as module state,
``aff_transformer.py:461-468``).
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cluster_gather import gather_clusters_onehot
from ..ops.knn import knn
from ..ops.sfc import grid_cluster, grid_nearest_clusters, space_filling_cluster
from ..parallel.mesh import shard_tokens
from .layers import (
    ClusterMerging,
    ClusterTransformerBlock,
    HashableArray,
    PatchEmbed,
    LayerNormFp32,
    rel_pos_features,
    remat_wrap,
    trunc_normal_init,
)

Dtype = Any


class BasicLayer(nn.Module):
    """One AFF stage: cluster -> local/global attention blocks -> merge.

    Reference ``aff_transformer.py:368-508``.
    """

    dim: int
    out_dim: Optional[int]
    cluster_size: int
    nbhd_size: int
    depth: int
    num_heads: int
    mlp_ratio: float
    alpha: float = 4.0
    ds_rate: float = 0.25
    reserve_on: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = ()
    layer_scale: float = 0.0
    rel_pos_width: int = 55
    use_pallas: bool = False
    wf_mode: str = ""  # ClusterMerging WF lowering ('' = default)
    merge_mode: str = ""  # ClusterMerging aggregation ('pallas' = fused kernel)
    remat: str = ""  # '' | 'blocks' | 'dots' (models/layers.py::remat_wrap)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        pos: jax.Array,  # b x n x 2
        feat: jax.Array,  # b x n x c
        h: int,
        w: int,
        on_grid: bool,
        stride: int,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        b, n, d = pos.shape
        c = feat.shape[2]
        assert self.cluster_size > 0, "cluster_size must be positive"
        R = self.rel_pos_width
        static_ncc = None
        # Per-stage kernel routing: stages at or below MLAFF_XLA_NMAX tokens
        # take the XLA gather/einsum attention path instead of the Pallas
        # kernel. At small n the kernel's per-(image, head) plane loop is
        # instruction-issue bound (PERF.md: Small stage 3 is 18 blocks at
        # n=196, ~2 us per (image, head) regardless of grouping) while XLA
        # lowers the same math as large batched MXU matmuls. 0 = off.
        use_pallas = self.use_pallas and not (
            0 < n <= int(os.environ.get("MLAFF_XLA_NMAX", "0"))
        )
        # Masked-dense routing (see below): stages this small skip the
        # neighborhood-gathered rel-pos entirely.
        dense_nmax = int(os.environ.get("MLAFF_DENSE_NMAX", "0"))
        static_pos = None

        if self.nbhd_size >= n:
            global_attn = True
            member_idx, cluster_mask = None, None
            nbhd_size = n
        else:
            global_attn = False
            k = int(math.ceil(n / float(self.cluster_size)))
            nnc = min(int(round(self.nbhd_size / float(self.cluster_size))), k)
            nbhd_size = self.cluster_size * nnc

        if global_attn:
            rel_pos = (pos[:, None, :, :] + R) - pos[:, :, None, :]  # b n n 2
        else:
            m = self.cluster_size
            if k == n:
                # degenerate: every token its own cluster (only when
                # cluster_size == 1); neighborhood = nnc nearest tokens.
                # The reference's code path for this case is unreachable in
                # its configs (aff_transformer.py:454-458).
                m = 1
                nbhd_size = nnc
                cluster_mean_pos = pos
                member_idx = jnp.broadcast_to(
                    jnp.arange(n, dtype=jnp.int32).reshape(1, n, 1), (b, n, 1)
                )
                cluster_mask = None
            elif on_grid:
                # host-precomputed constants for the regular grid
                g_pos, g_mean, g_member, g_mask, g_reorder = grid_cluster(h, w, m)
                reorder = jnp.asarray(g_reorder, dtype=jnp.int32)
                feat = jnp.take_along_axis(feat, reorder[None, :, None], axis=1)
                pos = jnp.broadcast_to(jnp.asarray(g_pos)[None], (b, n, d))
                cluster_mean_pos = jnp.broadcast_to(
                    jnp.asarray(g_mean)[None], (b,) + g_mean.shape
                )
                member_idx = jnp.broadcast_to(
                    jnp.asarray(g_member, dtype=jnp.int32)[None],
                    (b,) + g_member.shape,
                )
                cluster_mask = (
                    None
                    if g_mask is None
                    else jnp.broadcast_to(
                        jnp.asarray(g_mask)[None], (b,) + g_mask.shape
                    )
                )
            else:
                pos, cluster_mean_pos, member_idx, cluster_mask, reorder = (
                    space_filling_cluster(pos, m, h, w)
                )
                member_idx = member_idx.astype(jnp.int32)
                feat = jnp.take_along_axis(feat, reorder, axis=1)

            assert member_idx.shape[1] == k and member_idx.shape[2] == m, (
                "member_idx shape incorrect"
            )

            if on_grid and k != n:
                # on-grid kNN is a pure function of (h, w, m): host constant
                g_ncc = grid_nearest_clusters(h, w, m, nnc)
                static_ncc = g_ncc  # enables the windowed-K/V kernel path
                static_pos = g_pos  # + the compact-union layout
                nearest_cluster = jnp.broadcast_to(
                    jnp.asarray(g_ncc)[None], (b,) + g_ncc.shape
                )
            else:
                nearest_cluster = knn(pos, cluster_mean_pos, nnc)  # b n nnc

            # expand cluster members arithmetically: after the reorder,
            # cluster c holds rows [c*m, (c+1)*m); padded slots point past n
            # and are masked (the reference pads with token 0 instead —
            # masked either way, aff_transformer.py:479-483)
            slot = jnp.arange(m, dtype=jnp.int32)
            member_idx = (
                nearest_cluster[..., None] * m + slot
            ).reshape(b, n, nbhd_size)
            if k * m != n:
                cluster_mask = (member_idx < n).astype(jnp.int32)
            else:
                cluster_mask = None

            if use_pallas or (0 < n <= dense_nmax):
                rel_pos = None  # fused kernel / dense routing: bias from pos
            else:
                # clusters are contiguous rows after the reorder, so the pos
                # neighborhood gather rides the MXU (one-hot over clusters)
                pos_gathered = gather_clusters_onehot(
                    pos[:, None], nearest_cluster, m
                )[:, 0]  # b n m 2
                rel_pos = pos_gathered - (pos[:, :, None, :] - R)

        ncc = None if global_attn else nearest_cluster
        csize = 0 if global_attn else m

        # Masked-dense routing: at small n the neighborhood formulations
        # (Pallas plane loop OR XLA one-hot gathers) are issue-/bandwidth-
        # bound, while attention over ALL n tokens with the neighborhood
        # folded in as a -100 additive mask is ONE large batched MXU matmul
        # with no gathers at all (the gathered path materializes
        # (b, h, n, m, c_) K/V — ~0.9 GB per tensor at Small stage 3).
        # exp(-100) vanishes under the f32 softmax, so this is numerically
        # the gathered path (parity-pinned in tests). Merge still uses the
        # clustered geometry computed above. 0 = off (default).
        dense_local = not global_attn and 0 < n <= dense_nmax
        if dense_local:
            kc = int(math.ceil(n / float(m)))
            # token j visible to token i iff cluster(j) in ncc[i, :]
            # (clusters are contiguous rows of m after the reorder)
            in_ncc = (
                nearest_cluster[..., None]
                == jnp.arange(kc, dtype=nearest_cluster.dtype)
            ).any(axis=2)  # b x n x k
            nbhd_mask = jnp.repeat(in_ncc, m, axis=2)[:, :, :n]  # b x n x n
            rel_pos = (pos[:, None, :, :] + R) - pos[:, :, None, :]
            blk_global, blk_member, blk_mask = True, None, nbhd_mask
            blk_ncc, blk_csize, blk_pe = None, 0, rel_pos_features(rel_pos, R)
            fused = False
        else:
            blk_global, blk_member, blk_mask = (
                global_attn, member_idx, cluster_mask,
            )
            blk_ncc, blk_csize = ncc, csize
            fused = use_pallas and not global_attn
            blk_pe = None if fused else rel_pos_features(rel_pos, R)
        pe_feat = blk_pe

        # sequence-parallel layout hint: shard the token axis over the mesh
        # `seq` axis (no-op without one in context, parallel/mesh.py)
        feat = shard_tokens(feat)

        # __call__ args with self at 0: 4=global_attn, 6=deterministic,
        # 8=cluster_size, 10=static_ncc, 11=static_pos (hashable-wrapped)
        block_cls = remat_wrap(
            ClusterTransformerBlock, self.remat, (4, 6, 8, 10, 11)
        )
        if self.remat:
            static_ncc = None if static_ncc is None else HashableArray(static_ncc)
            static_pos = None if static_pos is None else HashableArray(static_pos)

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
                dtype=self.dtype,
                name=f"blocks_{i_blk}",
            )(feat, blk_member, blk_mask, blk_global, pe_feat,
              deterministic, blk_ncc, blk_csize, pos, static_ncc, static_pos)
            feat = shard_tokens(feat)

        if self.out_dim is not None:
            if member_idx is None:
                # global-attention stage followed by a downsampler: the whole
                # token set is the neighborhood (pe_feat is already
                # b x n x n x 5). The reference crashes on this combination
                # (aff_transformer.py:334 with member_idx=None); its configs
                # never hit it, ours supports it.
                member_idx = jnp.broadcast_to(
                    jnp.arange(n, dtype=jnp.int32)[None, None, :], (b, n, n)
                )
            learned_prob = jax.nn.sigmoid(
                nn.Dense(
                    1, dtype=self.dtype, kernel_init=trunc_normal_init(),
                    name="prob_net",
                )(feat)
            )
            reserve_num = math.ceil(h / (stride * 2)) * math.ceil(w / (stride * 2))
            pos, feat = ClusterMerging(
                dim=self.dim,
                out_dim=self.out_dim,
                alpha=self.alpha,
                ds_rate=self.ds_rate,
                reserve_on=self.reserve_on,
                rel_pos_width=R,
                wf_mode=self.wf_mode,
                merge_mode=self.merge_mode,
                dtype=self.dtype,
                name="downsample",
            )(pos, feat, member_idx, cluster_mask, learned_prob, stride,
              reserve_num, nearest_cluster=ncc, cluster_size=csize)
            feat = shard_tokens(feat)

        return pos, feat


class AutoFocusFormer(nn.Module):
    """The AFF classifier (reference ``aff_transformer.py:556-670``)."""

    num_classes: int = 1000
    embed_dim: Sequence[int] = (32, 128, 256, 512)
    cluster_size: int = 8
    nbhd_size: Sequence[int] = (48, 48, 48, 49)
    alpha: float = 4.0
    ds_rate: float = 0.25
    reserve_on: bool = True
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    mlp_ratio: float = 2.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    layer_scale: float = 0.0
    img_size: int = 224
    use_pallas: bool = False
    wf_mode: str = ""  # ClusterMerging WF lowering ('' = default)
    merge_mode: str = ""  # ClusterMerging aggregation ('pallas' = fused kernel)
    remat: str = ""  # rematerialize blocks in backward (layers.py::remat_wrap)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, training: bool = False
    ) -> jax.Array:
        """x: b x H x W x 3 (NHWC) -> logits b x num_classes."""
        num_layers = len(self.depths)
        R = self.img_size // 4 - 1  # aff_transformer.py:20

        pos, feat, h, w = PatchEmbed(
            embed_dim=self.embed_dim[0],
            use_norm=self.patch_norm,
            dtype=self.dtype,
            name="patch_embed",
        )(x, training=training)
        feat = nn.Dropout(self.drop_rate)(feat, deterministic=not training)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()

        for i_layer in range(num_layers):
            sl = slice(
                sum(self.depths[:i_layer]), sum(self.depths[: i_layer + 1])
            )
            pos, feat = BasicLayer(
                dim=int(self.embed_dim[i_layer]),
                out_dim=(
                    int(self.embed_dim[i_layer + 1])
                    if i_layer < num_layers - 1
                    else None
                ),
                cluster_size=self.cluster_size,
                nbhd_size=self.nbhd_size[i_layer],
                depth=self.depths[i_layer],
                num_heads=self.num_heads[i_layer],
                mlp_ratio=self.mlp_ratio,
                alpha=self.alpha,
                ds_rate=self.ds_rate,
                reserve_on=self.reserve_on,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=tuple(dpr[sl]),
                layer_scale=self.layer_scale,
                rel_pos_width=R,
                use_pallas=self.use_pallas,
                wf_mode=self.wf_mode,
                merge_mode=self.merge_mode,
                remat=self.remat,
                dtype=self.dtype,
                name=f"layers_{i_layer}",
            )(pos, feat, h=h, w=w, on_grid=i_layer == 0,
              stride=2 ** (i_layer + 1), deterministic=not training)

        feat = LayerNormFp32(epsilon=1e-5, name="norm")(feat)
        feat = feat.mean(axis=1)
        if self.num_classes > 0:
            feat = nn.Dense(
                self.num_classes, dtype=self.dtype,
                kernel_init=trunc_normal_init(), name="head",
            )(feat)
        return feat
