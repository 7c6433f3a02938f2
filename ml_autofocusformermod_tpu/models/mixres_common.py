"""Shared MixRes components: sine PE, scale-coordinate grids, MLP ladders,
overlap patch embeddings, and static-shape scale partitioning.

Reference: ``models/mixres_neighbour.py:30-170,364-406,546-579`` and
``models/mixres_vit.py:11-77,217-281`` (the reference duplicates these
between files; here they live once).

TPU note — scale partitioning: tokens carry a 3-vector position
``(scale, x, y)``. The reference partitions token sets by scale with
``torch.where(pos[:,:,0]==s)`` — dynamic shapes. The per-scale token counts
are fully determined by the split cascade, so we thread a static
``layout: {scale: count}`` through the models and extract scale groups with
a stable argsort on the mismatch flag: same tokens, same relative order,
static shapes (SURVEY.md §7 design stance).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import LayerNormFp32, trunc_normal_init

Dtype = Any

# The reference sizes the MixRes relative-position table for inputs up to
# 2048 x 2048 (mixres_neighbour.py:13-15)
MIXRES_REL_POS_WIDTH = 2048 // 4 - 1
MIXRES_TABLE_WIDTH = 2 * MIXRES_REL_POS_WIDTH + 1


def sine_position_embedding(
    pos: jax.Array, num_pos_feats: int, temperature: float = 10000.0,
    normalize: bool = True, scale: Optional[float] = None,
) -> jax.Array:
    """DETR-style sine embedding over 2-D positions
    (``mixres_neighbour.py:30-83``). pos: (b, n, 2) (x, y)."""
    if scale is None:
        scale = 2 * math.pi
    x_embed = pos[:, :, 0].astype(jnp.float32)
    y_embed = pos[:, :, 1].astype(jnp.float32)
    if normalize:
        eps = 1e-6
        y_embed = jnp.clip(y_embed / (y_embed.max() + eps), 0, 1) * scale
        x_embed = jnp.clip(x_embed / (x_embed.max() + eps), 0, 1) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = jnp.concatenate(
        [jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=2
    )
    pos_y = jnp.concatenate(
        [jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])], axis=2
    )
    return jnp.concatenate([pos_x, pos_y], axis=2)


def scale_grid_positions(
    height: int, width: int, patch_size: int, min_patch_size: int, scale: int
) -> np.ndarray:
    """(n, 3) rows of (scale, x, y) — coords of patch centers in
    min-patch units, x varying fastest (``mixres_vit.py:67-77``)."""
    step = patch_size // min_patch_size
    xs = np.arange(0, width // min_patch_size, step)
    ys = np.arange(0, height // min_patch_size, step)
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    coords = np.stack([gx, gy], axis=2).reshape(-1, 2)
    out = np.concatenate(
        [np.full((coords.shape[0], 1), scale), coords], axis=1
    )
    return out.astype(np.float32)


def extract_scale(
    feat: jax.Array, pos: jax.Array, scale: int, count: int,
    extra: Optional[jax.Array] = None,
):
    """Select the ``count`` tokens whose scale channel equals ``scale``,
    preserving their relative order; also returns the complement.

    Static-shape replacement for the reference's ``torch.where`` partition
    (``mixres_neighbour.py:758-777``).
    """
    b, n, _ = pos.shape
    mismatch = (pos[:, :, 0] != scale).astype(jnp.int32)
    order = jnp.argsort(mismatch, axis=1, stable=True)  # matches first
    sel = order[:, :count, None]
    rest = order[:, count:, None]
    feat_s = jnp.take_along_axis(feat, sel, axis=1)
    pos_s = jnp.take_along_axis(pos, sel, axis=1)
    feat_r = jnp.take_along_axis(feat, rest, axis=1)
    pos_r = jnp.take_along_axis(pos, rest, axis=1)
    if extra is not None:
        extra_s = jnp.take_along_axis(extra, sel[..., 0], axis=1)
        return feat_s, pos_s, feat_r, pos_r, extra_s
    return feat_s, pos_s, feat_r, pos_r


class MLPBlock(nn.Module):
    """Linear -> GELU -> LN (``mixres_neighbour.py:125-135``)."""

    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(
            self.out_dim, dtype=self.dtype, kernel_init=trunc_normal_init(),
            name="linear",
        )(x)
        x = nn.gelu(x, approximate=False)
        x = LayerNormFp32(epsilon=1e-5, name="norm")(x)
        return x


class MLPDeepNorm(nn.Module):
    """Ladder of MLPBlocks (``mixres_neighbour.py:137-151``)."""

    hidden_features: int
    out_features: int
    num_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dims = [self.hidden_features] * (self.num_layers - 1) + [self.out_features]
        for i, d in enumerate(dims):
            x = MLPBlock(d, dtype=self.dtype, name=f"layers_{i}")(x)
        return x


class MLP(nn.Module):
    """ReLU MLP head (``maskfiner_up_down.py:13-25``)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(
                out, dtype=self.dtype, kernel_init=trunc_normal_init(),
                name=f"layers_{i}",
            )(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class DownSampleConvBlock(nn.Module):
    """conv s2 -> LeakyReLU -> norm. The reference defines this block twice in
    mixres_neighbour.py; the second (BatchNorm) definition wins at import
    (``mixres_neighbour.py:546-558``). The mixres_vit copy uses GroupNorm(1)
    (``mixres_vit.py:217-229``)."""

    out_dim: int
    norm: str = "batch"  # 'batch' | 'group'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        x = nn.Conv(
            self.out_dim, (3, 3), strides=(2, 2), padding=1,
            dtype=self.dtype, name="conv",
        )(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        if self.norm == "batch":
            x = nn.BatchNorm(
                use_running_average=not training, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name="b_norm",
            )(x)
        else:
            x = nn.GroupNorm(
                num_groups=1, epsilon=1e-5, dtype=jnp.float32, name="g_norm"
            )(x)
        return x.astype(self.dtype)


class OverlapPatchEmbedding(nn.Module):
    """log2(patch_size) stacked stride-2 conv blocks + final LN
    (``mixres_neighbour.py:560-579`` / ``mixres_vit.py:262-281``).
    NHWC in, (b, n, c) out."""

    patch_size: int
    embed_dim: int
    norm: str = "batch"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, im: jax.Array, training: bool = False) -> jax.Array:
        n_layers = int(math.log2(self.patch_size))
        dims = [int(self.embed_dim // 2 ** (n_layers - 1 - i)) for i in range(n_layers)]
        x = im
        for i, d in enumerate(dims):
            x = DownSampleConvBlock(
                d, norm=self.norm, dtype=self.dtype, name=f"conv_layers_{i}"
            )(x, training=training)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        x = LayerNormFp32(epsilon=1e-5, name="out_norm")(x)
        return x


def gather_image_patches(
    im: jax.Array, pos2d: jax.Array, patch_size: int, min_patch_size: int
) -> jax.Array:
    """Raw pixels under each token's patch, flattened pixel-major.

    ``im``: (b, H, W, 3) NHWC; ``pos2d``: (b, n, 2) in min-patch units.
    Returns (b, n, patch_size**2 * 3) ordered x-fastest then channels,
    matching ``mixres_neighbour.py:807-819``.
    """
    b, H, W, _ = im.shape
    n = pos2d.shape[1]
    pos_org = pos2d * min_patch_size  # pixel coords of patch corners
    ar = jnp.arange(patch_size)
    gx, gy = jnp.meshgrid(ar, ar, indexing="xy")
    patch_coords = jnp.stack([gx, gy], axis=2).reshape(-1, 2)  # ps*ps x 2
    pp = pos_org[:, :, None, :] + patch_coords[None, None]  # b n p 2
    pp = pp.reshape(b, -1, 2)
    idx = (pp[..., 1] * W + pp[..., 0]).astype(jnp.int32)  # b n*p
    flat = im.reshape(b, H * W, 3)
    pix = jnp.take_along_axis(flat, idx[..., None], axis=1)  # b n*p 3
    return pix.reshape(b, n, patch_size * patch_size * 3)
