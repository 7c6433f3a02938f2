"""MixResViT: the global-attention pyramid level of MaskFiner
(reference ``models/mixres_vit.py:106-422``).

Used as the coarsest (32x32-patch) encoder level and the final decoder
level. Standard dense attention blocks whose FeedForward carries a 3x3
depthwise conv over the token grid (both uses keep tokens on a full grid,
so h*w == n holds).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..parallel.mesh import shard_tokens
from .layers import DropPath, LayerNormFp32, remat_wrap, trunc_normal_init
from .mixres_common import (
    OverlapPatchEmbedding,
    scale_grid_positions,
    sine_position_embedding,
)

Dtype = Any


class DWConv(nn.Module):
    """Depthwise 3x3 over the (h, w) token grid (``mixres_vit.py:106-117``)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, h: int, w: int) -> jax.Array:
        b, n, c = x.shape
        img = x.reshape(b, h, w, c)
        img = nn.Conv(
            c, (3, 3), padding=1, feature_group_count=c, dtype=self.dtype,
            name="dwconv",
        )(img)
        return img.reshape(b, n, c)


class FeedForward(nn.Module):
    """fc1 -> (dwconv) -> GELU -> drop -> fc2 -> drop (``mixres_vit.py:120-145``)."""

    hidden_dim: int
    dropout: float = 0.0
    dw_conv: bool = True
    out_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, h: int, w: int, deterministic: bool = True
    ) -> jax.Array:
        out_dim = self.out_dim if self.out_dim is not None else x.shape[-1]
        x = nn.Dense(
            self.hidden_dim, dtype=self.dtype, kernel_init=trunc_normal_init(),
            name="fc1",
        )(x)
        if self.dw_conv:
            x = DWConv(self.hidden_dim, dtype=self.dtype, name="dwconv")(x, h, w)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(
            out_dim, dtype=self.dtype, kernel_init=trunc_normal_init(), name="fc2"
        )(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Dense multi-head self-attention (``mixres_vit.py:148-186``)."""

    heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, n, c = x.shape
        h = self.heads
        c_ = c // h
        qkv = nn.Dense(
            3 * c, dtype=self.dtype, kernel_init=trunc_normal_init(), name="qkv"
        )(x)
        qkv = qkv.reshape(b, n, 3, h, c_).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum(
            "bhic,bhjc->bhij", q, k, preferred_element_type=self.dtype
        ) * (c_**-0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum(
            "bhij,bhjc->bhic", attn, v, preferred_element_type=self.dtype
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(
            c, dtype=self.dtype, kernel_init=trunc_normal_init(), name="proj"
        )(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class Block(nn.Module):
    """Pre-LN attn + FF block with optional LayerScale (``mixres_vit.py:189-215``)."""

    heads: int
    mlp_dim: int
    dropout: float = 0.0
    drop_path: float = 0.0
    layer_scale: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, h: int, w: int, deterministic: bool = True
    ) -> jax.Array:
        dim = x.shape[-1]
        y = Attention(
            self.heads, self.dropout, dtype=self.dtype, name="attn"
        )(
            LayerNormFp32(epsilon=1e-5, name="norm1")(x),
            deterministic,
        )
        dp = DropPath(self.drop_path, name="drop_path")
        mlp = FeedForward(
            self.mlp_dim, self.dropout, dtype=self.dtype, name="mlp"
        )
        norm2 = LayerNormFp32(epsilon=1e-5, name="norm2")

        use_ls = (
            self.layer_scale is not None
            and isinstance(self.layer_scale, (int, float))
            and self.layer_scale > 0
        )
        if use_ls:
            gamma1 = self.param(
                "gamma1", nn.initializers.constant(self.layer_scale), (dim,)
            )
            gamma2 = self.param(
                "gamma2", nn.initializers.constant(self.layer_scale), (dim,)
            )
            x = x + dp(gamma1.astype(y.dtype) * y, deterministic)
            z = mlp(norm2(x), h, w, deterministic)
            x = x + dp(gamma2.astype(z.dtype) * z, deterministic)
        else:
            x = x + dp(y, deterministic)
            z = mlp(norm2(x), h, w, deterministic)
            x = x + dp(z, deterministic)
        return x


class MixResViT(nn.Module):
    """Global-attention MaskFiner level (``mixres_vit.py:308-422``).

    ``first_layer=True``: overlap patch embed (GroupNorm convs) + sine PE on
    a fresh grid. Otherwise: LayerNorm + linear projection of incoming
    tokens. Emits the standard ``res*`` output dict.
    """

    patch_sizes: Sequence[int]
    n_layers: int
    d_model: int
    n_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    drop_path_rate: Sequence[float] = (0.0,)
    channels: int = 3
    split_ratio: int = 4
    n_scales: int = 2
    min_patch_size: int = 4
    upscale_ratio: float = 0.0
    first_layer: bool = True
    layer_scale: float = 0.0
    num_register_tokens: int = 0
    out_features: Sequence[str] = ("res5",)
    remat: str = ""  # rematerialize blocks in backward (layers.py::remat_wrap)
    dtype: Dtype = jnp.float32

    @property
    def patch_size(self) -> int:
        return self.patch_sizes[-1]

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
        patched = (H // ps, W // ps)
        min_patched = (H // self.min_patch_size, W // self.min_patch_size)
        det = not training

        if self.first_layer:
            x = OverlapPatchEmbedding(
                ps, self.d_model, norm="group", dtype=self.dtype,
                name="patch_embed",
            )(im, training=training)
            pos_np = scale_grid_positions(H, W, ps, self.min_patch_size, scale)
            pos = jnp.broadcast_to(
                jnp.asarray(pos_np)[None], (b,) + pos_np.shape
            )
            x = x + sine_position_embedding(
                pos[:, :, 1:], self.d_model // 2
            ).astype(x.dtype)
            layout = {scale: pos_np.shape[0]}
        else:
            features = LayerNormFp32(epsilon=1e-5, name="token_norm")(features,)
            if self.channels != self.d_model:
                x = nn.Dense(
                    self.d_model, dtype=self.dtype,
                    kernel_init=trunc_normal_init(), name="token_projection",
                )(features)
            else:
                x = features
            pos = features_pos

        if self.num_register_tokens:
            reg = self.param(
                "register_tokens",
                nn.initializers.zeros,
                (1, self.num_register_tokens, self.d_model),
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(reg, (b,) + reg.shape[1:]).astype(x.dtype), x],
                axis=1,
            )

        dpr = list(self.drop_path_rate)
        # sequence-parallel layout hint (no-op without a `seq` mesh axis)
        x = shard_tokens(x)
        # __call__ args with self at 0: 2=h, 3=w, 4=deterministic
        block_cls = remat_wrap(Block, self.remat, (2, 3, 4))
        for i in range(self.n_layers):
            x = block_cls(
                heads=self.n_heads,
                mlp_dim=int(self.d_model * self.mlp_ratio),
                dropout=self.dropout,
                drop_path=dpr[i] if i < len(dpr) else dpr[-1],
                layer_scale=self.layer_scale,
                dtype=self.dtype,
                name=f"layers_blocks_{i}",
            )(x, patched[0], patched[1], det)
            x = shard_tokens(x)
        x = x[:, self.num_register_tokens:]

        outs: Dict[str, Any] = {}
        name = self.out_features[0]
        outs[name] = LayerNormFp32(epsilon=1e-5, name="norm_out")(x)
        outs[name + "_pos"] = pos[:, :, 1:]
        outs[name + "_spatial_shape"] = patched
        outs[name + "_scale"] = pos[:, :, 0]
        outs["min_spatial_shape"] = min_patched
        return outs, dict(layout)
