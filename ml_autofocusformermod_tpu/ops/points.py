"""Dense-canvas scatter of off-grid tokens (reference ``point_utils.py:10-24``).

Kept in the public API for downstream segmentation consumers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["points2img"]


def points2img(pos: jax.Array, pixel: jax.Array, h: int, w: int) -> jax.Array:
    """Scatter tokens onto an ``h x w`` canvas; blank spots are 0.

    Args:
        pos: ``(b, n, 2)`` integer-valued (x, y) positions, valid canvas indices.
        pixel: ``(b, n, c)`` token features.

    Returns:
        ``(b, c, h, w)`` image. If several tokens map to one cell the result
        takes one of them (XLA scatter pick-last), matching torch ``scatter``'s
        unspecified-duplicate semantics closely enough for the bookkeeping use.
    """
    b, n, c = pixel.shape
    idx = (pos[:, :, 1] * w + pos[:, :, 0]).astype(jnp.int32)  # b x n
    img = jnp.zeros((b, h * w, c), dtype=pixel.dtype)
    img = jax.vmap(lambda im, ix, px: im.at[ix].set(px))(img, idx, pixel)
    return img.transpose(0, 2, 1).reshape(b, c, h, w)
