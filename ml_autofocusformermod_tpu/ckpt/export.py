"""Serving export: serialize the jitted forward pass via ``jax.export``.

The reference has no serving story beyond loading a ``.pth`` in the same
codebase; for production TPU serving we export the forward as a
portable StableHLO artifact (``jax.export``), callable from any JAX
process (or via PjRT C API embedding) without this package's model code.

Weights stay *arguments* (not baked-in constants), so one artifact serves
every checkpoint of the same config: pair it with Orbax params
(``ckpt/orbax_io.py``) or an imported ``.pth`` tree (``ckpt/pth_import.py``).

Cross-platform lowering is supported: ``platforms=("tpu",)`` exports a
TPU artifact from a CPU-only host. The exported program uses the pure-XLA
attention path (``use_pallas=False`` models) by default — Mosaic custom
calls are chip-generation-specific, while StableHLO is portable.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def export_forward(
    model,
    variables: Any,
    batch_size: int,
    img_size: int,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize ``model.apply(variables, images, training=False)``.

    Returns the ``jax.export`` artifact bytes. ``variables`` is only used
    for its tree structure/shapes (weights remain call-time arguments).
    """
    from jax import export as jexport

    def fwd(variables, images):
        return model.apply(variables, images, training=False)

    var_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        variables,
    )
    img_spec = jax.ShapeDtypeStruct(
        (batch_size, img_size, img_size, 3), jnp.float32
    )
    exp = jexport.export(
        jax.jit(fwd),
        platforms=tuple(platforms) if platforms else None,
    )(var_spec, img_spec)
    return exp.serialize()


def save_exported(path: str, data: bytes) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)


def load_exported(path_or_bytes) -> Callable:
    """Deserialize an exported forward; returns ``fn(variables, images)``."""
    from jax import export as jexport

    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    exp = jexport.deserialize(data)
    return exp.call
