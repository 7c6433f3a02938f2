"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL/DDP layer
(``utils.py:106-146``, ``main.py:102``): instead of one process per GPU
with hook-based gradient all-reduce, we lay a ``jax.sharding.Mesh`` over all
chips, shard the batch over the ``data`` axis, replicate parameters, and let
XLA insert the gradient all-reduces over ICI/DCN. A ``model`` axis is part
of the mesh from day one (reserved; the reference never shards the model)
so tensor-parallel layouts can be added without re-plumbing.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "shard_tokens",
    "local_device_count",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"


def make_mesh(
    data: int = -1,
    model: int = 1,
    seq: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    """Create a ``(data, model, seq)`` mesh. ``data=-1`` uses all devices.

    Axis order puts ``model``/``seq`` innermost so model- and
    sequence-parallel collectives ride the fastest ICI links.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % (model * seq) == 0, (
            f"{n} devices not divisible by model*seq={model * seq}"
        )
        data = n // (model * seq)
    assert data * model * seq == n, (
        f"mesh {data}x{model}x{seq} != {n} devices"
    )
    arr = np.asarray(devices).reshape(data, model, seq)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS, SEQ_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Assemble per-host batches into one global batch-sharded array tree.

    Each process passes its *local* batch (the shard its own loader
    produced); the global batch is their concatenation along axis 0, so a
    2-host run with per-host batch 128 yields a global batch of 256.
    ``jax.device_put`` with a cross-process sharding would instead treat
    every process's argument as the same global value (global batch 128,
    half of each host's samples dropped) — hence
    ``make_array_from_process_local_data`` on multi-process runs.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        put = lambda x: jax.device_put(x, sh)
    else:
        put = lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x))
    return jax.tree_util.tree_map(put, batch)


def _ambient_mesh_axes() -> tuple:
    """Axis names of the mesh currently in context (trace- or eager-time);
    empty tuple when no mesh is set."""
    try:
        am = jax.sharding.get_abstract_mesh()
        if am is not None and am.axis_names:
            return tuple(am.axis_names)
    except Exception:
        pass
    try:
        from jax._src.mesh import thread_resources

        pm = thread_resources.env.physical_mesh
        if pm is not None and not pm.empty:
            return tuple(pm.axis_names)
    except Exception:
        pass
    return ()


def shard_tokens(x: jax.Array) -> jax.Array:
    """Sequence-parallel sharding constraint on ``(batch, tokens, ...)``
    activations: batch over ``data``, the token axis over ``seq``.

    The reference has no sequence parallelism (SURVEY §2.5, §5 — its
    large-n story is algorithmic); on TPU the token axis of the per-token
    neighborhood attention is the natural extra mesh axis.  XLA's SPMD
    partitioner propagates this constraint through the stage and inserts
    the gather/attention collectives over ICI.

    No-op unless a mesh with both axes is in context, so model code can
    call it unconditionally (init and single-device paths are unaffected).
    """
    axes = _ambient_mesh_axes()
    if DATA_AXIS not in axes or SEQ_AXIS not in axes:
        return x
    spec = P(DATA_AXIS, SEQ_AXIS, *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, spec)


def local_device_count() -> int:
    return jax.local_device_count()
