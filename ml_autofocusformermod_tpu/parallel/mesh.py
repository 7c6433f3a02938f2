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
    "local_device_count",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = -1, model: int = 1, devices: Optional[list] = None
) -> Mesh:
    """Create a ``(data, model)`` mesh. ``data=-1`` uses all devices.

    Axis order puts ``model`` innermost so model-parallel collectives ride
    the fastest ICI links when a model axis is introduced.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, (
        f"mesh {data}x{model} != {n} devices"
    )
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


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


def local_device_count() -> int:
    return jax.local_device_count()
