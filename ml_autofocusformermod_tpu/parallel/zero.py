"""ZeRO-1: shard optimizer moments (and EMA shadow) over the ``data`` axis.

The reference has no ZeRO/FSDP story (SURVEY §2.5: "No"); its optimizer
state is fully replicated per GPU. Here the Adam moments and the EMA
shadow params — the redundant per-chip state that dominates training
memory at scale — are sharded over the mesh ``data`` axis on top of the
tensor-parallel layout (``parallel/tp.py``). Params/grads stay replicated
across ``data`` (classic ZeRO-1): XLA computes the moment update on each
shard and all-gathers only the parameter delta, trading one all-gather
per step for a ``1/data`` cut in optimizer-state memory.

Enable with ``TPU.ZERO1: true`` (off by default — at the reference's
model sizes replication is cheaper than the extra collective).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import tp
from .mesh import DATA_AXIS, MODEL_AXIS

__all__ = ["zero1_spec_for_path", "tree_shardings", "shard_tree"]


def _is_zero1_leaf(path: str) -> bool:
    """Optimizer-moment or EMA leaves of a TrainState key path."""
    if path.startswith("ema_params/") or path.startswith("ema_params."):
        return True
    return "opt_state" in path and ("/mu/" in path or "/nu/" in path)


def zero1_spec_for_path(path: str, shape, data: int, tp_size: int) -> P:
    """TP spec extended with ``data``-axis sharding on the first free,
    divisible dimension of ZeRO-1-eligible leaves."""
    base = tp.spec_for_path(path, shape, tp_size)
    if data <= 1 or not _is_zero1_leaf(path):
        return base
    taken = tuple(base) + (None,) * (len(shape) - len(tuple(base)))
    for dim, size in enumerate(shape):
        if taken[dim] is None and size % data == 0 and size >= data:
            new = list(taken)
            new[dim] = DATA_AXIS
            return P(*new)
    return base  # no divisible free dim -> stay replicated over data


def tree_shardings(mesh: Mesh, tree: Any) -> Any:
    data = mesh.shape.get(DATA_AXIS, 1)
    tp_size = mesh.shape.get(MODEL_AXIS, 1)
    return jax.tree_util.tree_map_with_path(
        lambda p, leaf: NamedSharding(
            mesh,
            zero1_spec_for_path(
                tp._normalize(p), getattr(leaf, "shape", ()), data, tp_size
            ),
        ),
        tree,
    )


def shard_tree(mesh: Mesh, tree: Any) -> Any:
    """Device-put a TrainState with TP + ZeRO-1 layout."""
    return jax.device_put(tree, tree_shardings(mesh, tree))
