"""Exact k-nearest-neighbor search as one matmul + top-k.

Replaces the reference's pykeops JIT-CUDA kNN (``point_utils.py:27-58``,
SURVEY N6). On TPU the databases are tiny (cluster centers: ``k ~ n/m``
points) and positions are small integer-valued coordinates, so the
``|q|^2 + |d|^2 - 2 q.d`` expansion is **exact** in float32 (all terms are
integers well below 2^24) and runs on the MXU — no streaming LazyTensor
machinery needed.

Gradients are stopped, matching the reference (``point_utils.py:41-43``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["knn"]


def knn(query: jax.Array, database: jax.Array, k: int, return_dist: bool = False):
    """Indices (and optionally distances) of the k nearest database points.

    Args:
        query: ``(b, nq, c)`` positions searching for neighbors.
        database: ``(b, nd, c)`` candidate positions.
        k: number of neighbors.
        return_dist: also return Euclidean distances.

    Returns:
        ``nn_idx (b, nq, k)`` int32, and if ``return_dist`` also
        ``nn_dist (b, nq, k)`` float32. Neighbors are ordered by increasing
        distance; ties broken by lower index (XLA ``top_k`` convention).
    """
    query = jax.lax.stop_gradient(query).astype(jnp.float32)
    database = jax.lax.stop_gradient(database).astype(jnp.float32)

    q_sq = (query**2).sum(-1)  # b x nq
    d_sq = (database**2).sum(-1)  # b x nd
    cross = jnp.einsum(
        "bqc,bdc->bqd", query, database, preferred_element_type=jnp.float32
    )
    dist_sq = q_sq[:, :, None] + d_sq[:, None, :] - 2.0 * cross  # b x nq x nd

    neg_top, nn_idx = jax.lax.top_k(-dist_sq, k)
    nn_idx = nn_idx.astype(jnp.int32)
    if return_dist:
        nn_dist = jnp.sqrt(jnp.maximum(-neg_top, 0.0))
        return nn_idx, nn_dist
    return nn_idx
