"""CLUSTEN ops: gather-fused neighborhood attention primitives.

TPU equivalents of the reference's CUDA extension (SURVEY N1-N3):

* :func:`clusten_qk` — ``attn[b,h,i,j] = sum_c q[b,h,i,c] * k[b,h,idx[b,i,j],c]``
  (reference ``clusten/src/clustenqk_cuda_kernel.cu:18-49``; ground-truth
  formula in ``clusten/test_qk_kernel.py:39-40``).
* :func:`clusten_av` — ``out[b,h,i,c] = sum_j attn[b,h,i,j] * v[b,h,idx[b,i,j],c]``
  (``clustenav_cuda_kernel.cu:18-50``; ``test_av_kernel.py:39-40``).
* :func:`clusten_wf` — ``out[b,i,ic,c] = sum_j w[b,i,j,ic] * f[b,idx[b,i,j],c]``
  (``clustenwf_cuda_kernel.cu:18-53``; ``test_wf_kernel.py:40-41``).

These are written as gather + einsum: XLA differentiates them (the gathers'
transposes become deterministic scatter-adds — the reference hand-writes
those backward kernels with ``fastAtomicAdd``), fuses the elementwise
epilogues, and keeps everything statically shaped. The hot fused
softmax-attention path lives in :mod:`.clusten_pallas`.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = [
    "clusten_qk", "clusten_av", "clusten_wf", "gather_neighbors",
    "wf_contract",
]


def wf_contract(weights: jax.Array, feat_g: jax.Array,
                mode: str = "") -> jax.Array:
    """``out[b,n,ic,c] = sum_m weights[b,n,m,ic] * feat_g[b,n,m,c]``.

    The per-(b,n) contraction is a tiny (ic x m)@(m x c) matmul; XLA
    conv-ifies the batched einsum and surrounds it with layout copies
    (several ms at stage-1->2 shapes). The default ``vpu`` lowering is a
    broadcast-multiply + reduce over m instead — a single memory-bound
    reduce fusion in the gathered features' native layout, no transposes
    (measured AFF-Mini fwd 2328 -> 2414 img/s at b128). Accumulates in
    f32 (matching the MXU einsum's accumulator) and casts back.
    ``MLAFF_WF_MODE=einsum`` restores the batched-einsum lowering.
    """
    # explicit env (A/B sweeps) > config-threaded mode > code default
    mode = os.environ.get("MLAFF_WF_MODE", "") or mode or "vpu"
    if mode == "ic":
        # per-inner-channel slices: ic (=4) rank-4 multiply+reduce
        # fusions, each consuming feat_g in its producer's layout. The
        # rank-5 broadcast of the ``vpu`` mode makes XLA materialize the
        # gathered features TWICE at stage-1 shapes (a (b, n'*m, c)
        # producer fusion plus a full relayout copy, ~5.9 ms/iter of the
        # Small b128 forward profile); rank-4 keeps the gather fusible
        # into the reduce so the big tensor never reaches HBM.
        ic = weights.shape[-1]
        cols = [
            (weights[..., :, i:i + 1] * feat_g)
            .sum(axis=-2, dtype=jnp.float32)
            for i in range(ic)
        ]
        return jnp.stack(cols, axis=-2).astype(weights.dtype)
    if mode == "vpu":
        prod = weights[..., :, :, None] * feat_g[..., :, None, :]
        return prod.sum(axis=-3, dtype=jnp.float32).astype(weights.dtype)
    return jnp.einsum(
        "bnmi,bnmc->bnic", weights, feat_g,
        preferred_element_type=weights.dtype,
    )


def gather_neighbors(values: jax.Array, nbhd_idx: jax.Array) -> jax.Array:
    """Gather per-token neighborhoods: ``out[b, ..., i, j] = values[b, ..., idx[b,i,j]]``.

    Args:
        values: ``(b, n, c)`` or ``(b, h, n, c)``.
        nbhd_idx: ``(b, n_out, m)`` integer indices into the token axis.

    Returns:
        ``(b, n_out, m, c)`` or ``(b, h, n_out, m, c)``.
    """
    b, n_out, m = nbhd_idx.shape
    flat_idx = nbhd_idx.reshape(b, n_out * m)
    if values.ndim == 3:
        c = values.shape[-1]
        # row gather: (1, c) slices instead of elementwise gathers
        flat = jax.vmap(lambda v, i: v[i])(values, flat_idx)
        return flat.reshape(b, n_out, m, c)
    if values.ndim == 4:
        h, c = values.shape[1], values.shape[-1]
        vt = values.transpose(0, 2, 1, 3).reshape(b, values.shape[2], h * c)
        flat = jax.vmap(lambda v, i: v[i])(vt, flat_idx)
        return (
            flat.reshape(b, n_out, m, h, c).transpose(0, 3, 1, 2, 4)
        )
    raise ValueError(f"values must be rank 3 or 4, got {values.ndim}")


def clusten_qk(query: jax.Array, key: jax.Array, nbhd_idx: jax.Array) -> jax.Array:
    """Attention logits of each token against its gathered neighborhood.

    Args:
        query: ``(b, h, n, c)`` (already scaled by the caller).
        key: ``(b, h, n, c)``.
        nbhd_idx: ``(b, n, m)`` token indices of each token's neighborhood.

    Returns:
        ``(b, h, n, m)`` logits, in ``query``'s dtype (the CUDA wrapper
        unifies dtypes the same way, ``clusten/clusten.py:25-27``).
    """
    key = key.astype(query.dtype)
    key_g = gather_neighbors(key, nbhd_idx)  # b h n m c
    return jnp.einsum(
        "bhic,bhimc->bhim", query, key_g, preferred_element_type=query.dtype
    )


def clusten_av(attn: jax.Array, v: jax.Array, nbhd_idx: jax.Array) -> jax.Array:
    """Weighted aggregation of gathered neighborhood values.

    Args:
        attn: ``(b, h, n, m)`` attention weights.
        v: ``(b, h, n, c)`` values.
        nbhd_idx: ``(b, n, m)``.

    Returns:
        ``(b, h, n, c)`` aggregated features in ``attn``'s dtype.
    """
    v = v.astype(attn.dtype)
    v_g = gather_neighbors(v, nbhd_idx)  # b h n m c
    return jnp.einsum(
        "bhim,bhimc->bhic", attn, v_g, preferred_element_type=attn.dtype
    )


def clusten_wf(weights: jax.Array, feat: jax.Array, nbhd_idx: jax.Array) -> jax.Array:
    """PointConv merge: per-center weighted aggregation with inner channels.

    Args:
        weights: ``(b, n_out, m, ic)`` aggregation weights (ic = inner channels).
        feat: ``(b, n, c)`` token features; note ``n_out != n`` in general
            (fewer merge centers than input tokens).
        nbhd_idx: ``(b, n_out, m)``.

    Returns:
        ``(b, n_out, ic, c)`` merged features in ``weights``'s dtype.
    """
    feat = feat.astype(weights.dtype)
    feat_g = gather_neighbors(feat, nbhd_idx)  # b n_out m c
    return wf_contract(weights, feat_g)
