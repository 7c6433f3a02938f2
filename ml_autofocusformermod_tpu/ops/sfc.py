"""Balanced clustering of 2-D token point clouds along space-filling curves.

TPU-native re-design of the reference's geometry layer
(``/root/reference/models/point_utils.py:61-349``):

* All shapes are static: for ``n`` tokens and cluster size ``m`` there are
  always ``k = ceil(n/m)`` clusters of exactly ``m`` slots (the last cluster
  is padded and masked when ``m`` does not divide ``n``).
* The anchor grid, its space-filling-curve ordering, and the prev/next anchor
  means depend only on ``(h, w, k, sf_type)`` — all Python-level constants —
  so they are precomputed on the host with numpy and baked into the compiled
  program as constants (the reference recomputes them on the GPU every call,
  ``point_utils.py:93-146``).
* The traced, per-token part is a rank-and-argsort: each token is keyed by
  (curve rank of its anchor, dist-to-prev-anchor / dist-to-next-anchor) and
  sorted — one XLA sort, no scatter (``point_utils.py:148-159``).
* Everything is wrapped in ``stop_gradient``: clustering is bookkeeping, not
  a differentiable op (reference runs under ``torch.no_grad``,
  ``point_utils.py:84``).

The module is generic over the array namespace (``numpy`` or ``jax.numpy``)
so the on-grid stage-1 clustering can be fully precomputed on the host
(see :func:`grid_cluster`), mirroring the reference's per-module cache
(``aff_transformer.py:461-468``) the XLA way: as compile-time constants.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "space_filling_cluster",
    "grid_cluster",
    "calculate_peano_order",
    "calculate_hilbert_order",
    "peano_order_values",
    "hilbert_order_values",
    "scanline_order_values",
]


def _argsort(x, axis, xp):
    """Stable argsort for both numpy and jax.numpy."""
    if xp is np:
        return np.argsort(x, axis=axis, kind="stable")
    return jnp.argsort(x, axis=axis, stable=True)


def _inverse_permutation(perm, axis, xp):
    """Inverse of a permutation (argsort of a permutation is its inverse)."""
    return _argsort(perm, axis, xp)


def scanline_order_values(h: int, w: int, xp=np):
    """Boustrophedon (alternating-direction scanline) order value per cell.

    Cell ``(x, y)`` gets rank ``y*w + x`` on even rows and ``y*w + (w-1-x)``
    on odd rows (reference ``point_utils.py:124-129``). Returns an ``(h*w,)``
    integer array in row-major cell order.
    """
    ys, xs = xp.meshgrid(xp.arange(h), xp.arange(w), indexing="ij")
    sign = xp.where(ys % 2 == 1, -1, 1)
    order = sign * xs + ys * w + xp.where(ys % 2 == 1, w - 1, 0)
    return order.reshape(-1)


# ---------------------------------------------------------------------------
# Space-filling curve orders (Peano base-3, Hilbert base-2)
# ---------------------------------------------------------------------------

def peano_order_values(h: int, w: int, pos, xp=jnp):
    """Raw multi-level base-3 Peano curve order value per token.

    Tokens sharing every level cell tie (possible off lattice-of-3 grids);
    :func:`calculate_peano_order` breaks ties by stable argsort.
    """
    b, n, _ = pos.shape
    num_levels = math.ceil(math.log(h, 3))
    assert num_levels >= 1, "h too short"
    first_w = None
    if h != w:
        fw = round(3 * (w / h))
        if fw != 3:
            first_w = fw

    init_dict = xp.asarray([[2, 3, 8], [1, 4, 7], [0, 5, 6]], dtype=xp.float32)
    inverse_dict = xp.asarray(
        [[[1, 1], [1, -1], [1, 1]],
         [[-1, 1], [-1, -1], [-1, 1]],
         [[1, 1], [1, -1], [1, 1]]],
        dtype=xp.float32,
    )  # 3 x 3 x 2
    if first_w is not None:
        init_flip = init_dict[::-1]
        init_f = xp.concatenate([init_dict, init_flip], axis=1)  # 3 x 6
        init_f = xp.tile(init_f, (1, math.ceil(first_w / 6)))[:, :first_w]
        w_index = xp.repeat(xp.arange(math.ceil(first_w / 3)), 3)[:first_w] * 9
        init_f = (init_f + w_index.astype(xp.float32)).reshape(-1)  # 3*fw
        inv_f = xp.tile(inverse_dict[:, :2], (1, math.ceil(first_w / 2), 1))
        inv_f = inv_f[:, :first_w].reshape(-1, 2)  # 3*fw x 2
    init_flat = init_dict.reshape(-1)  # 9
    inv_flat = inverse_dict.reshape(-1, 2)  # 9 x 2

    last_h = float(h)
    rem_pos = pos
    levels = []
    for _ in range(num_levels):
        cur_h = last_h / 3
        levels.append(xp.floor(rem_pos / cur_h))
        rem_pos = rem_pos % cur_h
        last_h = cur_h

    orders = []
    for i in range(num_levels):
        inverse = xp.ones_like(pos)
        for j in range(i):
            clp = levels[i - j - 1]
            if i - j - 1 == 0 and first_w is not None:
                idx = (clp[..., 0] + clp[..., 1] * first_w).astype(xp.int32)
                cur_inverse = inv_f[idx]
            else:
                idx = (clp[..., 0] + clp[..., 1] * 3).astype(xp.int32)
                cur_inverse = inv_flat[idx]
            inverse = cur_inverse * inverse
        lp = levels[i]
        inv_pos = xp.where(inverse > 0, lp, 2 - lp)
        if i == 0 and first_w is not None:
            idx = (inv_pos[..., 0] + inv_pos[..., 1] * first_w).astype(xp.int32)
            orders.append(init_f[idx])
        else:
            idx = (inv_pos[..., 0] + inv_pos[..., 1] * 3).astype(xp.int32)
            orders.append(init_flat[idx])

    final_order = orders[-1]
    for i in range(num_levels - 1):
        final_order = final_order + orders[i] * (9 ** (num_levels - i - 1))
    return final_order


def calculate_peano_order(h: int, w: int, pos, xp=jnp):
    """Multi-level base-3 Peano curve rank of 2-D points on an h x w canvas.

    Port of the reference semantics (``point_utils.py:211-282``) with
    orientation-inversion tables; supports non-square canvases via a widened
    first level. ``pos`` is ``(b, n, 2)`` float (x, y).

    Returns ``(rank, order_index)``: ``rank[b, i]`` is the curve rank of
    token ``i``; ``order_index[b, r]`` is the token index at rank ``r``.
    """
    final_order = peano_order_values(h, w, pos, xp=xp)
    order_index = _argsort(final_order, 1, xp)
    rank = _inverse_permutation(order_index, 1, xp)
    return rank, order_index


def hilbert_order_values(h: int, w: int, pos, xp=jnp):
    """Raw multi-level base-2 Hilbert curve order value per token."""
    b, n, _ = pos.shape
    num_levels = math.ceil(math.log(h, 2))
    assert num_levels >= 1, "h too short"
    first_w = None
    if h != w:
        fw = round(2 * (w / h))
        if fw != 2:
            first_w = fw

    rotate_dict = xp.asarray(
        [[[-1, 1], [0, 0]], [[0, -1], [0, 1]], [[1, 0], [-1, 0]]],
        dtype=xp.float32,
    )  # 3 x 2 x 2: -1 = left turn, 1 = right turn
    if first_w is not None:
        rot_f = xp.tile(rotate_dict[0], (1, math.ceil(first_w / 2)))
        rot_f = rot_f[:, :first_w].reshape(-1)  # 2*fw
    rot_flat = rotate_dict.reshape(3, -1)  # 3 x 4
    rot_res_dict = xp.asarray(
        [[0, 3, 1, 2], [2, 3, 1, 0], [2, 1, 3, 0], [0, 1, 3, 2]],
        dtype=xp.float32,
    )  # 4 x 4

    last_h = float(h)
    rem_pos = pos
    levels = []
    for _ in range(num_levels):
        cur_h = last_h / 2
        levels.append(xp.floor(rem_pos / cur_h))
        rem_pos = rem_pos % cur_h
        last_h = cur_h

    orders = []
    for i in range(num_levels):
        lp = levels[i]
        if i == 0 and first_w is not None:
            lp_idx = (lp[..., 0] + lp[..., 1] * first_w).astype(xp.int32)
        else:
            lp_idx = (lp[..., 0] + lp[..., 1] * 2).astype(xp.int32)
        rotate = xp.zeros_like(pos[..., 0])
        for j in range(i):
            clp = levels[j]
            if j == 0 and first_w is not None:
                idx = (clp[..., 0] + clp[..., 1] * first_w).astype(xp.int32)
                cur_rotate = rot_f[idx]
            else:
                rotate_d = rot_flat[(rotate % 3).astype(xp.int32)]  # b x n x 4
                idx = (clp[..., 0] + clp[..., 1] * 2).astype(xp.int32)
                cur_rotate = xp.take_along_axis(
                    rotate_d, idx[..., None], axis=2
                )[..., 0]
            rotate = cur_rotate + rotate
        rotate = rotate % 4
        rotate_res = rot_res_dict[rotate.astype(xp.int32)]  # b x n x 4
        rotate_res = xp.take_along_axis(rotate_res, lp_idx[..., None], axis=2)
        orders.append(rotate_res[..., 0])

    final_order = orders[-1]
    for i in range(num_levels - 1):
        final_order = final_order + orders[i] * (4 ** (num_levels - i - 1))
    return final_order


def calculate_hilbert_order(h: int, w: int, pos, xp=jnp):
    """Multi-level base-2 Hilbert curve rank with rotation-state tables.

    Port of the reference semantics (``point_utils.py:285-349``); same return
    convention as :func:`calculate_peano_order`.
    """
    final_order = hilbert_order_values(h, w, pos, xp=xp)
    order_index = _argsort(final_order, 1, xp)
    rank = _inverse_permutation(order_index, 1, xp)
    return rank, order_index


# ---------------------------------------------------------------------------
# Host-precomputed anchor tables
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _anchor_tables(h: int, w: int, k: int, sf_type: str):
    """Anchor grid + curve ordering for ``(h, w, k)`` — pure host constants.

    Mirrors reference ``point_utils.py:93-146`` but runs once in numpy.
    Returns ``(num_patch_w, patch_len_hw(2,), anchor_rank(nump,),
    prev_means(nump, 2), next_means(nump, 2))`` where ``anchor_rank[cell]``
    is the curve rank of row-major grid cell ``cell``.
    """
    patch_len = (h * w / k) ** 0.5
    num_patch_h = int(round(h / patch_len))
    num_patch_w = int(round(w / patch_len))
    patch_len_h, patch_len_w = h / num_patch_h, w / num_patch_w
    if sf_type == "peano":
        num_patch_h = max(3, int(3 ** round(math.log(num_patch_h, 3))))
        patch_len_h = h / num_patch_h
        num_patch_w = int(round(w / h * 3) * (num_patch_h / 3))
        patch_len_w = w / num_patch_w
    elif sf_type == "hilbert":
        num_patch_h = max(2, int(2 ** round(math.log(num_patch_h, 2))))
        patch_len_h = h / num_patch_h
        num_patch_w = int(round(w / h * 2) * (num_patch_h / 2))
        patch_len_w = w / num_patch_w

    ys, xs = np.meshgrid(
        np.arange(num_patch_h), np.arange(num_patch_w), indexing="ij"
    )
    grid_pos = np.stack([xs, ys], axis=2).reshape(-1, 2).astype(np.float32)

    if sf_type == "peano":
        anchor_rank, order_idx = calculate_peano_order(
            num_patch_h, num_patch_w, grid_pos[None], xp=np
        )
        anchor_rank, order_idx = anchor_rank[0], order_idx[0]
    elif sf_type == "hilbert":
        anchor_rank, order_idx = calculate_hilbert_order(
            num_patch_h, num_patch_w, grid_pos[None], xp=np
        )
        anchor_rank, order_idx = anchor_rank[0], order_idx[0]
    else:
        # NOTE: the reference intentionally uses the *token* canvas width `w`
        # (not num_patch_w) in the scanline order value (point_utils.py:127);
        # only the relative order matters and it is identical.
        ys_f = ys.astype(np.int64)
        xs_f = xs.astype(np.int64)
        sign = np.where(ys_f % 2 == 1, -1, 1)
        order_mask = sign * xs_f + ys_f * w + np.where(ys_f % 2 == 1, w - 1, 0)
        order_mask = order_mask.reshape(-1)
        order_idx = np.argsort(order_mask, kind="stable")
        anchor_rank = np.argsort(order_idx, kind="stable")

    ordered_grid = grid_pos[order_idx]  # anchors in curve order
    patch_len_hw = np.array([patch_len_w, patch_len_h], dtype=np.float32)
    init_means = ordered_grid * patch_len_hw + patch_len_hw / 2 - 0.5
    nump = init_means.shape[0]

    prev_means = np.zeros_like(init_means)
    prev_means[1:] = init_means[: nump - 1]
    next_means = np.zeros_like(init_means)
    next_means[: nump - 1] = init_means[1:]
    if nump >= 2:
        # linear extrapolation at the curve ends (point_utils.py:143,146)
        prev_means[0] = init_means[0] - (init_means[1] - init_means[0])
        next_means[-1] = init_means[-1] + (init_means[-1] - init_means[-2])
    else:
        # single anchor: the reference indexes out of bounds here
        # (point_utils.py:143); degrade to unit offsets so tiny canvases work
        prev_means[0] = init_means[0] - 1.0
        next_means[-1] = init_means[-1] + 1.0

    return (
        num_patch_w,
        patch_len_hw,
        anchor_rank.astype(np.int32),
        prev_means,
        next_means,
    )


# ---------------------------------------------------------------------------
# Balanced clustering
# ---------------------------------------------------------------------------

def _cluster_impl(pos, m, h, w, no_reorder, sf_type, use_anchor, xp):
    pos = pos.astype(xp.float32)
    b, n, d = pos.shape
    k = int(math.ceil(n / m))

    if use_anchor:
        num_patch_w, patch_len_hw, anchor_rank, prev_means, next_means = (
            _anchor_tables(h, w, k, sf_type)
        )
        patch_len_hw = xp.asarray(patch_len_hw)
        anchor_rank = xp.asarray(anchor_rank)
        prev_means = xp.asarray(prev_means)
        next_means = xp.asarray(next_means)

        cell = xp.floor(pos / patch_len_hw)
        cell_idx = (cell[..., 0] + cell[..., 1] * num_patch_w).astype(xp.int32)
        assign = anchor_rank[cell_idx]  # b x n, curve rank of token's anchor
        prev_m = prev_means[assign]  # b x n x 2
        next_m = next_means[assign]
        dist_prev = ((pos - prev_m) ** 2).sum(-1)
        dist_next = ((pos - next_m) ** 2).sum(-1)
        dist_ratio = dist_prev / (dist_next + 1e-5)

        key = assign.astype(xp.float32) * (dist_ratio.max() + 1) + dist_ratio
        pos_ranking = _argsort(key, 1, xp)  # b x n
    else:
        if sf_type == "peano":
            _, pos_ranking = calculate_peano_order(h, w, pos, xp=xp)
        elif sf_type == "hilbert":
            _, pos_ranking = calculate_hilbert_order(h, w, pos, xp=xp)
        else:
            order_values = scanline_order_values(h, w, xp=xp)
            pos_idx = (pos[..., 0] + pos[..., 1] * w).astype(xp.int32)
            order = order_values[pos_idx]  # b x n
            pos_ranking = _argsort(order, 1, xp)

    pos_sorted = xp.take_along_axis(pos, pos_ranking[..., None], axis=1)

    if k * m == n:
        cluster_mask = None
        cluster_mean_pos = pos_sorted.reshape(b, k, m, d).mean(2)
    else:
        pad = k * m - n
        pos_pad = xp.concatenate(
            [pos_sorted, xp.zeros((b, pad, d), dtype=pos_sorted.dtype)], axis=1
        )
        mask_flat = xp.concatenate(
            [xp.ones((b, n), dtype=xp.int32), xp.zeros((b, pad), dtype=xp.int32)],
            axis=1,
        )
        cluster_mask = mask_flat.reshape(b, k, m)
        cluster_mean_pos = pos_pad.reshape(b, k, m, d).sum(2) / cluster_mask.sum(
            2, keepdims=True
        ).astype(pos_sorted.dtype)

    if no_reorder:
        if k * m == n:
            member_idx = pos_ranking.reshape(b, k, m)
        else:
            member_idx = xp.concatenate(
                [pos_ranking, xp.zeros((b, k * m - n), dtype=pos_ranking.dtype)],
                axis=1,
            ).reshape(b, k, m)
        return cluster_mean_pos, member_idx, cluster_mask

    member_idx = xp.arange(k * m)
    member_idx = xp.where(member_idx < n, member_idx, 0)
    member_idx = xp.broadcast_to(member_idx[None], (b, k * m)).reshape(b, k, m)
    return pos_sorted, cluster_mean_pos, member_idx, cluster_mask, pos_ranking[..., None]


def space_filling_cluster(
    pos: jax.Array,
    m: int,
    h: int,
    w: int,
    no_reorder: bool = False,
    sf_type: str = "",
    use_anchor: bool = True,
):
    """Balanced clustering along a space-filling curve (traced, static shapes).

    Same contract as reference ``point_utils.py:61-208``: ``n`` tokens are
    split into ``k = ceil(n/m)`` contiguous-in-curve-order clusters of exactly
    ``m`` slots. When ``m`` does not divide ``n`` the trailing slots of the
    last cluster are padding, flagged by ``cluster_mask`` (1 = valid).

    Args:
        pos: ``(b, n, 2)`` token positions (x, y) in ``[0, w) x [0, h)``.
        m: cluster size.
        h, w: canvas height/width.
        no_reorder: if True return cluster membership in the original token
            order; otherwise reorder tokens so clusters are contiguous.
        sf_type: '' (boustrophedon scanlines), 'peano', or 'hilbert'.
        use_anchor: rank tokens via a curve-ordered anchor grid (default)
            instead of computing the curve directly on token positions.

    Returns (reorder mode):
        ``(pos_sorted (b,n,2), cluster_mean_pos (b,k,2), member_idx (b,k,m),
        cluster_mask (b,k,m) or None, pos_ranking (b,n,1))``
    Returns (``no_reorder=True``):
        ``(cluster_mean_pos, member_idx, cluster_mask)``
    """
    pos = jax.lax.stop_gradient(pos)
    return _cluster_impl(pos, m, h, w, no_reorder, sf_type, use_anchor, jnp)


@functools.lru_cache(maxsize=None)
def _grid_cluster_np(
    h: int, w: int, m: int, sf_type: str, use_anchor: bool
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Optional[np.ndarray], np.ndarray]:
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pos = np.stack([xs, ys], axis=2).reshape(1, -1, 2).astype(np.float32)
    out = _cluster_impl(pos, m, h, w, False, sf_type, use_anchor, np)
    pos_sorted, mean_pos, member_idx, mask, ranking = out
    return (
        pos_sorted[0],
        mean_pos[0],
        member_idx[0],
        None if mask is None else mask[0],
        ranking[0, :, 0],
    )


@functools.lru_cache(maxsize=None)
def grid_nearest_clusters(h: int, w: int, m: int, nnc: int,
                          sf_type: str = "", use_anchor: bool = True):
    """``nnc`` nearest cluster ids per grid token — pure host constants.

    The first stage's tokens sit on the regular grid, so the token-to-
    cluster kNN (reference ``aff_transformer.py:476``) is a compile-time
    constant too. Tie-breaking matches the traced path: ascending distance,
    lowest index first; distances via the exact |q|^2+|d|^2-2qd expansion.
    """
    pos, mean_pos, _, _, _ = _grid_cluster_np(h, w, m, sf_type, use_anchor)
    q = pos.astype(np.float32)
    d = mean_pos.astype(np.float32)
    d2 = (
        (q**2).sum(-1)[:, None]
        + (d**2).sum(-1)[None, :]
        - 2.0 * (q @ d.T)
    ).astype(np.float32)
    order = np.argsort(d2, axis=1, kind="stable")[:, :nnc]
    return order.astype(np.int32)


def grid_cluster(h: int, w: int, m: int, sf_type: str = "", use_anchor: bool = True):
    """Clustering of the full regular ``h x w`` grid, precomputed on host.

    The first feature map's tokens sit on a regular grid, so its clustering
    is a pure function of ``(h, w, m)``; the reference caches it as module
    state (``aff_transformer.py:461-468``) — here it is a host-side numpy
    computation whose results enter the jitted program as constants.

    Returns per-image arrays (no batch dim): ``(pos_sorted (n,2),
    cluster_mean_pos (k,2), member_idx (k,m), cluster_mask (k,m) or None,
    reorder (n,))`` where ``reorder[r]`` is the original index of the token
    at curve rank ``r``.
    """
    return _grid_cluster_np(h, w, m, sf_type, use_anchor)
