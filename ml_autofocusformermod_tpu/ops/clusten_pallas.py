"""Fused neighborhood attention as a Pallas TPU kernel.

Fuses what the reference runs as two CUDA kernels plus torch glue
(CLUSTEN-QK -> +rel-pos bias -> mask -> blank-token softmax -> CLUSTEN-AV,
``aff_transformer.py:120-155``) into ONE kernel per (batch, head,
query-tile).

TPU-first design — dense-within-tile with cluster masking, not gathers:
each query's neighborhood is a union of whole clusters, so instead of
gathering K/V rows (irregular memory movement the MXU hates), the kernel
computes the *dense* q @ K^T over all tokens of the (batch, head) — K/V
live in VMEM — and masks logits down to each token's ``nnc`` nearest
clusters. Dense QK costs ``n * c_`` MACs per query on the MXU versus
``nnc * n * c_`` for a one-hot gather formulation — the "wasteful" dense
matmul is the cheapest formulation on this hardware. The relative-position
bias is evaluated in-kernel from coordinates (5 fused VPU planes), so no
``(b, h, n, m)`` bias tensor ever reaches HBM.

Numerics vs the reference: identical except that padded cluster slots are
excluded from the softmax instead of contributing ``exp(l0 - 100) ~ 1e-40``
— invisible at fp32 (verified by the parity suite).

The backward pass (custom_vjp) runs the one-hot-matmul algebra at the XLA
level: the scatter-adds the reference hand-writes with ``fastAtomicAdd``
(``clustenqk_cuda_kernel.cu:125``) become transposed one-hot matmuls —
deterministic by construction.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cluster_gather import gather_clusters_onehot

__all__ = ["fused_cluster_attention"]

NEG_INF = -1e30

# escape hatch so CPU tests can exercise the kernel via the interpreter
_INTERPRET = os.environ.get("MLAFF_PALLAS_INTERPRET", "0") == "1"
# fused Pallas backward (flash-style recompute); set =0 to fall back to the
# XLA one-hot-matmul backward (reference algebra, kept as the oracle)
_PALLAS_BWD = os.environ.get("MLAFF_PALLAS_BWD", "1") == "1"


def _choose_tiling(n: int, np_: int, cs: int, static_ncc) -> Tuple[int, Optional[tuple]]:
    """(tq, window) for the kernel grid.

    Windowed path (host-constant neighborhoods): the kernel's cost is VPU
    work over the masked (tq, W) planes plus re-streaming the K/V window
    per instance, and W shrinks as tiles get smaller (each tile spans a
    narrower cluster band) — so pick tq minimizing ``nt * W * (tq + kappa)``
    where kappa ≈ 16 rows models the HBM re-stream per instance (measured
    on v5e: tq=112/W=896 beats the VMEM-max tq=448/W=1280 by ~25%).
    Non-windowed path: largest VMEM-fitting tile (dense K/V is shared per
    instance, so bigger tiles amortize it best).
    """
    if static_ncc is not None and not _INTERPRET:
        kappa = 16
        best = None
        t = 8
        while t <= min(n, 512):
            if n % t == 0:
                win = _static_window(static_ncc.arr, n, t, cs, np_)
                if win is not None:
                    cost = (n // t) * win[0] * (t + kappa)
                    if best is None or cost < best[0]:
                        best = (cost, t, win)
            t += 8
        if best is not None:
            return best[1], best[2]
    return _pick_tile(n, np_), None


def _pick_tile(n: int, np_: int) -> int:
    """Largest divisor tile whose fp32 working planes fit the VMEM budget.

    The kernel keeps ~8 (tq, np) fp32 planes live (logits, dx/dy, dist,
    mask, probs, temporaries); budget them against the raised 96MB scoped
    limit with headroom for K/V and pipeline buffers.
    """
    budget = 60 * 1024 * 1024
    best = None
    for t in range(min(n, 512), 0, -1):
        if n % t != 0:
            continue
        if t % 8 != 0 and t != n:
            continue  # sublane constraint: divisible by 8 or the full dim
        if t * np_ * 4 * 8 <= budget:
            return t
        best = best or t
    return best if best is not None else n


def _fwd_kernel(*refs, cs: int, n_valid: int, rel_width: int,
                clamp_hi: Optional[int], hiprec: bool, windowed: bool):
    if windowed:
        # scalar-prefetch ref with per-tile element window starts comes first
        (off_ref, q_ref, k_ref, v_ref, posq_ref, posk_ref, ncc_ref, wpe_ref,
         bpe_ref, blank_ref, out_ref, blankp_ref) = refs
        col0 = off_ref[pl.program_id(1)] * 128
    else:
        (q_ref, k_ref, v_ref, posq_ref, posk_ref, ncc_ref, wpe_ref,
         bpe_ref, blank_ref, out_ref, blankp_ref) = refs
        col0 = 0
    gb = q_ref.shape[0]  # images per kernel instance (small-n amortization)
    nh = q_ref.shape[1]
    tq = q_ref.shape[2]
    np_ = k_ref.shape[2]
    nnc = ncc_ref.shape[2]
    prec = jax.lax.Precision.HIGHEST if hiprec else None
    geom = jnp.float32

    for bi in range(gb):
        # --- geometry, shared across heads (the VPU-bound part) ---
        # K positions arrive transposed (2, np) so x/y are LANE vectors —
        # broadcasting a sublane-extracted column across lanes forces a
        # catastrophic relayout (189MB of register spills at trivial sizes).
        # geometry stays fp32: bf16 compares are unsupported on v5e and
        # bf16 rsqrt/fma chains crash the LLO scheduler (tried; SIGABRT)
        pxq = posq_ref[bi, :, 0:1].astype(jnp.float32)  # (tq, 1) sublane vec
        pyq = posq_ref[bi, :, 1:2].astype(jnp.float32)
        pxk = posk_ref[bi, 0, :].astype(jnp.float32)  # (np,) lane vector
        pyk = posk_ref[bi, 1, :].astype(jnp.float32)
        dx = (pxk[None, :] - pxq).astype(geom)  # (tq, np)
        dy = (pyk[None, :] - pyq).astype(geom)
        if clamp_hi is not None:
            # MixRes clamps table-frame coords to [0, tw-1] (mixres:527)
            # (python scalars are weakly typed: dx/dy dtype is preserved)
            R = rel_width
            dx = jnp.clip(dx + R, 0, clamp_hi) - R
            dy = jnp.clip(dy + R, 0, clamp_hi) - R
        d2 = dx * dx + dy * dy
        # dist = d2 * rsqrt(d2); sin = dy * rsqrt; cos = dx * rsqrt (0 at 0)
        one = jnp.ones((), geom)
        zero = jnp.zeros((), geom)
        inv = jnp.where(
            d2 > 0, jax.lax.rsqrt(jnp.where(d2 > 0, d2, one)), zero
        )

        # neighborhood mask: column j belongs iff cluster(j) in ncc[t]
        col_idx = jax.lax.broadcasted_iota(jnp.int32, (tq, np_), 1) + col0
        col_cluster = col_idx // cs
        member = jnp.zeros((tq, np_), jnp.bool_)
        for j in range(nnc):
            member = member | (col_cluster == ncc_ref[bi, :, j][:, None])
        member = member & (col_idx < n_valid)

        # --- per-head attention (MXU) over the shared geometry ---
        for hi in range(nh):
            q = q_ref[bi, hi]  # (tq, c_)
            k = k_ref[bi, hi]
            v = v_ref[bi, hi]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (tq, np)
            w0 = wpe_ref[0, hi].astype(geom)
            w1 = wpe_ref[1, hi].astype(geom)
            w2 = wpe_ref[2, hi].astype(geom)
            w3 = wpe_ref[3, hi].astype(geom)
            w4 = wpe_ref[4, hi].astype(geom)
            bias = w0 * dx + w1 * dy + (w2 * d2 + w3 * dy + w4 * dx) * inv
            logits = jnp.where(
                member, logits + bias.astype(jnp.float32) + bpe_ref[hi],
                NEG_INF,
            )

            blank = blank_ref[bi, hi].astype(jnp.float32)  # (tq, 1)
            mx = jnp.maximum(logits.max(axis=-1, keepdims=True), blank)
            p = jnp.exp(logits - mx)
            p = jnp.where(member, p, 0.0)
            pb = jnp.exp(blank - mx)
            denom = p.sum(axis=-1, keepdims=True) + pb
            pb = pb / denom
            p = (p / denom).astype(v.dtype)

            out = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            out_ref[bi, hi] = out.astype(out_ref.dtype)
            blankp_ref[bi, hi] = pb.astype(blankp_ref.dtype)


def _static_window(static_ncc, n, tq, cs, np_):
    """Per-tile K/V window (host, numpy) for compile-time-constant
    neighborhoods (the on-grid stage): each query tile only touches a
    contiguous band of clusters thanks to space-filling-curve locality.

    Returns ``(W, offs)`` — window width in rows and per-tile *element*
    window starts (``pl.Element`` indexing; sublane-aligned, clamped in
    bounds) — or ``None`` if windowing does not pay (window would cover
    most of the token axis anyway).
    """
    import numpy as np

    nt = n // tq
    ncc_t = np.asarray(static_ncc).reshape(nt, tq, -1)
    rmin = ncc_t.min(axis=(1, 2)) * cs
    rmax = (ncc_t.max(axis=(1, 2)) + 1) * cs
    # starts are quantized to 128 so Mosaic can prove the element starts
    # respect both the sublane (K/V row dim) and lane (transposed K-pos)
    # tilings; the index maps multiply back by 128. K/V are padded to
    # np128 rows so the clamped windows still contain every tile's band.
    np128 = -(-np_ // 128) * 128
    rmin = rmin // 128 * 128
    W = int((rmax - rmin).max())
    W = -(-W // 128) * 128
    if W * 2 > np128:
        return None
    offs = np.minimum(rmin, np128 - W) // 128
    return W, np128, offs.astype(np.int32)


class _StaticNcc:
    """Hashable wrapper so host-constant neighborhoods can ride through
    ``custom_vjp`` nondiff_argnums (which are closed over and must hash)."""

    __slots__ = ("arr", "_key")

    def __init__(self, arr):
        import numpy as np

        self.arr = np.asarray(arr, dtype=np.int32)
        self._key = (self.arr.shape, self.arr.tobytes())

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _StaticNcc) and self._key == other._key


def _attention_fwd_impl(q, k, v, ncc, pos, pe_kernel, pe_bias, blank_logit,
                        cs, rel_width, clamp_width, static_ncc=None):
    b, h, n, c_ = q.shape
    nnc = ncc.shape[-1]
    kk = -(-n // cs)
    np_ = kk * cs
    pos_q = pos  # query positions stay unpadded (match q/ncc row count)
    tq, window = _choose_tiling(n, np_, cs, static_ncc)
    grid = (b, n // tq)
    clamp_hi = clamp_width - 1 if clamp_width else None
    hiprec = q.dtype == jnp.float32

    if window is not None:
        np_ = window[1]  # K/V padded so clamped windows stay in bounds

    # Batch gb images per kernel instance: tiny per-image instances are
    # DMA-latency/invocation-overhead bound (measured: halving the masked
    # area alone moves stage-1 time by ~1%), so amortize across images —
    # the window offsets depend only on the tile, never the image.
    gb = 1
    if window is not None:
        kv_bytes = 2 * h * window[0] * c_ * 4
        while (
            gb < 8
            and gb * 2 <= b
            and b % (gb * 2) == 0
            and (gb * 2) * kv_bytes <= 8 * 1024 * 1024
        ):
            gb *= 2
    elif tq == n:
        while (
            gb < 8  # unrolled gb*h body: keep compile size bounded
            and gb * 2 <= b
            and b % (gb * 2) == 0
            and (gb * 2) * n <= 8192
        ):
            gb *= 2

    if np_ != n:
        pad = np_ - n
        zeros = jnp.zeros((b, h, pad, c_), k.dtype)
        k = jnp.concatenate([k, zeros], axis=2)
        v = jnp.concatenate([v, zeros], axis=2)
        pos = jnp.concatenate(
            [pos, jnp.zeros((b, pad, 2), pos.dtype)], axis=1
        )

    kernel = functools.partial(
        _fwd_kernel, cs=cs, n_valid=n, rel_width=rel_width,
        clamp_hi=clamp_hi, hiprec=hiprec, windowed=window is not None,
    )
    out_shape = [
        jax.ShapeDtypeStruct((b, h, n, c_), q.dtype),
        jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, h, tq, c_), lambda bi, ti, *_: (bi, 0, ti, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h, tq, 1), lambda bi, ti, *_: (bi, 0, ti, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = (
        q, k, v, pos_q, pos.transpose(0, 2, 1), ncc,
        pe_kernel.astype(jnp.float32), pe_bias.astype(jnp.float32),
        blank_logit,
    )
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024
    )

    if window is not None:
        W, _, offs_np = window
        # K/V (and K-positions) ride element-indexed windows: each query
        # tile streams only its cluster band (pl.Element allows unaligned
        # dynamic starts; Blocked indexing would force aligned W-blocks,
        # which doubles W until it covers the whole token axis)
        el = pl.Element
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // gb, n // tq),
            in_specs=[
                pl.BlockSpec((gb, h, tq, c_),
                             lambda bi, ti, offs: (bi, 0, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((el(gb), el(h), el(W), el(c_)),
                             lambda bi, ti, offs:
                             (bi * gb, 0, offs[ti] * 128, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((el(gb), el(h), el(W), el(c_)),
                             lambda bi, ti, offs:
                             (bi * gb, 0, offs[ti] * 128, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, tq, 2),
                             lambda bi, ti, offs: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((el(gb), el(2), el(W)),
                             lambda bi, ti, offs:
                             (bi * gb, 0, offs[ti] * 128),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, tq, nnc),
                             lambda bi, ti, offs: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((gb, h, tq, 1),
                             lambda bi, ti, offs: (bi, 0, ti, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((gb, h, tq, c_),
                             lambda bi, ti, offs: (bi, 0, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, h, tq, 1),
                             lambda bi, ti, offs: (bi, 0, ti, 0),
                             memory_space=pltpu.VMEM),
            ],
        )
        out, blank_p = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            interpret=_INTERPRET,
            compiler_params=compiler_params,
            out_shape=out_shape,
        )(jnp.asarray(offs_np), *operands)
        return out, blank_p

    out, blank_p = pl.pallas_call(
        kernel,
        grid=(b // gb, n // tq),
        interpret=_INTERPRET,
        compiler_params=compiler_params,
        in_specs=[
            pl.BlockSpec((gb, h, tq, c_), lambda bi, ti: (bi, 0, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, h, np_, c_), lambda bi, ti: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, h, np_, c_), lambda bi, ti: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, tq, 2), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, 2, np_), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, tq, nnc), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (5, h) pos_embed weights
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (h,) pos_embed bias
            pl.BlockSpec((gb, h, tq, 1), lambda bi, ti: (bi, 0, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((gb, h, tq, c_), lambda bi, ti: (bi, 0, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, h, tq, 1), lambda bi, ti: (bi, 0, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
    )(*operands)
    return out, blank_p


def _bwd_kernel(*refs, cs: int, n_valid: int, rel_width: int,
                clamp_hi: Optional[int], hiprec: bool, windowed: bool):
    """Fused backward: recomputes the forward softmax per query tile (flash
    style — nothing but the inputs is saved), then produces dq/dblank per
    tile, accumulates dk/dv into a per-batch VMEM block across query tiles
    (the reference's ``fastAtomicAdd`` scatters become in-VMEM accumulation
    over a sequential grid — deterministic by construction), and emits
    per-tile pos-embed-grad partials packed into an (8, 128) tile
    (rows 0-4 = d_pe_kernel features, row 5 = d_pe_bias; lanes = heads)
    for a final XLA-level sum."""
    if windowed:
        (off_ref, q_ref, k_ref, v_ref, posq_ref, posk_ref, ncc_ref, wpe_ref,
         bpe_ref, blank_ref, gout_ref, gblank_ref,
         dq_ref, dblank_ref, dk_ref, dv_ref, dpe_ref) = refs
        col0 = off_ref[pl.program_id(1)] * 128
    else:
        (q_ref, k_ref, v_ref, posq_ref, posk_ref, ncc_ref, wpe_ref,
         bpe_ref, blank_ref, gout_ref, gblank_ref,
         dq_ref, dblank_ref, dk_ref, dv_ref, dpe_ref) = refs
        col0 = 0
    gb = q_ref.shape[0]
    nh = q_ref.shape[1]
    tq = q_ref.shape[2]
    W = k_ref.shape[2]
    nnc = ncc_ref.shape[2]
    ti = pl.program_id(1)
    prec = jax.lax.Precision.HIGHEST if hiprec else None

    @pl.when(ti == 0)
    def _init_kv():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    row_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    dpe_tile = jnp.zeros((8, 128), jnp.float32)

    for bi in range(gb):
        pxq = posq_ref[bi, :, 0:1].astype(jnp.float32)
        pyq = posq_ref[bi, :, 1:2].astype(jnp.float32)
        pxk = posk_ref[bi, 0, :].astype(jnp.float32)
        pyk = posk_ref[bi, 1, :].astype(jnp.float32)
        dx = pxk[None, :] - pxq
        dy = pyk[None, :] - pyq
        if clamp_hi is not None:
            R = rel_width
            dx = jnp.clip(dx + R, 0, clamp_hi) - R
            dy = jnp.clip(dy + R, 0, clamp_hi) - R
        d2 = dx * dx + dy * dy
        inv = jnp.where(
            d2 > 0, jax.lax.rsqrt(jnp.where(d2 > 0, d2, 1.0)), 0.0
        )
        dist = d2 * inv
        sinp = dy * inv
        cosp = dx * inv

        col_idx = jax.lax.broadcasted_iota(jnp.int32, (tq, W), 1) + col0
        col_cluster = col_idx // cs
        member = jnp.zeros((tq, W), jnp.bool_)
        for j in range(nnc):
            member = member | (col_cluster == ncc_ref[bi, :, j][:, None])
        member = member & (col_idx < n_valid)

        for hi in range(nh):
            q = q_ref[bi, hi]
            k = k_ref[bi, hi]
            v = v_ref[bi, hi]
            md = k.dtype
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            bias = (
                wpe_ref[0, hi] * dx + wpe_ref[1, hi] * dy
                + (wpe_ref[2, hi] * d2 + wpe_ref[3, hi] * dy
                   + wpe_ref[4, hi] * dx) * inv
            )
            logits = jnp.where(member, logits + bias + bpe_ref[hi], NEG_INF)
            blank = blank_ref[bi, hi].astype(jnp.float32)  # (tq, 1)
            mx = jnp.maximum(logits.max(axis=-1, keepdims=True), blank)
            p = jnp.exp(logits - mx)
            p = jnp.where(member, p, 0.0)
            pb = jnp.exp(blank - mx)
            pinv = 1.0 / (p.sum(axis=-1, keepdims=True) + pb)
            p = p * pinv
            pb = pb * pinv

            go = gout_ref[bi, hi]  # (tq, c_)
            gpb = gblank_ref[bi, hi].astype(jnp.float32)  # (tq, 1)
            dp = jax.lax.dot_general(
                go, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (tq, W)
            s = (dp * p).sum(axis=-1, keepdims=True) + gpb * pb
            dl = p * (dp - s)  # (tq, W) fp32; zero at non-member slots
            dblank_ref[bi, hi] = (pb * (gpb - s)).astype(dblank_ref.dtype)

            dlm = dl.astype(md)
            dq = jax.lax.dot_general(
                dlm, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            dq_ref[bi, hi] = dq.astype(dq_ref.dtype)

            dkw = jax.lax.dot_general(
                dlm, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (W, c_)
            dvw = jax.lax.dot_general(
                p.astype(md), go, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (W, c_)
            if windowed:
                dk_ref[bi, hi, pl.ds(col0, W)] = (
                    dk_ref[bi, hi, pl.ds(col0, W)] + dkw
                )
                dv_ref[bi, hi, pl.ds(col0, W)] = (
                    dv_ref[bi, hi, pl.ds(col0, W)] + dvw
                )
            else:
                dk_ref[bi, hi] = dk_ref[bi, hi] + dkw
                dv_ref[bi, hi] = dv_ref[bi, hi] + dvw

            for f, plane in enumerate((dx, dy, dist, sinp, cosp)):
                val = (dl * plane).sum()
                dpe_tile = dpe_tile + jnp.where(
                    (row_i == f) & (lane_i == hi), val, 0.0
                )
            dpe_tile = dpe_tile + jnp.where(
                (row_i == 5) & (lane_i == hi), dl.sum(), 0.0
            )
    dpe_ref[0, 0] = dpe_tile


def _attention_bwd_impl(q, k, v, ncc, pos, pe_kernel, pe_bias, blank_logit,
                        g_out, g_blankp, cs, rel_width, clamp_width,
                        static_ncc):
    """Pallas backward; static decisions (tile, window, gb) mirror the
    forward exactly so window offsets line up."""
    b, h, n, c_ = q.shape
    nnc = ncc.shape[-1]
    kk = -(-n // cs)
    np_ = kk * cs
    pos_q = pos
    tq, window = _choose_tiling(n, np_, cs, static_ncc)
    clamp_hi = clamp_width - 1 if clamp_width else None
    hiprec = q.dtype == jnp.float32

    if window is not None:
        np_ = window[1]

    gb = 1
    if window is not None:
        # dk/dv accumulate in fp32 VMEM blocks of np_ rows per image
        kv_bytes = 2 * h * (window[0] + np_) * c_ * 4
        while (
            gb < 8
            and gb * 2 <= b
            and b % (gb * 2) == 0
            and (gb * 2) * kv_bytes <= 24 * 1024 * 1024
        ):
            gb *= 2
    elif tq == n:
        while (
            gb < 8
            and gb * 2 <= b
            and b % (gb * 2) == 0
            and (gb * 2) * n <= 8192
        ):
            gb *= 2

    if np_ != n:
        pad = np_ - n
        zeros = jnp.zeros((b, h, pad, c_), k.dtype)
        k = jnp.concatenate([k, zeros], axis=2)
        v = jnp.concatenate([v, zeros], axis=2)
        pos = jnp.concatenate(
            [pos, jnp.zeros((b, pad, 2), pos.dtype)], axis=1
        )

    nt = n // tq
    kernel = functools.partial(
        _bwd_kernel, cs=cs, n_valid=n, rel_width=rel_width,
        clamp_hi=clamp_hi, hiprec=hiprec, windowed=window is not None,
    )
    out_shape = [
        jax.ShapeDtypeStruct((b, h, n, c_), q.dtype),        # dq
        jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32),     # dblank
        jax.ShapeDtypeStruct((b, h, np_, c_), jnp.float32),  # dk (padded)
        jax.ShapeDtypeStruct((b, h, np_, c_), jnp.float32),  # dv (padded)
        jax.ShapeDtypeStruct((b // gb, nt, 8, 128), jnp.float32),  # pe parts
    ]
    operands = (
        q, k, v, pos_q, pos.transpose(0, 2, 1), ncc,
        pe_kernel.astype(jnp.float32), pe_bias.astype(jnp.float32),
        blank_logit, g_out, g_blankp,
    )
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024
    )

    if window is not None:
        W, _, offs_np = window
        el = pl.Element
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // gb, nt),
            in_specs=[
                pl.BlockSpec((gb, h, tq, c_),
                             lambda bi, ti, offs: (bi, 0, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((el(gb), el(h), el(W), el(c_)),
                             lambda bi, ti, offs:
                             (bi * gb, 0, offs[ti] * 128, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((el(gb), el(h), el(W), el(c_)),
                             lambda bi, ti, offs:
                             (bi * gb, 0, offs[ti] * 128, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, tq, 2),
                             lambda bi, ti, offs: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((el(gb), el(2), el(W)),
                             lambda bi, ti, offs:
                             (bi * gb, 0, offs[ti] * 128),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, tq, nnc),
                             lambda bi, ti, offs: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((gb, h, tq, 1),
                             lambda bi, ti, offs: (bi, 0, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, h, tq, c_),
                             lambda bi, ti, offs: (bi, 0, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, h, tq, 1),
                             lambda bi, ti, offs: (bi, 0, ti, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((gb, h, tq, c_),
                             lambda bi, ti, offs: (bi, 0, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, h, tq, 1),
                             lambda bi, ti, offs: (bi, 0, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, h, np_, c_),
                             lambda bi, ti, offs: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, h, np_, c_),
                             lambda bi, ti, offs: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8, 128),
                             lambda bi, ti, offs: (bi, ti, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        )
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            interpret=_INTERPRET,
            compiler_params=compiler_params,
            out_shape=out_shape,
        )(jnp.asarray(offs_np), *operands)
    else:
        outs = pl.pallas_call(
            kernel,
            grid=(b // gb, nt),
            interpret=_INTERPRET,
            compiler_params=compiler_params,
            in_specs=[
                pl.BlockSpec((gb, h, tq, c_), lambda bi, ti: (bi, 0, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, h, np_, c_), lambda bi, ti: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, h, np_, c_), lambda bi, ti: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, tq, 2), lambda bi, ti: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, 2, np_), lambda bi, ti: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, tq, nnc), lambda bi, ti: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((gb, h, tq, 1), lambda bi, ti: (bi, 0, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, h, tq, c_), lambda bi, ti: (bi, 0, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, h, tq, 1), lambda bi, ti: (bi, 0, ti, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((gb, h, tq, c_), lambda bi, ti: (bi, 0, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, h, tq, 1), lambda bi, ti: (bi, 0, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, h, np_, c_), lambda bi, ti: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, h, np_, c_), lambda bi, ti: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8, 128), lambda bi, ti: (bi, ti, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=out_shape,
        )(*operands)

    dq, dblank, dk, dv, dpe = outs
    dpe_sum = dpe.sum(axis=(0, 1))  # (8, 128)
    d_pe_kernel = dpe_sum[:5, :h]
    d_pe_bias = dpe_sum[5, :h]
    return (
        dq,
        dk[:, :, :n].astype(k.dtype),
        dv[:, :, :n].astype(v.dtype),
        d_pe_kernel.astype(pe_kernel.dtype),
        d_pe_bias.astype(pe_bias.dtype),
        dblank.astype(blank_logit.dtype),
    )


def _rel_feat(pos, ncc, cs, rel_width, clamp_width):
    """(b, n, m, 5) rel-pos features for the backward pass (XLA level)."""
    pos_g = gather_clusters_onehot(pos[:, None], ncc, cs)[:, 0]  # b n m 2
    rel = pos_g - pos[:, :, None, :]
    if clamp_width:
        rel = jnp.clip(rel + rel_width, 0, clamp_width - 1) - rel_width
    dx, dy = rel[..., 0], rel[..., 1]
    dist = jnp.sqrt(dx * dx + dy * dy)
    safe = jnp.where(dist == 0, 1.0, dist)
    sin = jnp.where(dist == 0, 0.0, dy / safe)
    cos = jnp.where(dist == 0, 0.0, dx / safe)
    return jnp.stack([dx, dy, dist, sin, cos], axis=-1)


def _pad_mask(ncc, cs, n, nnc):
    """(b, n, m) True where the slot maps to a real (non-padded) token."""
    b = ncc.shape[0]
    kk = -(-n // cs)
    slot = jnp.arange(cs)
    token_idx = ncc[..., None] * cs + slot  # b n nnc cs
    return (token_idx < n).reshape(b, n, nnc * cs)


def fused_cluster_attention(q, k, v, ncc, pos, pe_kernel, pe_bias,
                            blank_logit, cs, rel_width, clamp_width=0,
                            static_ncc=None):
    """Fused local cluster attention (see module docstring).

    Args:
        q: (b, h, n, c_) pre-scaled queries (cluster-ordered).
        k, v: (b, h, n, c_) cluster-ordered keys/values.
        ncc: (b, n, nnc) int32 nearest-cluster indices.
        pos: (b, n, 2) float token positions (cluster-ordered).
        pe_kernel: (5, h) pos_embed weights; pe_bias: (h,).
        blank_logit: (b, h, n, 1) logit of the learned blank slot.
        cs: cluster size; rel_width: R; clamp_width: table width for the
            MixRes clamp (0 = no clamp, AFF semantics).
        static_ncc: optional host-constant (n, nnc) numpy copy of ``ncc``
            (identical across the batch) — e.g. the on-grid stage, where
            the token-to-cluster kNN is a pure function of (h, w). Enables
            the windowed-K/V fast path: each query tile streams only its
            cluster band instead of the full token axis.

    Returns:
        (out (b, h, n, c_), blank_p (b, h, n, 1) fp32).
    """
    wrapped = None if static_ncc is None else _StaticNcc(static_ncc)
    return _fca(q, k, v, ncc, pos, pe_kernel, pe_bias, blank_logit,
                cs, rel_width, clamp_width, wrapped)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def _fca(q, k, v, ncc, pos, pe_kernel, pe_bias, blank_logit,
         cs, rel_width, clamp_width, static_ncc):
    return _attention_fwd_impl(
        q, k, v, ncc, pos, pe_kernel, pe_bias, blank_logit,
        cs, rel_width, clamp_width, static_ncc,
    )


def _fca_fwd(q, k, v, ncc, pos, pe_kernel, pe_bias, blank_logit,
             cs, rel_width, clamp_width, static_ncc):
    out = _attention_fwd_impl(
        q, k, v, ncc, pos, pe_kernel, pe_bias, blank_logit,
        cs, rel_width, clamp_width, static_ncc,
    )
    return out, (q, k, v, ncc, pos, pe_kernel, pe_bias, blank_logit)


def _fca_bwd(cs, rel_width, clamp_width, static_ncc, residuals, cotangents):
    q, k, v, ncc, pos, pe_kernel, pe_bias, blank_logit = residuals
    g_out, g_blankp = cotangents
    if _PALLAS_BWD:
        dq, dk, dv, d_pe_kernel, d_pe_bias, dblank = _attention_bwd_impl(
            q, k, v, ncc, pos, pe_kernel, pe_bias, blank_logit,
            g_out, g_blankp, cs, rel_width, clamp_width, static_ncc,
        )
        return (dq, dk, dv, None, None, d_pe_kernel, d_pe_bias, dblank)
    b, h, n, c_ = q.shape
    nnc = ncc.shape[-1]
    kk = -(-n // cs)

    # recompute probabilities with the one-hot algebra (XLA level)
    feat5 = _rel_feat(pos, ncc, cs, rel_width, clamp_width)  # b n m 5
    bias = (
        jnp.einsum("bnmf,fh->bhnm", feat5, pe_kernel.astype(jnp.float32))
        + pe_bias.astype(jnp.float32)[None, :, None, None]
    )
    pad_ok = _pad_mask(ncc, cs, n, nnc)[:, None]  # b 1 n m
    kg = gather_clusters_onehot(k, ncc, cs)
    vg = gather_clusters_onehot(v, ncc, cs)
    logits = jnp.einsum(
        "bhic,bhimc->bhim", q.astype(jnp.float32), kg.astype(jnp.float32)
    ) + bias
    logits = jnp.where(pad_ok, logits, NEG_INF)
    blank = blank_logit.astype(jnp.float32)
    mx = jnp.maximum(logits.max(-1, keepdims=True), blank)
    p = jnp.where(pad_ok, jnp.exp(logits - mx), 0.0)
    pb = jnp.exp(blank - mx)
    denom = p.sum(-1, keepdims=True) + pb
    p = p / denom
    pb = pb / denom

    g_out32 = g_out.astype(jnp.float32)
    dp = jnp.einsum("bhic,bhimc->bhim", g_out32, vg.astype(jnp.float32))
    gb = g_blankp.astype(jnp.float32)

    s = (dp * p).sum(-1, keepdims=True) + gb * pb
    dlogits = p * (dp - s)  # zero at masked slots since p there is 0
    dblank = pb * (gb - s)

    dq = jnp.einsum("bhim,bhimc->bhic", dlogits, kg.astype(jnp.float32))
    d_pe_kernel = jnp.einsum("bhnm,bnmf->fh", dlogits, feat5)
    d_pe_bias = dlogits.sum(axis=(0, 2, 3))

    # scatter-adds as transposed one-hot matmuls (deterministic)
    onehot = jax.nn.one_hot(ncc.reshape(b, -1), kk, dtype=jnp.float32)
    dkg = q.astype(jnp.float32)[:, :, :, None, :] * dlogits[..., None]
    dvg = p[..., None] * g_out32[:, :, :, None, :]

    def scatter(dxg):
        flat = dxg.reshape(b, h, n * nnc, cs * c_)
        acc = jnp.einsum("bek,bhed->bhkd", onehot, flat)
        return acc.reshape(b, h, kk * cs, c_)[:, :, :n]

    dk = scatter(dkg)
    dv = scatter(dvg)
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        None,
        None,
        d_pe_kernel.astype(pe_kernel.dtype),
        d_pe_bias.astype(pe_bias.dtype),
        dblank.astype(blank_logit.dtype),
    )


_fca.defvjp(_fca_fwd, _fca_bwd)
