"""Fused neighborhood attention as a Pallas TPU kernel.

Fuses what the reference runs as two CUDA kernels plus torch glue
(CLUSTEN-QK -> +rel-pos bias -> mask -> blank-token softmax -> CLUSTEN-AV,
``aff_transformer.py:120-155``) into ONE kernel per (image-group,
query-tile).

TPU-first design — dense-within-tile with cluster masking, not gathers:
each query's neighborhood is a union of whole clusters, so instead of
gathering K/V rows (irregular memory movement the MXU hates), the kernel
computes the *dense* q @ K^T over all tokens of the image — K/V live in
VMEM — and masks logits down to each token's ``nnc`` nearest clusters.
Dense QK costs ``n * c_`` MACs per query on the MXU versus
``nnc * n * c_`` for a one-hot gather formulation — the "wasteful" dense
matmul is the cheapest formulation on this hardware. The relative-position
bias is evaluated in-kernel from coordinates (5 fused VPU planes), so no
``(b, h, n, m)`` bias tensor ever reaches HBM.

Operand layout is token-major ``(b, n, h*c_)`` for q / ``(b, n, h*2*c_)``
for the fused kv — exactly what the q/kv Linear projections produce
(kv channel structure ``(h, 2, c_)``, matching the reference's
``kv.view(b, n, h, 2, c_)`` at ``aff_transformer.py:110``) — with per-head
lane slices taken inside the kernel, so no head-split transposes, K/V
splits, or output merges ever exist at the XLA level (measured: that glue
cost ~9 ms per AFF-Mini b128 forward).
The learned blank token (``aff_transformer.py:139-147``) is folded in
too: its logit is ``q @ blank_k`` on the MXU and its value contribution
``pb * blank_v`` is added before the single ``(b, n, c)`` output is
written, eliminating the reference's extra attention slot and the
pathological ``(b, h, n, 1)`` tensors it implies on TPU tiling.

Numerics vs the reference: identical except that padded cluster slots are
excluded from the softmax instead of contributing ``exp(l0 - 100) ~ 1e-40``
— invisible at fp32 (verified by the parity suite).

The backward pass (custom_vjp) is a second Pallas kernel (flash-style
recompute): the scatter-adds the reference hand-writes with
``fastAtomicAdd`` (``clustenqk_cuda_kernel.cu:125``) become in-VMEM
accumulation over the sequential query-tile grid — deterministic by
construction. An XLA one-hot-matmul backward is kept as the oracle
(``MLAFF_PALLAS_BWD=0``).
"""

from __future__ import annotations

import functools
import logging
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cluster_gather import gather_clusters_onehot

__all__ = ["fused_cluster_attention"]

NEG_INF = -1e30

def _interpret() -> bool:
    """Run the kernels under the Pallas interpreter?

    Read at CALL time, not import time, so test modules / conftest can set
    the env var in any order.  Off-TPU backends can only execute
    ``pallas_call`` under the interpreter (XLA:CPU raises otherwise), so
    auto-interpret there — the compiled lowering is TPU-only anyway.
    """
    return (
        os.environ.get("MLAFF_PALLAS_INTERPRET", "0") == "1"
        or jax.default_backend() != "tpu"
    )
# fused Pallas backward (flash-style recompute); set =0 to fall back to the
# XLA one-hot-matmul backward (reference algebra, kept as the oracle)
_PALLAS_BWD = os.environ.get("MLAFF_PALLAS_BWD", "1") == "1"


def _pick_tile(n: int, np_: int, planes: int = 8) -> int:
    """Largest divisor tile whose fp32 working planes fit the VMEM budget.

    ``planes`` is how many (tq, np) fp32 planes the kernel keeps live
    (attention: ~8 — logits, dx/dy, dist, mask, probs, temporaries;
    merging: ~16); budget them against the raised 96MB scoped limit with
    headroom for K/V and pipeline buffers.
    """
    budget = 60 * 1024 * 1024
    best = None
    for t in range(min(n, 512), 0, -1):
        if n % t != 0:
            continue
        if t % 8 != 0 and t != n:
            continue  # sublane constraint: divisible by 8 or the full dim
        if t * np_ * 4 * planes <= budget:
            return t
        best = t  # nothing fits: remember the SMALLEST candidate seen
    return best if best is not None else n


def _dense_pad_tile(n: int, np_: int, planes: int = 8):
    """(padded_rows, tq) for dense stages whose n has no usable divisor.

    MixRes/MaskFiner token counts are near-prime (e.g. 1921 = 17*113), so
    ``_pick_tile`` falls back to ONE whole-row tile; at n ~ 2000 that is a
    single giant Mosaic program (the unrolled gb*h body over (n, np)
    planes) whose remote compile exceeded the compile helper's connection
    lifetime (queue r3d-2, EOF at 75 min — same failure killed the r2 UD
    bench). Padding the QUERY axis a few percent buys a real grid: pick
    the multiple-of-8 tile <= 512 minimizing padded rows (ties to the
    larger tile); the caller pads q/pos/ncc rows, masks nothing (padded
    rows attend normally and are sliced off; backward pads g_out with
    zeros so they contribute exact zeros to dkv/dpe/dblank)."""
    budget = 60 * 1024 * 1024
    best = None
    for t in range(128, 513, 8):
        if t * np_ * 4 * planes > budget:
            break
        key = (-(-n // t) * t, -t)
        if best is None or key < best[0]:
            best = (key, t)
    if best is None:
        # np_ so wide even 128 rows bust the budget: very wide K
        # (banded np_=4224 at the 48-plane backward charge) legitimately
        # needs sub-128 tiles — the old hard 128 floor silently kept the
        # tile (and the 113 M scoped footprint) regardless of the planes
        # charge (queues r4b-1/r4d-1). Largest fitting tile >= 32 wins;
        # tiles for every budget-fitting shape are unchanged.
        for t in range(120, 31, -8):
            if t * np_ * 4 * planes <= budget:
                return -(-n // t) * t, t
        return -(-n // 32) * 32, 32
    return best[0][0], best[1]


def _kband_split(np_: int):
    """``(nb, Wb, np_pad)`` splitting the padded K axis into static bands,
    or ``None`` when the full width is safe as one plane.

    The compiled dense kernel faults the TPU worker at np_ = 4168
    (curriculum ratio-1.0 UD shapes; 3/3 deterministic, queues
    r3g-1/r3h-1) even though the compile succeeds and the interpreter
    passes — a Mosaic-level fault in the >4096-lane plane class. Instead
    of routing those stages off the kernel (the round-3 NMAX guard),
    split every (tq, np_) compute plane into ``nb`` bands of ``Wb``
    lanes at static offsets: all lane widths stay inside the
    chip-validated class (np_ <= 1928 measured good) and the kernels'
    multi-band joint softmax keeps numerics exact. The reference runs
    these shapes through CLUSTEN with no shape carve-outs
    (``clustenqk_cuda_kernel.cu:18-49``).

    ``MLAFF_KBAND`` tunes the trigger/width cap (0 disables banding).
    """
    cap = int(os.environ.get("MLAFF_KBAND", "2048"))
    if cap <= 0 or np_ <= cap:
        return None
    nb = -(-np_ // cap)
    wb = -(-(-(-np_ // nb)) // 128) * 128
    return nb, wb, nb * wb


def _choose_tiling(n: int, np_: int, cs: int, static_ncc) -> Tuple[int, Optional[tuple]]:
    """(tq, window) for the kernel grid.

    ``window`` is ``None`` (dense path) or ``(nb, Wb, np128, offs)`` with
    ``offs`` of shape (nt, nb) holding 128-quantized element-window starts
    (−1 = unused band slot): the K/V working set per query tile is ``nb``
    bands of ``Wb`` rows each. A contiguous window is the ``nb = 1``
    special case; the multi-band form exploits that a tile's neighbor
    clusters live in ~3 separate scanline bands of the cluster order, so
    its true working set is far narrower than the contiguous span.

    Windowed path (host-constant neighborhoods): the kernel's cost is VPU
    work over the masked (tq, nb*Wb) planes plus re-streaming the K/V
    bands per instance, and the working set shrinks as tiles get smaller —
    pick tq minimizing ``nt * nb*Wb * (tq + kappa)`` where kappa ≈ 16 rows
    models the HBM re-stream / per-DMA overhead per instance.
    Non-windowed path: largest VMEM-fitting tile (dense K/V is shared per
    instance, so bigger tiles amortize it best).
    """
    use_compact = os.environ.get("MLAFF_COMPACT", "0") == "1"
    static_pos = getattr(static_ncc, "pos", None) if static_ncc else None
    if static_ncc is not None and (not _interpret() or use_compact):
        # kappa fitted to the measured stage-1 sweep (tq 112/224/448 ->
        # 7.42/7.12/8.04 ms): per-instance fixed cost is worth ~64 rows
        kappa = int(os.environ.get("MLAFF_KAPPA", "64"))
        forced = os.environ.get("MLAFF_TQ")  # experiment override
        # default OFF: measured slower than the contiguous window at mini
        # stage-1 (2013 vs ~2270 img/s model-level) — the 5 per-band
        # element-indexed DMAs per grid step cost more than the narrower
        # planes save. Kept for experiments (large-window shapes may differ).
        use_bands = os.environ.get("MLAFF_BANDS", "0") == "1"
        best = None
        t = 8
        while t <= min(n, 512):
            if n % t == 0:
                cands = []
                if not _interpret():
                    win = _static_window(static_ncc.arr, n, t, cs, np_)
                    if win is not None:
                        cands.append(win)
                    if use_bands:
                        wb = _static_bands(static_ncc.arr, n, t, cs, np_)
                        if wb is not None:
                            cands.append(wb)
                if use_compact and static_pos is not None:
                    wc = _static_compact(
                        static_ncc.arr, static_pos, n, t, cs, np_
                    )
                    if wc is not None:
                        cands.append(wc)
                if forced and t == int(forced) and cands:
                    # forced-tq experiments: compact wins ties when enabled
                    compacts = [c for c in cands if c[0] == "compact"]
                    return t, (compacts[0] if compacts else cands[0])
                for cand in cands:
                    if cand[0] == "compact":
                        width = cand[1] * cand[2]
                    else:
                        width = cand[0] * cand[1]
                    cost = (n // t) * width * (t + kappa)
                    if best is None or cost < best[0]:
                        best = (cost, t, cand)
            t += 8
        if best is not None:
            return best[1], best[2]
    return _pick_tile(n, np_), None


class _Route(NamedTuple):
    """Single source of truth for the kernel dispatch (fwd AND bwd).

    One routing bug class shipped in round 4: the stacked-dispatch bound
    was raised in the forward gate while the K-band exclusion lived as a
    hand-duplicated copy in each impl, and the copies diverged (commit
    9432a70 — K-banded shapes reached the band-less stacked kernel and
    produced NaN rows). Every *path-selection* predicate now lives in
    ``_route`` below; ``_attention_fwd_impl`` / ``_attention_bwd_impl``
    consume the decision and only compute direction-local budgets
    (image-group sizes, scratch clamps) for the selected path.

    ``nb`` / ``wb`` / ``np_`` are the DENSE-path plane geometry (K-band
    split applied); when ``window`` is not None the branches unpack the
    authoritative values from the window tuple itself.
    """

    tq: int                  # query tile rows
    window: Optional[tuple]  # _choose_tiling result (None = dense path)
    compact: bool            # window is the compact-union layout
    nb: int                  # dense path: K-band count (0 = single plane)
    wb: int                  # dense path: band width (lanes)
    np_: int                 # dense path: padded K rows (grown by banding)
    stacked: bool            # row-stacked dense kernel for small-n stages
    twin: bool               # traced-window path eligible (static part)
    wsg_ok: bool             # windowed row-stacking eligible


def _saved_stacked_ok(np_: int) -> bool:
    """Size floor for the saved-residual STACKED backward: at the tiny
    stages (np_ <= 256 — AFF stages 3/4) the lane reductions the saved
    path removes are already cheap and the stats traffic edges ahead
    (r5d-2/3 chip A/B: n=196 bwd 1.551 -> 1.676 ms), while stage-2
    widths win (n=784: 5.987 -> 5.223 ms). The windowed route has no
    floor (stage-1 wins outright: 13.95 -> 9.56 ms)."""
    return np_ > int(os.environ.get("MLAFF_BWD_SAVED_NMIN", "256"))


def _route(n: int, np_: int, cs: int, static_ncc, drop, *,
           bwd: bool) -> _Route:
    """Decide the dispatch path for one attention shape.

    ``bwd`` only changes (a) which stacking knobs are consulted
    (``MLAFF_STACK_BWD[_NMAX]`` fall back to the forward's values) and
    (b) the dense/banded tile re-pick budgets — the backward keeps more
    fp32 planes live per query row (softmax recompute + the dq/dkv/dpe
    flows), so its tile is charged at planes=16 (dense) / 48 (banded)
    instead of the forward's 8. Path *selection* is identical in both
    directions by construction.
    """
    tq, window = _choose_tiling(n, np_, cs, static_ncc)
    compact = window is not None and window[0] == "compact"
    nb, wb = 0, np_
    if window is None:
        band = _kband_split(np_)
        if band is not None:
            nb, wb, np_ = band
            if bwd:
                # banded bwd keeps EVERY band's geometry live through the
                # dpe accumulation (see the charge history in the bwd impl)
                tq = _pick_tile(n, np_, planes=48)
        elif bwd:
            tq = _pick_tile(n, np_, planes=16)

    # Stacked dense path for the small-token stages: image group folded
    # into rows, one VPU chain per head instead of per (image, head).
    # The stacked kernels carry no K-band planes, so any banded shape
    # (possible with a shrunken MLAFF_KBAND) must stay on the banded
    # plain path — THE single copy of the r4 NaN-regression exclusion.
    stacked = (
        os.environ.get("MLAFF_STACK", "1") == "1"
        and window is None and static_ncc is None and drop is None
        and nb == 0
    )
    if stacked:
        if bwd:
            stacked = (
                os.environ.get("MLAFF_STACK_BWD", "1") == "1"
                and np_ <= int(os.environ.get(
                    "MLAFF_STACK_BWD_NMAX",
                    os.environ.get("MLAFF_STACK_NMAX", "800"),
                ))
            )
        else:
            stacked = np_ <= int(os.environ.get("MLAFF_STACK_NMAX", "800"))

    # Traced-window path for large data-dependent stages. The backward
    # historically omitted the ``drop is None`` guard (the twin bwd was
    # never validated under dropout); unified here to the forward's gate.
    twin = (
        os.environ.get("MLAFF_TWIN", "0") == "1"
        and window is None and nb == 0 and drop is None
        and not stacked and static_ncc is None and np_ > 256
    )

    # Row-stacking on the windowed (host-constant geometry) path.
    wsg_ok = (window is not None and not compact
              and static_ncc is not None and drop is None)
    return _Route(tq, window, compact, nb, wb, np_, stacked, twin, wsg_ok)


def _static_window(static_ncc, n, tq, cs, np_):
    """Per-tile contiguous K/V window (host, numpy) for
    compile-time-constant neighborhoods (the on-grid stage): each query
    tile only touches a band of clusters thanks to space-filling-curve
    locality.

    Returns ``(1, W, np128, offs (nt, 1))`` — window width in rows, the
    padded row count, and per-tile *element* window starts (``pl.Element``
    indexing; quantized to 128, clamped in bounds) — or ``None`` if
    windowing does not pay (window would cover most of the token axis
    anyway).
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
    # Windowing pays only while the band is a fraction of the token axis;
    # past that, the dense path's VMEM-resident K/V reuse wins. 0.5 was
    # tuned on stage-1; MLAFF_WFRAC widens it for experiments.
    wfrac = float(os.environ.get("MLAFF_WFRAC", "0.5"))
    if W > np128 * wfrac:
        return None
    offs = np.minimum(rmin, np128 - W) // 128
    return 1, W, np128, offs.astype(np.int32)[:, None]


def _static_bands(static_ncc, n, tq, cs, np_):
    """Per-tile multi-band K/V windows (host, numpy): the exact set of
    128-row blocks containing any neighbor cluster of the tile's queries.

    A tile's neighbors live in ~3 separate scanline bands of the cluster
    order, so the union of needed 128-blocks is much narrower than the
    contiguous min..max span ``_static_window`` uses. Returns
    ``(nb, 128, np128, offs (nt, nb))`` with −1 padding unused band slots
    (the kernel masks them out; their index maps clamp to block 0), or
    ``None`` when bands would not beat the dense path.
    """
    import numpy as np

    nt = n // tq
    np128 = -(-np_ // 128) * 128
    ncc_t = np.asarray(static_ncc).reshape(nt, tq, -1)
    per_tile = []
    for ti in range(nt):
        cls = np.unique(ncc_t[ti])
        lo = cls * cs // 128
        hi = ((cls + 1) * cs - 1) // 128
        # every block each cluster touches, INCLUDING interior blocks when
        # cs > 128 makes a cluster span 3+ blocks
        blocks = np.unique(
            np.concatenate([np.arange(a, b + 1) for a, b in zip(lo, hi)])
        )
        per_tile.append(blocks[blocks * 128 < np128])
    nb = max(len(b) for b in per_tile)
    wfrac = float(os.environ.get("MLAFF_WFRAC", "0.5"))
    if nb * 128 > np128 * wfrac:
        return None
    offs = np.full((nt, nb), -1, np.int32)
    for ti, blocks in enumerate(per_tile):
        offs[ti, : len(blocks)] = blocks
    return nb, 128, np128, offs


def _static_compact(static_ncc, static_pos, n, tq, cs, np_, bs=16):
    """Compact-union K/V layout for a host-constant geometry stage.

    Each query's neighborhood is only ``nnc*cs`` rows, but the windowed
    kernel evaluates (tq, W) planes over the full contiguous cluster band
    (W ~ 896 at mini stage-1) — most plane columns are masked out. This
    variant instead enumerates, per query tile, the exact union of
    ``bs``-row blocks its neighbor clusters touch; the kernel copies those
    blocks out of the VMEM-resident K/V into a contiguous scratch (no
    extra DMAs — the per-band-DMA streaming variant lost to exactly that
    overhead, see PERF.md) and runs the same dense-masked math over the
    ~2-3x narrower compact plane.

    Because positions are host-constant too, the per-column K positions
    and cluster ids are precomputed here as (nt, ...) lane-vector tables
    (-1 cluster = padded/out-of-range column, never matches any ncc).

    Returns ``("compact", U, bs, np_pad, starts (nt,U), clc (nt,1,U*bs),
    posc (nt,2,U*bs))`` or None when the union is not narrower than the
    padded token axis. ``bs`` = 16 keeps dynamic row slices aligned to
    the bf16 sublane tile. ``clc`` carries a unit sublane axis so its
    per-tile block shape (1, 1, U*bs) satisfies Mosaic's block rule (the
    last two dims must divide (8, 128) or equal the array's — a (1, U*bs)
    block over (nt, U*bs) does not).
    """
    import numpy as np

    nt = n // tq
    ncc_t = np.asarray(static_ncc).reshape(nt, tq, -1)
    per_tile = []
    for ti in range(nt):
        cls = np.unique(ncc_t[ti])
        blo = cls * cs // bs
        bhi = ((cls + 1) * cs - 1) // bs
        blocks = np.unique(
            np.concatenate([np.arange(a, b + 1) for a, b in zip(blo, bhi)])
        )
        blocks = blocks[blocks * bs < n]
        per_tile.append(blocks)
    u_max = max(len(x) for x in per_tile)
    # pad the compact width up to a lane-tile multiple
    u_pad = -(-u_max * bs // 128) * 128 // bs
    ucs = u_pad * bs
    np_pad = -(-np_ // bs) * bs
    if ucs >= np_pad:
        return None
    starts = np.full((nt, u_pad), -1, np.int32)
    for ti, blocks in enumerate(per_tile):
        starts[ti, : len(blocks)] = blocks  # bs-block units
    clc = np.full((nt, ucs), -1, np.int32)
    posc = np.zeros((nt, 2, ucs), np.float32)
    pos_np = np.asarray(static_pos, np.float32)
    rows_rel = np.arange(bs)
    for ti in range(nt):
        for ui in range(u_pad):
            if starts[ti, ui] < 0:
                continue
            b0 = starts[ti, ui] * bs
            rows = b0 + rows_rel
            valid = rows < n
            sl = slice(ui * bs, (ui + 1) * bs)
            clc[ti, sl][valid] = rows[valid] // cs
            posc[ti, 0, sl][valid] = pos_np[rows[valid], 0]
            posc[ti, 1, sl][valid] = pos_np[rows[valid], 1]
    return "compact", u_pad, bs, np_pad, starts, clc[:, None, :], posc


def _twin_tile(n: int) -> Optional[int]:
    """Query tile for the traced-window path: largest divisor of n that is
    sublane-aligned and <= 128 (small tiles keep per-tile cluster spans —
    and hence the static window width — narrow)."""
    for t in range(128, 7, -8):
        if n % t == 0:
            return t
    return None


def _traced_window(ncc, n, np_, cs, tq):
    """Per-(image, tile) window starts computed IN-GRAPH from the traced
    neighborhoods (data-dependent clustering: every image has its own
    cluster order, unlike the host-constant on-grid stage).

    The static window width is ``MLAFF_TWIN_FRAC`` (default 0.5) of the
    padded token axis; space-filling-curve locality keeps each tile's
    neighbor clusters inside such a band in practice, and the caller
    guards dispatch with the returned ``ok`` scalar (lax.cond to the
    dense path when any span overflows — correctness never depends on
    the locality assumption).

    Returns ``(Wt, offs128 (b, nt) i32, ok bool scalar)`` or
    ``(None, None, None)`` when windowing cannot pay.
    """
    b = ncc.shape[0]
    np128 = -(-np_ // 128) * 128
    frac = float(os.environ.get("MLAFF_TWIN_FRAC", "0.5"))
    wt = int(np128 * frac / 128) * 128
    if wt < 256 or wt >= np128:
        return None, None, None
    nt = n // tq
    ncc_t = ncc.reshape(b, nt, tq, -1)
    rmin = ncc_t.min(axis=(2, 3)).astype(jnp.int32) * cs
    rmax = (ncc_t.max(axis=(2, 3)).astype(jnp.int32) + 1) * cs
    offs = jnp.clip(rmin // 128 * 128, 0, np128 - wt)
    ok = jnp.all((rmax - offs) <= wt)
    return wt, (offs // 128).astype(jnp.int32), ok


class _StaticNcc:
    """Hashable wrapper so host-constant neighborhoods (and, when the
    caller has them, host-constant token positions) can ride through
    ``custom_vjp`` nondiff_argnums (which are closed over and must hash)."""

    __slots__ = ("arr", "pos", "_key")

    def __init__(self, arr, pos=None):
        import numpy as np

        self.arr = np.asarray(arr, dtype=np.int32)
        self.pos = None if pos is None else np.asarray(pos, dtype=np.float32)
        self._key = (
            self.arr.shape, self.arr.tobytes(),
            None if self.pos is None else self.pos.tobytes(),
        )

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _StaticNcc) and self._key == other._key


def _geometry(posq_ref, pxk, pyk, ncc_ref, bi, tq, W, col0, cs, n_valid,
              rel_width, clamp_hi, nnc, want_feat: bool, col_cluster=None):
    """Shared per-image geometry: rel-pos planes + the neighborhood mask.

    K positions arrive transposed (2, np) so x/y are LANE vectors (passed
    pre-extracted by the caller) — broadcasting a sublane-extracted column
    across lanes forces a catastrophic relayout. Geometry stays fp32: bf16
    compares are unsupported on v5e and bf16 rsqrt/fma chains crash the
    LLO scheduler.
    """
    pxq = posq_ref[bi, :, 0:1].astype(jnp.float32)  # (tq, 1) sublane vec
    pyq = posq_ref[bi, :, 1:2].astype(jnp.float32)
    pxk = pxk.astype(jnp.float32)  # (W,) lane vector
    pyk = pyk.astype(jnp.float32)
    dx = pxk[None, :] - pxq  # (tq, W)
    dy = pyk[None, :] - pyq
    if clamp_hi is not None:
        # MixRes clamps table-frame coords to [0, tw-1] (mixres:527)
        R = rel_width
        dx = jnp.clip(dx + R, 0, clamp_hi) - R
        dy = jnp.clip(dy + R, 0, clamp_hi) - R
    d2 = dx * dx + dy * dy
    # dist = d2 * rsqrt(d2); sin = dy * rsqrt; cos = dx * rsqrt (0 at 0)
    inv = jnp.where(
        d2 > 0, jax.lax.rsqrt(jnp.where(d2 > 0, d2, 1.0)), 0.0
    )

    # neighborhood mask: column j belongs iff cluster(j) in ncc[t].
    # Compact mode passes per-column cluster ids directly (-1 at padded
    # columns, which never matches), covering the n_valid check too.
    if col_cluster is not None:
        cc = col_cluster[None, :]
        member = jnp.zeros((tq, W), jnp.bool_)
        for j in range(nnc):
            member = member | (cc == ncc_ref[bi, :, j][:, None])
    else:
        col_idx = jax.lax.broadcasted_iota(jnp.int32, (tq, W), 1) + col0
        cc = col_idx // cs
        member = jnp.zeros((tq, W), jnp.bool_)
        for j in range(nnc):
            member = member | (cc == ncc_ref[bi, :, j][:, None])
        member = member & (col_idx < n_valid)
    if want_feat:
        return dx, dy, d2, inv, member, d2 * inv, dy * inv, dx * inv
    return dx, dy, d2, inv, member


def _unpack_refs(refs, nb, wb, cu=0, cbs=0, scratch_kv=None, sbands=False):
    """Shared ref unpacking for fwd/bwd.

    Static-band mode (``sbands=True``, dense ref layout, no offsets
    operand): the padded K axis is split into ``nb`` fixed bands of
    ``wb`` rows at compile-time offsets ``j*wb`` — every (tq, W) compute
    plane stays inside the chip-validated lane-width class (the compiled
    dense kernel faults the TPU worker at np_=4168, queues r3g/r3h)
    while the multi-band joint softmax keeps numerics exact. K positions
    arrive pre-banded as ``(gb, 2*nb, wb)`` (rows 2j/2j+1 = band j x/y)
    so no operand carries a >4096-lane dimension.

    Windowed kernels (nb >= 1) hold the FULL K/V and transposed K-position
    blocks resident in VMEM (fetched once per image group — their index
    maps ignore the tile dim, so Pallas skips the re-fetch) and slice each
    tile's ``nb`` bands of ``wb`` rows in-kernel at the scalar-prefetched,
    128-quantized window starts. The dense path (nb=0) reads the full
    blocks directly (wb = padded row count).

    Compact mode (cu >= 1, see ``_static_compact``): copies the tile's
    ``cu`` union blocks of ``cbs`` rows out of the resident K/V into the
    contiguous ``scratch_kv`` and serves reads from it; K positions and
    per-column cluster ids come from host-precomputed lane-vector tables.

    Returns (q_ref, posq_ref, get_kv, get_pos, col0s, valids, tail,
    col_cluster) where ``get_kv(j, bi, c0, c1)`` loads band j's
    (wb, c1-c0) K/V slice, ``get_pos(j, bi)`` its (pxk, pyk) lane
    vectors, and ``col_cluster`` is the compact-mode per-column cluster
    lane vector (None otherwise).
    """
    if cu:
        starts_ref = refs[0]
        q_ref = refs[1]
        kv_ref = refs[2]
        posq_ref = refs[3]
        clc_ref = refs[4]
        posc_ref = refs[5]
        tail = refs[6:]
        ti = pl.program_id(1)
        for u in range(cu):
            # starts are in cbs-block units: the constant multiply makes
            # the dynamic slice start provably sublane-aligned (Mosaic
            # rejects a raw row offset it cannot prove % 8 == 0)
            s = jnp.maximum(starts_ref[ti, u], 0) * cbs
            scratch_kv[:, u * cbs:(u + 1) * cbs, :] = (
                kv_ref[:, pl.ds(s, cbs), :]
            )
        valids = [None]

        def col0(j, bi):
            return 0

        def get_kv(j, bi, c0, c1):
            return scratch_kv[bi, :, c0:c1]

        def get_pos(j, bi):
            return posc_ref[0, 0, :], posc_ref[0, 1, :]

        return (q_ref, posq_ref, get_kv, get_pos, col0, valids, tail,
                clc_ref[0, 0, :])
    if nb and sbands:
        q_ref, kv_ref, posq_ref, posk_ref = refs[:4]
        tail = refs[4:]
        valids = [None] * nb  # padded cols masked via col_idx < n_valid

        def col0(j, bi):
            return j * wb  # python int: every slice below is static

        def get_kv(j, bi, c0, c1):
            return kv_ref[bi, j * wb:(j + 1) * wb, c0:c1]

        def get_pos(j, bi):
            return posk_ref[bi, 2 * j, :], posk_ref[bi, 2 * j + 1, :]

        return q_ref, posq_ref, get_kv, get_pos, col0, valids, tail, None
    if nb:
        off_ref = refs[0]
        q_ref = refs[1]
        kv_ref = refs[2]
        posq_ref = refs[3]
        posk_ref = refs[4]
        tail = refs[5:]
        ti = pl.program_id(1)
        if len(off_ref.shape) == 3:
            # traced per-(image, tile) window starts (b//gb, gb, nt):
            # data-dependent clustering gives every image its own band
            gi = pl.program_id(0)
            valids = [None]  # spans verified in-graph before dispatch

            def col0(j, bi):
                return off_ref[gi, bi, ti] * 128
        else:
            raws = [off_ref[ti, j] for j in range(nb)]
            col0s = [jnp.maximum(r, 0) * 128 for r in raws]
            valids = [r >= 0 for r in raws]

            def col0(j, bi):
                return col0s[j]

        def get_kv(j, bi, c0, c1):
            return kv_ref[bi, pl.ds(col0(j, bi), wb), c0:c1]

        def get_pos(j, bi):
            return (posk_ref[bi, 0, pl.ds(col0(j, bi), wb)],
                    posk_ref[bi, 1, pl.ds(col0(j, bi), wb)])

        return q_ref, posq_ref, get_kv, get_pos, col0, valids, tail, None
    else:
        q_ref = refs[0]
        kv_ref = refs[1]
        posq_ref = refs[2]
        posk_ref = refs[3]
        tail = refs[4:]
        valids = [None]  # statically valid

        def col0(j, bi):
            return 0

        def get_kv(j, bi, c0, c1):
            return kv_ref[bi, :, c0:c1]

        def get_pos(j, bi):
            return posk_ref[bi, 0, :], posk_ref[bi, 1, :]

    return q_ref, posq_ref, get_kv, get_pos, col0, valids, tail, None


def _drop_keep(seed, img, hi, row0, col0, rows, cols, rate):
    """(rows, cols) fp32 keep/scale plane for attention-prob dropout
    (reference applies ``attn_drop`` between softmax and AV,
    ``aff_transformer.py:148``).

    Stateless lowbias32-style integer hash of the GLOBAL (image, head,
    query-row, kv-col) coordinates — NOT the Pallas PRNG — so the
    backward kernel reproduces the identical mask under its own,
    different query tiling (it recomputes the softmax flash-style and
    must drop the same slots). int32 arithmetic wraps; coordinate
    collisions beyond 2^32 elements only correlate isolated pairs of
    drop decisions, harmless for dropout.
    """
    shr = jax.lax.shift_right_logical
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) + row0
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) + col0
    # fixed 2^16 row stride: K widths are < 2^16, so (row, col) packs
    # injectively (pre-wrap) regardless of the caller's padded np_ —
    # fwd and bwd agree even if their padding differs. Col 65535 is
    # reserved for the blank slot.
    x = r * jnp.int32(65536) + c
    x = x + seed + jnp.int32(-1640531535) * img + jnp.int32(-2048144777) * hi
    x = x ^ shr(x, 16)
    x = x * jnp.int32(2146121005)
    x = x ^ shr(x, 15)
    x = x * jnp.int32(-2073219445)
    x = x ^ shr(x, 16)
    thresh = jnp.int32(int(rate * 2147483647.0))
    keep = (x & jnp.int32(0x7FFFFFFF)) >= thresh
    return jnp.where(keep, jnp.float32(1.0 / (1.0 - rate)), 0.0)


def _fwd_kernel(*refs, h: int, cs: int, n_valid: int, rel_width: int,
                clamp_hi: Optional[int], hiprec: bool, nb: int, wb: int,
                batch_inv: bool, cu: int = 0, cbs: int = 0, wsg: int = 1,
                sbands: bool = False, drop_rate: float = 0.0,
                stats: bool = False):
    scratch_kv = None
    scratch_lg = None
    stats_ref = None
    # scratch refs are popped positionally: the wsg logits plane and the
    # compact kv copy are mutually exclusive by call-site construction
    # (_attention_fwd_impl forces wsg=1 on the compact path)
    assert not (wsg > 1 and cu), "wsg>1 and compact are mutually exclusive"
    # ref order: inputs..., outputs (out, [stats]), scratches — pop the
    # scratch first, then the trailing stats OUTPUT (gb, tq, 2h): per-row
    # softmax max (lane hi) and denominator (lane h+hi), saved for the
    # MLAFF_BWD_SAVED backward (drops the bwd's max/sum lane reductions)
    if wsg > 1:
        refs, scratch_lg = refs[:-1], refs[-1]
    if cu:
        refs, scratch_kv = refs[:-1], refs[-1]
    if stats:
        refs, stats_ref = refs[:-1], refs[-1]
    (q_ref, posq_ref, get_kv, get_pos, col0, valids, tail,
     col_cluster) = _unpack_refs(refs, nb, wb, cu, cbs, scratch_kv, sbands)
    if drop_rate > 0.0:
        (ncc_ref, wpe_ref, bpe_ref, bk_ref, bv_ref, seed_ref,
         out_ref) = tail
    else:
        ncc_ref, wpe_ref, bpe_ref, bk_ref, bv_ref, out_ref = tail
        seed_ref = None
    nbands = max(nb, 1)
    gb = q_ref.shape[0]  # images per kernel instance
    tq = q_ref.shape[1]
    c = q_ref.shape[2]
    nnc = ncc_ref.shape[2]
    c_ = c // h
    prec = jax.lax.Precision.HIGHEST if hiprec else None

    def head_bias(hi, dx, dy, dist, sinp, cosp):
        # 5 madds over the table features (dx, dy, dist, sin, cos) — the
        # inv-folded planes are computed ONCE per geometry (want_feat) and
        # shared by every head, instead of re-folding *inv per head
        w0 = wpe_ref[0, hi].astype(jnp.float32)
        w1 = wpe_ref[1, hi].astype(jnp.float32)
        w2 = wpe_ref[2, hi].astype(jnp.float32)
        w3 = wpe_ref[3, hi].astype(jnp.float32)
        w4 = wpe_ref[4, hi].astype(jnp.float32)
        return (w0 * dx + w1 * dy + w2 * dist + w3 * sinp + w4 * cosp
                + bpe_ref[hi])

    def band_geometry(bi, j):
        pxk, pyk = get_pos(j, bi)
        g = _geometry(
            posq_ref, pxk, pyk, ncc_ref, bi, tq,
            wb, col0(j, bi), cs, n_valid,
            rel_width, clamp_hi, nnc, want_feat=True,
            col_cluster=col_cluster,
        )
        if valids[j] is not None:
            g = g[:4] + (g[4] & valids[j],) + g[5:]
        return g

    def bias_planes(g):
        return [head_bias(hi, g[0], g[1], g[5], g[6], g[7])
                for hi in range(h)]

    # batch-invariant path (on-grid stage): pos/ncc are identical for every
    # image of the instance, so geometry, membership and the per-head bias
    # planes are computed ONCE instead of gb times (~halves VPU work).
    # The mask is folded INTO the bias plane (non-member slots get NEG_INF):
    # per image that turns select+add into one add, and the post-exp mask
    # becomes free — exp(x + NEG_INF - mx) underflows to exactly 0.0.
    if batch_inv:
        geos = [band_geometry(0, j) for j in range(nbands)]
        per_geo = [bias_planes(g) for g in geos]  # [band][head]
        biases = [
            [jnp.where(g[4], pg[hi], NEG_INF)
             for g, pg in zip(geos, per_geo)]
            for hi in range(h)
        ]

    # opt-in row-stacked variant of the batch-invariant path: run each
    # VPU softmax chain over wsg images' rows at once (same move as the
    # stacked dense path, which won mini +3.3% / Small +6%). Matmuls stay
    # per image (K/V differ); the per-image logit planes are staged into a
    # (nbands, wsg*tq, Wb) f32 VMEM scratch at STATIC row offsets, so the
    # max/exp/sum/div chain reads one tall plane per band. An earlier form
    # built the tall planes with jnp.concatenate over per-image slices —
    # Mosaic's compile time exploded on the concat-of-slices graphs
    # (>29 min, abandoned; PERF.md batch T) — scratch stores replace it.
    if wsg > 1 and scratch_lg is not None:
        for b0 in range(0, gb, wsg):
            for hi in range(h):
                # tall Q block: static slice + leading-dim collapse
                q_tall = q_ref[b0:b0 + wsg, :, hi * c_:(hi + 1) * c_].reshape(
                    wsg * tq, c_)
                for j in range(nbands):
                    for o in range(wsg):
                        lg = jax.lax.dot_general(
                            q_ref[b0 + o, :, hi * c_:(hi + 1) * c_],
                            get_kv(j, b0 + o, 2 * hi * c_,
                                   (2 * hi + 1) * c_),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec,
                        )  # (tq, Wb)
                        scratch_lg[j, o * tq:(o + 1) * tq, :] = (
                            lg + biases[hi][j]
                        )
                blank = jax.lax.dot_general(
                    q_tall, bk_ref[:, hi:hi + 1], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )  # (wsg*tq, 1)
                tall = [scratch_lg[j] for j in range(nbands)]
                mx = blank
                for lg in tall:
                    mx = jnp.maximum(mx, lg.max(axis=-1, keepdims=True))
                pb = jnp.exp(blank - mx)
                denom = pb
                ps = []
                for lg in tall:
                    p = jnp.exp(lg - mx)
                    ps.append(p)
                    denom = denom + p.sum(axis=-1, keepdims=True)
                if stats_ref is not None:
                    for o in range(wsg):
                        osl = slice(o * tq, (o + 1) * tq)
                        stats_ref[b0 + o, :, hi:hi + 1] = mx[osl]
                        stats_ref[b0 + o, :, h + hi:h + hi + 1] = denom[osl]
                # normalization folded into the narrow output (see the
                # core loop): AV runs on the raw exp planes, one
                # pinv multiply on (tq, c_) per image
                base_tall = pb * bv_ref[hi:hi + 1, :].astype(jnp.float32)
                pinv = 1.0 / denom
                for o in range(wsg):
                    acc = base_tall[o * tq:(o + 1) * tq, :]
                    for j, p in enumerate(ps):
                        v = get_kv(j, b0 + o, (2 * hi + 1) * c_,
                                   (2 * hi + 2) * c_)
                        acc = acc + jax.lax.dot_general(
                            p[o * tq:(o + 1) * tq, :].astype(v.dtype),
                            v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec,
                        )
                    acc = acc * pinv[o * tq:(o + 1) * tq, :]
                    out_ref[b0 + o, :, hi * c_:(hi + 1) * c_] = (
                        acc.astype(out_ref.dtype)
                    )
        return

    for bi in range(gb):
        if not batch_inv:
            geos = [band_geometry(bi, j) for j in range(nbands)]

        # --- per-head attention (MXU) over the shared geometry ---
        for hi in range(h):
            q = q_ref[bi, :, hi * c_:(hi + 1) * c_]  # (tq, c_)
            logits = []
            for j in range(nbands):
                k = get_kv(j, bi, 2 * hi * c_, (2 * hi + 1) * c_)
                lg = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )  # (tq, Wb)
                if batch_inv:
                    lg = lg + biases[hi][j]
                else:
                    g = geos[j]
                    lg = jnp.where(
                        g[4],
                        lg + head_bias(hi, g[0], g[1], g[5], g[6], g[7]),
                        NEG_INF,
                    )
                logits.append(lg)

            # blank logit on the MXU: q @ blank_k[:, hi]  (tq, 1)
            blank = jax.lax.dot_general(
                q, bk_ref[:, hi:hi + 1],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            mx = blank
            for lg in logits:
                mx = jnp.maximum(mx, lg.max(axis=-1, keepdims=True))
            ps = []
            denom = jnp.exp(blank - mx)  # pb numerator
            pb_num = denom
            for j, lg in enumerate(logits):
                p = jnp.exp(lg - mx)
                if not batch_inv:
                    p = jnp.where(geos[j][4], p, 0.0)
                ps.append(p)
                denom = denom + p.sum(axis=-1, keepdims=True)

            if stats_ref is not None:
                stats_ref[bi, :, hi:hi + 1] = mx
                stats_ref[bi, :, h + hi:h + hi + 1] = denom
            if seed_ref is not None:
                # attention-prob dropout after the softmax (reference
                # aff_transformer.py:148); blank slot uses reserved col
                seed0 = seed_ref[0]
                img = pl.program_id(0) * gb + bi
                row0 = pl.program_id(1) * tq
                pb_num = pb_num * _drop_keep(
                    seed0, img, hi, row0, 65535, tq, 1, drop_rate)
            # normalization folded into the NARROW (tq, c_) output
            # instead of each wide probability plane: saves one full
            # (tq, W) read+write per head — the r4d probes show these
            # stages are VMEM plane-traffic bound
            out = pb_num * bv_ref[hi:hi + 1, :].astype(jnp.float32)
            for j, p in enumerate(ps):
                v = get_kv(j, bi, (2 * hi + 1) * c_, (2 * hi + 2) * c_)
                if seed_ref is not None:
                    p = p * _drop_keep(
                        seed0, img, hi, row0, col0(j, bi), tq, wb,
                        drop_rate)
                out = out + jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
            out = out * (1.0 / denom)
            out_ref[bi, :, hi * c_:(hi + 1) * c_] = out.astype(out_ref.dtype)


def _fwd_kernel_stacked(q_ref, kv_ref, posq_ref, posk_ref, ncc_ref,
                        wpe_ref, bpe_ref, bk_ref, bv_ref, out_ref,
                        *maybe_stats, h: int, cs: int, n_valid: int,
                        np_: int, rel_width: int,
                        clamp_hi: Optional[int], hiprec: bool, gb: int,
                        split: bool = False):
    """Dense-path forward with the image group stacked along rows.

    The small-token stages (n <= 256: AFF stages 3/4) are bound by
    per-op fixed latency, not element work — the (tq, W) planes are a
    handful of vregs, and the per-(image, head) unrolled body costs ~2 us
    per iteration regardless of gb (see PERF.md). This variant receives
    q/pos/ncc with the image axis FOLDED INTO ROWS at the XLA level
    (padded to np_ rows per image, so every per-image row offset is
    sublane-aligned) and runs each VPU chain — geometry, membership,
    bias, exp, reductions, normalization — ONCE per head over the tall
    (gb*np_, np_) plane instead of once per (image, head). Only the QK/AV
    matmuls stay per image (K/V genuinely differ), their outputs
    concatenated along rows in-register. Padded query rows fall out
    masked (their neighborhoods are NEG_INF) and the caller slices them
    off.
    """
    stats_ref = maybe_stats[0] if maybe_stats else None  # (G, 2h) output
    G = gb * np_
    c = q_ref.shape[1]
    c_ = c // h
    nnc = ncc_ref.shape[1]
    prec = jax.lax.Precision.HIGHEST if hiprec else None
    # MLAFF_PROBE (perf decomposition only — breaks numerics): 'nobias'
    # drops the 5-madd rel-pos bias (keeps the mask), 'nogeom' drops
    # geometry+bias+mask entirely, 'nosm' replaces the softmax chain with
    # a copy. Used by scripts/bench_stage.py to attribute the stacked
    # path's ~10x-SOL gap between MXU issue, bias VPU work and the
    # softmax chain. Read at trace time; never set in production.
    probe = os.environ.get("MLAFF_PROBE", "")

    if "nogeom" not in probe:
        pxq = posq_ref[:, 0:1].astype(jnp.float32)  # (G, 1) sublane vec
        pyq = posq_ref[:, 1:2].astype(jnp.float32)
        # tall K-coordinate planes: per-image lane vectors broadcast down
        # their np_ row block and stacked (vreg moves, no relayout)
        pxk = jnp.concatenate(
            [jnp.broadcast_to(
                posk_ref[bi, 0, :].astype(jnp.float32)[None, :], (np_, np_))
             for bi in range(gb)], axis=0)
        pyk = jnp.concatenate(
            [jnp.broadcast_to(
                posk_ref[bi, 1, :].astype(jnp.float32)[None, :], (np_, np_))
             for bi in range(gb)], axis=0)
        dx = pxk - pxq
        dy = pyk - pyq
        if clamp_hi is not None:
            R = rel_width
            dx = jnp.clip(dx + R, 0, clamp_hi) - R
            dy = jnp.clip(dy + R, 0, clamp_hi) - R
        d2 = dx * dx + dy * dy
        inv = jnp.where(
            d2 > 0, jax.lax.rsqrt(jnp.where(d2 > 0, d2, 1.0)), 0.0)
        # inv-folded feature planes shared by every head (5-madd bias chain)
        dist = d2 * inv
        sinp = dy * inv
        cosp = dx * inv

        col_idx = jax.lax.broadcasted_iota(jnp.int32, (G, np_), 1)
        cc = col_idx // cs
        member = jnp.zeros((G, np_), jnp.bool_)
        for j in range(nnc):
            member = member | (cc == ncc_ref[:, j][:, None])
        member = member & (col_idx < n_valid)

    def head_bias(hi):
        if "nogeom" in probe:
            return 0.0
        if "nobias" in probe:
            return jnp.where(member, 0.0, NEG_INF)
        # mask folded into the bias plane: post-exp masking is free via
        # exp underflow, same trick as the batch-invariant path
        return jnp.where(
            member,
            wpe_ref[0, hi] * dx + wpe_ref[1, hi] * dy
            + wpe_ref[2, hi] * dist + wpe_ref[3, hi] * sinp
            + wpe_ref[4, hi] * cosp
            + bpe_ref[hi],
            NEG_INF,
        )

    def qk_head(hi):
        qh = q_ref[:, hi * c_:(hi + 1) * c_]  # (G, c_)
        if "nomm" in probe:  # skip the per-image MXU issue entirely
            return jnp.broadcast_to(qh[:, :1], (G, np_)), qh[:, :1]
        lgs = []
        for bi in range(gb):
            k = kv_ref[bi, :, 2 * hi * c_:(2 * hi + 1) * c_]
            lgs.append(jax.lax.dot_general(
                qh[bi * np_:(bi + 1) * np_, :], k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ))
        blank = jax.lax.dot_general(
            qh, bk_ref[:, hi:hi + 1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (G, 1) — one tall matmul, not per image
        return jnp.concatenate(lgs, axis=0), blank

    def softmax_head(lg_raw, blank, hi):
        lg = lg_raw + head_bias(hi)  # (G, np_)
        if "nosm" in probe:
            return lg * 1e-3, blank * 1e-3, blank * 0.0 + 1.0
        mx = jnp.maximum(blank, lg.max(axis=-1, keepdims=True))
        p = jnp.exp(lg - mx)
        pb = jnp.exp(blank - mx)
        denom = pb + p.sum(axis=-1, keepdims=True)
        if stats_ref is not None:
            # saved for the MLAFF_BWD_SAVED stacked backward
            stats_ref[:, hi:hi + 1] = mx
            stats_ref[:, h + hi:h + hi + 1] = denom
        # raw exp planes + pinv: normalization folds into the narrow
        # (G, c_) output in av_head (one full-plane pass saved per head
        # — these stages are VMEM plane-traffic bound, r4d probes)
        return p, pb, 1.0 / denom

    def av_head(pn, pbn, pinv, hi):
        if "nomm" in probe:
            out_ref[:, hi * c_:(hi + 1) * c_] = (
                pn[:, :c_] + pbn
            ).astype(out_ref.dtype)
            return
        outs = []
        for bi in range(gb):
            v = kv_ref[bi, :, (2 * hi + 1) * c_:(2 * hi + 2) * c_]
            outs.append(jax.lax.dot_general(
                pn[bi * np_:(bi + 1) * np_, :].astype(v.dtype), v,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ))
        o = jnp.concatenate(outs, axis=0)
        o = (o + pbn * bv_ref[hi:hi + 1, :].astype(jnp.float32)) * pinv
        out_ref[:, hi * c_:(hi + 1) * c_] = o.astype(out_ref.dtype)

    if not split:
        for hi in range(h):
            lg_raw, blank = qk_head(hi)
            pn, pbn, pinv = softmax_head(lg_raw, blank, hi)
            av_head(pn, pbn, pinv, hi)
        return

    # phase-split (MLAFF_SSPLIT): the interleaved per-head loop serializes
    # dependent MXU->VPU->MXU chains — at the small-token stages the
    # per-(image, head) matmuls cost ~fixed issue/latency, not MACs (see
    # PERF.md roofline: stacked stage-3 sits ~10x over its SOL). Issuing
    # ALL QK matmuls first lets the MXU stream them back to back; the VPU
    # then walks the h logits planes; the AV matmuls stream last. Costs
    # (h+1) live (G, np_) f32 planes of scoped VMEM — the caller's gb
    # budget accounts for them.
    lgs_all = [qk_head(hi) for hi in range(h)]
    pns_all = [
        softmax_head(lg_raw, blank, hi)
        for hi, (lg_raw, blank) in enumerate(lgs_all)
    ]
    for hi, (pn, pbn, pinv) in enumerate(pns_all):
        av_head(pn, pbn, pinv, hi)


def _bwd_kernel_stacked(q_ref, kv_ref, posq_ref, posk_ref, ncc_ref,
                        wpe_ref, bpe_ref, bk_ref, bv_ref, gout_ref,
                        *rest, h: int, cs: int, n_valid: int, np_: int,
                        rel_width: int, clamp_hi: Optional[int],
                        hiprec: bool, gb: int, sv: bool = False):
    """Row-stacked backward for the small-token dense stages.

    The plain ``_bwd_kernel`` at np_ <= 256 pays the same per-(image,
    head) chain-issue tax the stacked FORWARD eliminated (r2 chip A/B:
    mini +3.3%, Small +6%) — the r4b train profile shows the stage-3
    backward at 2.87 ms/block vs the stacked forward's 0.67. Mirror of
    ``_fwd_kernel_stacked``: the image group is folded into rows at the
    XLA level, every VPU chain — geometry, softmax recompute, the
    softmax jacobian, the dpe reductions — runs ONCE per head over the
    tall (gb*np_, np_) plane; only the QK/AV/dq/dkv matmuls stay per
    image. Padded rows carry zero g_out, so their dkv/dpe/dblank
    contributions are exact zeros. dkv accumulates per-head in f32
    VMEM (deterministic, no atomics — reference scatter:
    ``clustenqk_cuda_kernel.cu:125``)."""
    if sv:
        # saved-residual inputs (fwd output + softmax stats) follow g_out
        outp_ref, stats_ref = rest[0], rest[1]
        dq_ref, dkv_ref, dpe_ref, dblank_ref = rest[2:]
    else:
        outp_ref = stats_ref = None
        dq_ref, dkv_ref, dpe_ref, dblank_ref = rest
    G = gb * np_
    c = q_ref.shape[1]
    c_ = c // h
    nnc = ncc_ref.shape[1]
    prec = jax.lax.Precision.HIGHEST if hiprec else None

    pxq = posq_ref[:, 0:1].astype(jnp.float32)
    pyq = posq_ref[:, 1:2].astype(jnp.float32)
    pxk = jnp.concatenate(
        [jnp.broadcast_to(
            posk_ref[bi, 0, :].astype(jnp.float32)[None, :], (np_, np_))
         for bi in range(gb)], axis=0)
    pyk = jnp.concatenate(
        [jnp.broadcast_to(
            posk_ref[bi, 1, :].astype(jnp.float32)[None, :], (np_, np_))
         for bi in range(gb)], axis=0)
    dx = pxk - pxq
    dy = pyk - pyq
    if clamp_hi is not None:
        R = rel_width
        dx = jnp.clip(dx + R, 0, clamp_hi) - R
        dy = jnp.clip(dy + R, 0, clamp_hi) - R
    d2 = dx * dx + dy * dy
    inv = jnp.where(d2 > 0, jax.lax.rsqrt(jnp.where(d2 > 0, d2, 1.0)), 0.0)
    dist = d2 * inv
    sinp = dy * inv
    cosp = dx * inv

    col_idx = jax.lax.broadcasted_iota(jnp.int32, (G, np_), 1)
    cc = col_idx // cs
    member = jnp.zeros((G, np_), jnp.bool_)
    for j in range(nnc):
        member = member | (cc == ncc_ref[:, j][:, None])
    member = member & (col_idx < n_valid)

    row_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    dpe_tile = jnp.zeros((8, 128), jnp.float32)
    # per-head dk/dv touch disjoint channel blocks of the (h, 2, c_)
    # interleave — collect parts and write each image's dkv block once
    dkv_parts = [[None] * (2 * h) for _ in range(gb)]
    dbks, dbvs = [], []

    for hi in range(h):
        qh = q_ref[:, hi * c_:(hi + 1) * c_]  # (G, c_)
        goh = gout_ref[:, hi * c_:(hi + 1) * c_]
        go32 = goh.astype(jnp.float32)
        md = kv_ref.dtype

        # --- forward recompute (identical math to _fwd_kernel_stacked) ---
        lgs = []
        for bi in range(gb):
            k = kv_ref[bi, :, 2 * hi * c_:(2 * hi + 1) * c_]
            lgs.append(jax.lax.dot_general(
                qh[bi * np_:(bi + 1) * np_, :], k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ))
        lg = jnp.concatenate(lgs, axis=0) + jnp.where(
            member,
            wpe_ref[0, hi] * dx + wpe_ref[1, hi] * dy
            + wpe_ref[2, hi] * dist + wpe_ref[3, hi] * sinp
            + wpe_ref[4, hi] * cosp + bpe_ref[hi],
            NEG_INF,
        )
        blank = jax.lax.dot_general(
            qh, bk_ref[:, hi:hi + 1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (G, 1)
        if sv:
            # saved stats skip the max/sum lane reductions. Padded rows
            # (row >= n in each image block) carry ZERO stats (the fwd's
            # (b, n, 2h) output is re-padded with zeros) — clamp the
            # denominator so pinv stays finite; their g_out rows are
            # zero, so every contribution still cancels exactly.
            mx = stats_ref[:, hi:hi + 1]
            denom = jnp.maximum(stats_ref[:, h + hi:h + hi + 1], 1e-30)
            p = jnp.exp(lg - mx)
            pb = jnp.exp(blank - mx)
            pinv = 1.0 / denom
        else:
            mx = jnp.maximum(blank, lg.max(axis=-1, keepdims=True))
            p = jnp.exp(lg - mx)
            pb = jnp.exp(blank - mx)
            pinv = 1.0 / (pb + p.sum(axis=-1, keepdims=True))
        # normalization folded into narrow row-scalings (see the core
        # bwd loop): p/pb stay raw, go' = pinv * go carries the scale
        go_s32 = go32 * pinv  # (G, c_)
        go_s = go_s32.astype(md)

        # --- softmax jacobian over the tall plane ---
        dpb = jax.lax.dot_general(
            go_s32, bv_ref[hi:hi + 1, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (G, 1) — pinv-scaled
        dps = []
        for bi in range(gb):
            v = kv_ref[bi, :, (2 * hi + 1) * c_:(2 * hi + 2) * c_]
            dps.append(jax.lax.dot_general(
                go_s[bi * np_:(bi + 1) * np_, :], v,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ))
        dp = jnp.concatenate(dps, axis=0)  # (G, np_) — pinv-scaled
        if sv:
            # flash delta trick (see the windowed branch): s equals
            # rowsum(go * out) over c_ — no (G, np_) product+reduce
            outh = outp_ref[:, hi * c_:(hi + 1) * c_].astype(jnp.float32)
            s = (go32 * outh).sum(axis=-1, keepdims=True)
        else:
            s = dpb * pb + (dp * p).sum(axis=-1, keepdims=True)
        us = s * pinv
        dl = p * (dp - us)  # (G, np_); 0 at non-member slots (p there 0)
        dlb = pb * (dpb - us)  # (G, 1)
        dlm = dl.astype(md)

        # --- dq / dkv: per-image matmuls on the row blocks ---
        dqs = []
        for bi in range(gb):
            sl = slice(bi * np_, (bi + 1) * np_)
            k = kv_ref[bi, :, 2 * hi * c_:(2 * hi + 1) * c_]
            dqs.append(jax.lax.dot_general(
                dlm[sl, :], k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ))
            dkw = jax.lax.dot_general(
                dlm[sl, :], qh[sl, :], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (np_, c_)
            dvw = jax.lax.dot_general(
                p[sl, :].astype(md), go_s[sl, :], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # go_s carries the pinv row scale
            dkv_parts[bi][2 * hi] = dkw
            dkv_parts[bi][2 * hi + 1] = dvw
        dq = jnp.concatenate(dqs, axis=0) + dlb * bk_ref[:, hi].astype(
            jnp.float32)[None, :]
        dq_ref[:, hi * c_:(hi + 1) * c_] = dq.astype(dq_ref.dtype)

        # --- dpe: one tall reduce per feature (was per image) ---
        for f, plane in enumerate((dx, dy, dist, sinp, cosp)):
            val = (dl * plane).sum()
            dpe_tile = dpe_tile + jnp.where(
                (row_i == f) & (lane_i == hi), val, 0.0
            )
        dpe_tile = dpe_tile + jnp.where(
            (row_i == 5) & (lane_i == hi), dl.sum(), 0.0
        )

        # --- blank grads over the tall rows ---
        dbks.append(jax.lax.dot_general(
            qh.astype(jnp.float32), dlb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ))  # (c_, 1)
        dbvs.append(jax.lax.dot_general(
            go_s32, pb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ))

    for bi in range(gb):
        dkv_ref[bi] = jnp.concatenate(dkv_parts[bi], axis=1)
    dblank_ref[0] = jnp.concatenate(
        [jnp.concatenate(dbks, axis=1), jnp.concatenate(dbvs, axis=1)],
        axis=0,
    )
    dpe_ref[...] = dpe_tile[None]


def _pad_rows(x, np_):
    n = x.shape[1]
    if np_ == n:
        return x
    pad = [(0, 0)] * x.ndim
    pad[1] = (0, np_ - n)
    return jnp.pad(x, pad)


def _gb_for(b: int, per_image_bytes: int, budget: int, cap: int = 16,
            h: int = 1, np_: int = 0) -> int:
    """Images per kernel instance. Besides the VMEM budget, bound the
    unrolled body size (gb * h iterations): Mosaic compile time grows
    superlinearly with it, and models with many distinct kernel shapes
    (MaskFiner: 7 backbones) otherwise take an hour to compile.

    The bound is shape-aware: small-token stages (np_ <= 256 — AFF
    stages 3/4) have tiny per-iteration plane bodies and are unroll-count
    bound, so they get a 6x higher budget (measured at Small shapes,
    b128: n=196 h=12 3.18 -> 3.00 ms, n=49 h=24 3.32 -> 2.54 ms with
    gb 16; while the wide n=784 stage REGRESSES 6.22 -> 6.83 under the
    same raise, hence the np_ gate). ``MLAFF_GBH`` overrides the bound;
    ``MLAFF_GB_CAP`` hard-caps gb for experiments."""
    default = "64" if (np_ == 0 or np_ > 256) else "384"
    gbh = int(os.environ.get("MLAFF_GBH", default))
    cap = min(cap, max(1, gbh // max(h, 1)))
    env = os.environ.get("MLAFF_GB_CAP")
    if env:
        cap = min(cap, int(env))
    gb = 1
    while (
        gb < cap
        and gb * 2 <= b
        and b % (gb * 2) == 0
        and (gb * 2) * per_image_bytes <= budget
    ):
        gb *= 2
    return gb


def _attention_fwd_impl(q, kv, ncc, pos, pe_kernel, pe_bias, blank_k,
                        blank_v, h, cs, rel_width, clamp_width,
                        static_ncc=None, drop=None, want_stats=False):
    """``want_stats`` (windowed non-compact path only): additionally
    return the per-row softmax (max, denom) as a (b, n, 2h) f32 tensor
    for the MLAFF_BWD_SAVED backward; other paths return ``None`` stats.
    Only the differentiation wrapper asks for stats, so inference
    programs are untouched."""
    b, n, c = q.shape
    nnc = ncc.shape[-1]
    kk = -(-n // cs)
    np_ = kk * cs
    pos_q = pos  # query positions stay unpadded (match q/ncc row count)
    route = _route(n, np_, cs, static_ncc, drop, bwd=False)
    tq, window, compact = route.tq, route.window, route.compact
    clamp_hi = clamp_width - 1 if clamp_width else None
    hiprec = q.dtype == jnp.float32

    if compact:
        _, cu, cbs, np_, starts_np, clc_np, posc_np = window
        ucs = cu * cbs
        budget_mb = int(os.environ.get("MLAFF_WIN_BUDGET_MB", "16"))
        # resident K/V + the compact scratch copy per image
        gb = _gb_for(
            b, (np_ + ucs) * 2 * c * kv.dtype.itemsize,
            budget_mb * 1024 * 1024, h=h,
        )
        nb, Wb = 0, ucs
    elif window is not None:
        nb, Wb, np_, offs_np = window  # K/V padded so windows stay in bounds
        # K/V and K-positions stay RESIDENT in VMEM per image group (their
        # index maps ignore the tile dim, so Pallas fetches them once per
        # group, not per tile — windows re-streamed per tile cost ~8x the
        # HBM traffic); the kernel slices each tile's bands in-VMEM.
        # The budget bounds gb * resident bytes: wider-channel models
        # (Small c=96) halve gb under the 16MB default, losing per-group
        # amortization — MLAFF_WIN_BUDGET_MB raises it for experiments.
        budget_mb = int(os.environ.get("MLAFF_WIN_BUDGET_MB", "16"))
        gb = _gb_for(b, np_ * (2 * c * kv.dtype.itemsize + 2 * 4),
                     budget_mb * 1024 * 1024, h=h)
    else:
        # static K-bands (route.nb > 0): >2048-lane dense stages split
        # each compute plane into nb (tq, Wb) bands (see _kband_split);
        # np_ grows to the banded padding and padded cols mask via n_valid
        nb, Wb, np_ = route.nb, route.wb, route.np_
        # dense K/V per image; batching amortizes per-instance overhead
        # (the small-n stages are otherwise launch-bound)
        gb = _gb_for(b, np_ * 2 * c * 2, 8 * 1024 * 1024, h=h, np_=np_)

    # stacked dense path for the small-token stages (see
    # _fwd_kernel_stacked and the gate in _route). DEFAULT ON since the
    # chip A/B (R2N-C1/C4, 2026-08-19): mini fwd 2556 vs 2475, Small
    # 1019 vs 961 img/s; stacked-vs-plain parity is exactly 0.0 on chip
    # (scripts/parity_stack.py). MLAFF_STACK=0 restores the plain path;
    # MLAFF_STACK_NMAX raised 256 -> 800 after the r4 pinv folding
    # flipped the stage-2 result (r4h-7/r4i-9: mini 3187.4 -> 3231.4).
    stacked = route.stacked
    # DEFAULT ON since the r3f chip A/B (2026-08-21): mini fwd 2820.4 vs
    # 2800.6 (+0.7%), Small 1048.6 vs 1046.4 — the phase-split lets the
    # MXU stream the per-(image, head) matmuls. MLAFF_SSPLIT=0 restores
    # the interleaved per-head chains.
    ssplit = stacked and os.environ.get("MLAFF_SSPLIT", "1") == "1"
    if stacked:
        per_img = np_ * 2 * c * 2 + np_ * np_ * 4 * 4
        if ssplit:
            # phase-split keeps (h+1) logits/prob planes live at once
            per_img += (h + 1) * np_ * np_ * 4
        gb = _gb_for(b, per_img, 40 * 1024 * 1024, h=h, np_=np_)
        # dedicated cap: at np_ > 256 the tall f32 planes bust Mosaic's
        # 100 MB scoped-VMEM stack at gb=4 (measured: 106 MB at n=784) —
        # MLAFF_STACK_GB bounds only this path (MLAFF_GB_CAP is global
        # and would also throttle the windowed stage-1 group size)
        env = os.environ.get("MLAFF_STACK_GB")
        if env:
            gb = min(gb, int(env))
            while b % gb:
                gb -= 1

    # traced-window path for large data-dependent stages (see
    # _traced_window): per-(image, tile) K/V bands from the traced ncc,
    # lax.cond fallback to the dense path when any span overflows
    twin = None
    if route.twin:
        ttq = _twin_tile(n)
        if ttq is not None:
            wt, offs128, ok = _traced_window(ncc, n, np_, cs, ttq)
            if wt is not None:
                twin = (ttq, wt, offs128, ok)

    kv_p = _pad_rows(kv, np_)
    pos_p = _pad_rows(pos, np_)

    # row-stacked batch-invariant variant (MLAFF_WSTACK=k): only on the
    # windowed on-grid path; needs a logits scratch plane (see _fwd_kernel).
    # DEFAULT ON since the batch-U/V chip A/Bs (2026-08-20): mini fwd
    # 2682.6 -> 2728.0 -> 2776.5 -> 2799.5 img/s at wsg 1/2/4/8 (c=32);
    # Small 1032.4 -> 1044.8 at wsg 2 (c=96, wider heads stack less).
    # MLAFF_WSTACK overrides for experiments (MLAFF_WSTACK=1 restores the
    # per-image chain).
    wsg = 1
    if route.wsg_ok:
        env_wsg = os.environ.get("MLAFF_WSTACK")
        req = max(1, int(env_wsg)) if env_wsg else (8 if c <= 64 else 2)
        wsg = req
        while wsg > 1 and gb % wsg:
            wsg -= 1  # snap down to a divisor of the image group
        # The (nbands, wsg*tq, Wb) f32 logits scratch is per kernel
        # instance and comes on top of the resident K/V + K-pos blocks;
        # keep their sum under Mosaic's scoped-VMEM stack (100 MB compiler
        # limit, headroom for q/out tiles and the softmax chain).
        resident = gb * np_ * (2 * c * kv.dtype.itemsize + 2 * 4)
        limit = 72 * 1024 * 1024
        while wsg > 1 and max(nb, 1) * wsg * tq * Wb * 4 + resident > limit:
            wsg -= 1
            while wsg > 1 and gb % wsg:
                wsg -= 1
        if wsg != req and b > 1:
            # b == 1 (init/eval_shape traces) always snaps to gb=1 — only a
            # real batch's snap-down can mislabel a benchmark (ADVICE r2)
            logging.getLogger(__name__).warning(
                "MLAFF_WSTACK: effective wsg=%d (requested %d; gb=%d, "
                "scratch budget)", wsg, req, gb,
            )

    sbands = window is None and nb > 0
    kernel = functools.partial(
        _fwd_kernel, h=h, cs=cs, n_valid=n, rel_width=rel_width,
        clamp_hi=clamp_hi, hiprec=hiprec, nb=nb, wb=Wb,
        batch_inv=static_ncc is not None,
        cu=cu if compact else 0, cbs=cbs if compact else 0, wsg=wsg,
        sbands=sbands, drop_rate=drop[0] if drop is not None else 0.0,
    )
    out_shape = jax.ShapeDtypeStruct((b, n, c), q.dtype)
    pos_t = pos_p.transpose(0, 2, 1)
    if sbands:
        # per-band K-position rows (gb, 2*nb, Wb): keeps every operand's
        # lane dim inside the validated width (see _kband_split)
        pos_t = pos_t.reshape(b, 2, nb, Wb).transpose(0, 2, 1, 3).reshape(
            b, 2 * nb, Wb)
    tail_operands = (
        pe_kernel.astype(jnp.float32), pe_bias.astype(jnp.float32),
        blank_k.astype(q.dtype), blank_v.astype(jnp.float32),
    )
    tail_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # (5, h) pos_embed weights
        pl.BlockSpec(memory_space=pltpu.SMEM),  # (h,) pos_embed bias
        pl.BlockSpec(memory_space=pltpu.VMEM),  # blank_k (c_, h)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # blank_v (h, c_)
    ]
    if drop is not None:
        # dropout seed rides SMEM; appended last so the no-drop program
        # (operands, hash) is byte-identical to before — cache preserved
        tail_operands = tail_operands + (drop[1].astype(jnp.int32),)
        tail_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024
    )

    if stacked:
        skernel = functools.partial(
            _fwd_kernel_stacked, h=h, cs=cs, n_valid=n, np_=np_,
            rel_width=rel_width, clamp_hi=clamp_hi, hiprec=hiprec, gb=gb,
            split=ssplit,
        )
        q_s = _pad_rows(q, np_).reshape(b * np_, c)
        posq_s = _pad_rows(pos_q, np_).reshape(b * np_, 2)
        ncc_s = _pad_rows(ncc, np_).reshape(b * np_, nnc)
        res = pl.pallas_call(
            skernel,
            grid=(b // gb,),
            interpret=_interpret(),
            compiler_params=compiler_params,
            in_specs=[
                pl.BlockSpec((gb * np_, c), lambda bi: (bi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, np_, 2 * c), lambda bi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb * np_, 2), lambda bi: (bi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, 2, np_), lambda bi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb * np_, nnc), lambda bi: (bi, 0),
                             memory_space=pltpu.VMEM),
                *tail_specs,
            ],
            out_specs=(
                [pl.BlockSpec((gb * np_, c), lambda bi: (bi, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((gb * np_, 2 * h), lambda bi: (bi, 0),
                              memory_space=pltpu.VMEM)]
                if want_stats else
                pl.BlockSpec((gb * np_, c), lambda bi: (bi, 0),
                             memory_space=pltpu.VMEM)
            ),
            out_shape=(
                [jax.ShapeDtypeStruct((b * np_, c), q.dtype),
                 jax.ShapeDtypeStruct((b * np_, 2 * h), jnp.float32)]
                if want_stats else
                jax.ShapeDtypeStruct((b * np_, c), q.dtype)
            ),
        )(q_s, kv_p, posq_s, pos_t, ncc_s, *tail_operands)
        if want_stats:
            out = res[0].reshape(b, np_, c)[:, :n, :]
            stats = res[1].reshape(b, np_, 2 * h)[:, :n, :]
            return out, stats
        return res.reshape(b, np_, c)[:, :n, :]

    if compact:
        # Resident K/V (fetched once per image group) + per-tile compact
        # union scratch: the scalar-prefetched block starts drive in-VMEM
        # copies; K positions / column cluster ids are host-precomputed
        # per-tile lane-vector tables (see _static_compact).
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // gb, n // tq),
            in_specs=[
                pl.BlockSpec((gb, tq, c),
                             lambda bi, ti, sts: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, np_, 2 * c),
                             lambda bi, ti, sts: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, tq, 2),
                             lambda bi, ti, sts: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, ucs),
                             lambda bi, ti, sts: (ti, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, ucs),
                             lambda bi, ti, sts: (ti, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, tq, nnc),
                             lambda bi, ti, sts: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                *tail_specs,
            ],
            out_specs=pl.BlockSpec(
                (gb, tq, c), lambda bi, ti, sts: (bi, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((gb, ucs, 2 * c), kv_p.dtype)],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            interpret=_interpret(),
            compiler_params=compiler_params,
            out_shape=out_shape,
        )(jnp.asarray(starts_np), q, kv_p, pos_q, jnp.asarray(clc_np),
          jnp.asarray(posc_np), ncc, *tail_operands)
        return (out, None) if want_stats else out

    if window is not None:
        # Resident K/V: full blocks with tile-invariant index maps (one
        # fetch per image group); the per-tile, 128-quantized band starts
        # arrive via scalar prefetch and the kernel slices bands in-VMEM
        # with pl.ds. −1 band slots clamp to block 0 and are masked.
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // gb, n // tq),
            in_specs=[
                pl.BlockSpec((gb, tq, c),
                             lambda bi, ti, offs: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, np_, 2 * c),
                             lambda bi, ti, offs: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, tq, 2),
                             lambda bi, ti, offs: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, 2, np_),
                             lambda bi, ti, offs: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, tq, nnc),
                             lambda bi, ti, offs: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                *tail_specs,
            ],
            out_specs=(
                [pl.BlockSpec((gb, tq, c),
                              lambda bi, ti, offs: (bi, ti, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((gb, tq, 2 * h),
                              lambda bi, ti, offs: (bi, ti, 0),
                              memory_space=pltpu.VMEM)]
                if want_stats else
                pl.BlockSpec((gb, tq, c),
                             lambda bi, ti, offs: (bi, ti, 0),
                             memory_space=pltpu.VMEM)
            ),
            scratch_shapes=(
                [pltpu.VMEM((max(nb, 1), wsg * tq, Wb), jnp.float32)]
                if wsg > 1 else []
            ),
        )
        wkern = (
            functools.partial(kernel, stats=True) if want_stats else kernel
        )
        res = pl.pallas_call(
            wkern,
            grid_spec=grid_spec,
            interpret=_interpret(),
            compiler_params=compiler_params,
            out_shape=(
                [out_shape,
                 jax.ShapeDtypeStruct((b, n, 2 * h), jnp.float32)]
                if want_stats else out_shape
            ),
        )(jnp.asarray(offs_np), q, kv_p, pos_q, pos_t, ncc, *tail_operands)
        return (res[0], res[1]) if want_stats else res

    # Query-row padding for unfactorable dense stages (see _dense_pad_tile):
    # only when the whole token axis would otherwise be ONE tile. Disabled
    # under the twin cond (both cond branches must return the same shape).
    nq = n
    q_d, posq_d, ncc_d = q, pos_q, ncc
    if twin is None and not stacked and tq >= n and n > 512:
        nq, tq = _dense_pad_tile(n, np_, planes=10)
        q_d = _pad_rows(q, nq)
        posq_d = _pad_rows(pos_q, nq)
        ncc_d = _pad_rows(ncc, nq)

    def _dense_call(_):
        return pl.pallas_call(
            kernel,
            grid=(b // gb, nq // tq),
            interpret=_interpret(),
            compiler_params=compiler_params,
            in_specs=[
                pl.BlockSpec((gb, tq, c), lambda bi, ti: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, np_, 2 * c), lambda bi, ti: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, tq, 2), lambda bi, ti: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (gb, 2 * nb, Wb) if sbands else (gb, 2, np_),
                    lambda bi, ti: (bi, 0, 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, tq, nnc), lambda bi, ti: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                *tail_specs,
            ],
            out_specs=pl.BlockSpec(
                (gb, tq, c), lambda bi, ti: (bi, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=(jax.ShapeDtypeStruct((b, nq, c), q.dtype)
                       if nq != n else out_shape),
        )(q_d, kv_p, posq_d, pos_t, ncc_d, *tail_operands)

    if twin is None:
        out = _dense_call(None)
        out = out[:, :n] if nq != n else out
        return (out, None) if want_stats else out

    ttq, wt, offs128, ok = twin
    np128 = -(-np_ // 128) * 128
    gbw = _gb_for(b, np128 * (2 * c * kv.dtype.itemsize + 2 * 4),
                  16 * 1024 * 1024, h=h)
    kv_pw = _pad_rows(kv, np128)
    pos_tw = _pad_rows(pos, np128).transpose(0, 2, 1)
    wkernel = functools.partial(
        _fwd_kernel, h=h, cs=cs, n_valid=n, rel_width=rel_width,
        clamp_hi=clamp_hi, hiprec=hiprec, nb=1, wb=wt, batch_inv=False,
    )
    ntw = n // ttq
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // gbw, ntw),
        in_specs=[
            pl.BlockSpec((gbw, ttq, c), lambda bi, ti, offs: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gbw, np128, 2 * c),
                         lambda bi, ti, offs: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gbw, ttq, 2), lambda bi, ti, offs: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gbw, 2, np128), lambda bi, ti, offs: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gbw, ttq, nnc), lambda bi, ti, offs: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            *tail_specs,
        ],
        out_specs=pl.BlockSpec(
            (gbw, ttq, c), lambda bi, ti, offs: (bi, ti, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    def _twin_call(_):
        return pl.pallas_call(
            wkernel,
            grid_spec=grid_spec,
            interpret=_interpret(),
            compiler_params=compiler_params,
            out_shape=out_shape,
        )(offs128.reshape(b // gbw, gbw, ntw), q, kv_pw, pos_q, pos_tw,
          ncc, *tail_operands)

    out = jax.lax.cond(ok, _twin_call, _dense_call, 0)
    return (out, None) if want_stats else out


def _bwd_kernel(*refs, h: int, cs: int, n_valid: int, rel_width: int,
                clamp_hi: Optional[int], hiprec: bool, nb: int, wb: int,
                batch_inv: bool, cu: int = 0, cbs: int = 0,
                sbands: bool = False, drop_rate: float = 0.0,
                wsg: int = 1, sv: bool = False):
    """Fused backward: recomputes the forward softmax per query tile (flash
    style — nothing but the inputs is saved), then produces dq per tile and
    accumulates dkv / d_pos-embed / d_blank into per-image-group VMEM
    blocks across the sequential query-tile grid (the reference's
    ``fastAtomicAdd`` scatters become in-VMEM accumulation — deterministic
    by construction).

    Compact mode: dk/dv accumulate into a compact fp32 scratch shaped like
    the compact K/V; an epilogue scatters its union blocks back into the
    resident dkv block (padded union slots hold exact zeros — their
    softmax probabilities are masked to 0 — so their clamped-to-0 target
    rows are unharmed)."""
    scratch_kv = dkvc_ref = scratch_lg = scratch_dp = None
    assert not (wsg > 1 and cu), "wsg>1 and compact are mutually exclusive"
    if wsg > 1:
        refs, scratch_lg, scratch_dp = refs[:-2], refs[-2], refs[-1]
    if cu:
        refs, scratch_kv, dkvc_ref = refs[:-2], refs[-2], refs[-1]
    starts_ref = refs[0] if cu else None
    (q_ref, posq_ref, get_kv, get_pos, col0, valids, tail,
     col_cluster) = _unpack_refs(refs, nb, wb, cu, cbs, scratch_kv, sbands)
    outp_ref = stats_ref = None
    if drop_rate > 0.0:
        (ncc_ref, wpe_ref, bpe_ref, bk_ref, bv_ref, seed_ref, gout_ref,
         dq_ref, dkv_ref, dpe_ref, dblank_ref) = tail
    elif sv:
        # saved-residual inputs (fwd output + softmax stats) follow g_out
        (ncc_ref, wpe_ref, bpe_ref, bk_ref, bv_ref, gout_ref, outp_ref,
         stats_ref, dq_ref, dkv_ref, dpe_ref, dblank_ref) = tail
        seed_ref = None
    else:
        (ncc_ref, wpe_ref, bpe_ref, bk_ref, bv_ref, gout_ref,
         dq_ref, dkv_ref, dpe_ref, dblank_ref) = tail
        seed_ref = None
    if cu:
        dkvc_ref[...] = jnp.zeros(dkvc_ref.shape, dkvc_ref.dtype)
    nbands = max(nb, 1)
    gb = q_ref.shape[0]
    tq = q_ref.shape[1]
    c = q_ref.shape[2]
    nnc = ncc_ref.shape[2]
    c_ = c // h
    ti = pl.program_id(1)
    prec = jax.lax.Precision.HIGHEST if hiprec else None

    @pl.when(ti == 0)
    def _init_acc():
        dkv_ref[...] = jnp.zeros(dkv_ref.shape, dkv_ref.dtype)
        dpe_ref[...] = jnp.zeros(dpe_ref.shape, dpe_ref.dtype)
        dblank_ref[...] = jnp.zeros(dblank_ref.shape, dblank_ref.dtype)

    row_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    dpe_tile = jnp.zeros((8, 128), jnp.float32)
    # MLAFF_BPROBE (perf decomposition only — breaks numerics, mirror of
    # the forward's MLAFF_PROBE): 'nosm' drops the softmax-recompute
    # exp/max chain, 'nojac' drops the jacobian (s/dl) chain, 'nodq'
    # the dq matmuls, 'nodkv' the dkw/dvw matmuls + band accumulation,
    # 'nodpe' the d_pos-embed plane reduces. scripts/bench_stage1_bwd.py
    # uses these to attribute the stage-1 bwd cost. Trace-time only.
    bprobe = os.environ.get("MLAFF_BPROBE", "")

    def head_bias(hi, dx, dy, dist, sinp, cosp):
        # 5 madds over the table features; dist/sin/cos already exist for
        # the d_pe accumulation (want_feat=True) — shared across heads
        return (
            wpe_ref[0, hi] * dx + wpe_ref[1, hi] * dy
            + wpe_ref[2, hi] * dist + wpe_ref[3, hi] * sinp
            + wpe_ref[4, hi] * cosp
            + bpe_ref[hi]
        )

    def band_geometry(bi, j):
        pxk, pyk = get_pos(j, bi)
        g = _geometry(
            posq_ref, pxk, pyk, ncc_ref, bi, tq,
            wb, col0(j, bi), cs, n_valid,
            rel_width, clamp_hi, nnc, want_feat=True,
            col_cluster=col_cluster,
        )
        if valids[j] is not None:
            g = g[:4] + (g[4] & valids[j],) + g[5:]
        return g

    # batch-invariant hoist: see _fwd_kernel (same contract via static_ncc);
    # mask folded into the bias plane exactly as in the forward
    if batch_inv:
        geos = [band_geometry(0, j) for j in range(nbands)]
        biases = [
            [jnp.where(
                g[4], head_bias(hi, g[0], g[1], g[5], g[6], g[7]), NEG_INF)
             for g in geos]
            for hi in range(h)
        ]

    # row-stacked windowed BACKWARD (batch_inv contract; the bwd twin of
    # the forward's MLAFF_WSTACK move, r4b train profile: stage-1 bwd
    # 15.3 ms/block vs its wsg-stacked fwd 4.05): per-image logits and
    # dp planes are staged into tall (nbands, wsg*tq, Wb) f32 scratches
    # at static row offsets, and the softmax recompute + jacobian + dpe
    # chains run ONCE per head over wsg images' rows. QK/AV/dq/dkv
    # matmuls and the banded dkv accumulation stay per image.
    if wsg > 1 and scratch_lg is not None:
        # MLAFF_BWD_DKV_CAT=1: collect each image's per-head dkw/dvw
        # blocks and fold them into ONE full-width (wb, 2h*c_) banded
        # accumulate per image instead of 2h (wb, c_) 32-lane RMWs at
        # dynamic sublane offsets — the write-combining twin of the merge
        # kernel's v5 register-carry move (single-band windows only; the
        # same pattern the non-windowed kernel uses via dkv_parts).
        dkv_cat = (
            os.environ.get("MLAFF_BWD_DKV_CAT", "0") == "1"
            and nbands == 1
            and int(os.environ.get("MLAFF_BWD_DKV_OB", "1")) <= 1
            and "nodkv" not in bprobe and "dkvnomm" not in bprobe
        )
        for b0 in range(0, gb, wsg):
            cat_parts = (
                [[None] * (2 * h) for _ in range(wsg)] if dkv_cat else None
            )
            for hi in range(h):
                q_tall = q_ref[b0:b0 + wsg, :, hi * c_:(hi + 1) * c_].reshape(
                    wsg * tq, c_)
                go_tall = gout_ref[
                    b0:b0 + wsg, :, hi * c_:(hi + 1) * c_
                ].reshape(wsg * tq, c_)
                go32_tall = go_tall.astype(jnp.float32)
                md = get_kv(0, b0, 0, c_).dtype
                for j in range(nbands):
                    for o in range(wsg):
                        lg = jax.lax.dot_general(
                            q_ref[b0 + o, :, hi * c_:(hi + 1) * c_],
                            get_kv(j, b0 + o, 2 * hi * c_,
                                   (2 * hi + 1) * c_),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec,
                        )
                        scratch_lg[j, o * tq:(o + 1) * tq, :] = (
                            lg + biases[hi][j]
                        )
                blank = jax.lax.dot_general(
                    q_tall, bk_ref[:, hi:hi + 1], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )  # (wsg*tq, 1)
                tall_lg = [scratch_lg[j] for j in range(nbands)]
                if sv:
                    # saved stats: the fwd's (max, denom) rows replace the
                    # max/sum lane reductions over the (wsg*tq, Wb) planes
                    mx = stats_ref[
                        b0:b0 + wsg, :, hi:hi + 1
                    ].reshape(wsg * tq, 1)
                    denom = stats_ref[
                        b0:b0 + wsg, :, h + hi:h + hi + 1
                    ].reshape(wsg * tq, 1)
                    pb = jnp.exp(blank - mx)
                    ps = [jnp.exp(lg - mx) for lg in tall_lg]
                    pinv = 1.0 / denom
                elif "nosm" in bprobe:
                    pb = blank
                    ps = list(tall_lg)
                    pinv = jnp.full_like(blank, 1.0)
                else:
                    mx = blank
                    for lg in tall_lg:
                        mx = jnp.maximum(mx, lg.max(axis=-1, keepdims=True))
                    pb = jnp.exp(blank - mx)
                    denom = pb
                    ps = []
                    for lg in tall_lg:
                        p = jnp.exp(lg - mx)
                        ps.append(p)
                        denom = denom + p.sum(axis=-1, keepdims=True)
                    pinv = 1.0 / denom
                # normalization folded into narrow row-scalings (see
                # the core bwd loop): p/pb stay raw; the dp matmuls run
                # AFTER the recompute so they can consume go' = pinv*go
                go_s32_tall = go32_tall * pinv
                go_s_tall = go_s32_tall.astype(md)
                for j in range(nbands):
                    for o in range(wsg):
                        scratch_dp[j, o * tq:(o + 1) * tq, :] = (
                            jax.lax.dot_general(
                                go_s_tall[o * tq:(o + 1) * tq, :],
                                get_kv(j, b0 + o, (2 * hi + 1) * c_,
                                       (2 * hi + 2) * c_),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec,
                            )
                        )
                dpb = jax.lax.dot_general(
                    go_s32_tall, bv_ref[hi:hi + 1, :],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )  # (wsg*tq, 1) — pinv-scaled
                dps = [scratch_dp[j] for j in range(nbands)]
                if sv:
                    # flash delta trick: s = dpb*pb + sum(dp*p) equals
                    # rowsum(g_out * out) analytically (out = normalized
                    # attention output, saved by the fwd) — a (wsg*tq, c_)
                    # product+reduce instead of (wsg*tq, Wb) per band
                    outp_tall = outp_ref[
                        b0:b0 + wsg, :, hi * c_:(hi + 1) * c_
                    ].reshape(wsg * tq, c_).astype(jnp.float32)
                    s = (go32_tall * outp_tall).sum(axis=-1, keepdims=True)
                    us = s * pinv
                    dlb = pb * (dpb - us)
                    dls = [p * (dp - us) for p, dp in zip(ps, dps)]
                elif "nojac" in bprobe:
                    dlb = pb
                    dls = list(ps)
                else:
                    s = dpb * pb
                    for p, dp in zip(ps, dps):
                        s = s + (dp * p).sum(axis=-1, keepdims=True)
                    us = s * pinv
                    dlb = pb * (dpb - us)
                    dls = [p * (dp - us) for p, dp in zip(ps, dps)]

                # MLAFF_BWD_DKV_OB=k: batch the dkw/dvw matmuls over k
                # images via a block-diagonal right operand. The r5a
                # decomposition pins the dkv leg at ~6 ms of the 13.95 ms
                # stage-1 bwd — 7168 narrow (K=tq, N=c_) matmul ISSUES
                # per block, not MACs (theoretical MAC time 0.27 ms).
                # One (k*tq, Wb)^T @ (k*tq, k*c_) matmul replaces k*2
                # issues at k-fold zero-padding MAC waste — still far
                # under the issue overhead it removes.
                ob = int(os.environ.get("MLAFF_BWD_DKV_OB", "1"))
                while ob > 1 and wsg % ob:
                    ob -= 1
                if ob > 1 and "nodkv" not in bprobe:
                    k0 = 2 * hi * c_
                    v0 = (2 * hi + 1) * c_
                    rb = jax.lax.broadcasted_iota(
                        jnp.int32, (ob * tq, ob * c_), 0) // tq
                    cb = jax.lax.broadcasted_iota(
                        jnp.int32, (ob * tq, ob * c_), 1) // c_
                    diag = rb == cb
                    for g0 in range(0, wsg, ob):
                        rows = slice(g0 * tq, (g0 + ob) * tq)
                        q_blk = q_ref[
                            b0 + g0:b0 + g0 + ob, :, hi * c_:(hi + 1) * c_
                        ].reshape(ob * tq, c_)
                        q_diag = jnp.where(
                            diag,
                            jnp.concatenate([q_blk] * ob, axis=1), 0
                        ).astype(md)
                        g_blk = go_s_tall[rows]
                        g_diag = jnp.where(
                            diag,
                            jnp.concatenate([g_blk] * ob, axis=1), 0
                        ).astype(md)
                        for j, dl in enumerate(dls):
                            dkw_all = jax.lax.dot_general(
                                dl[rows].astype(md), q_diag,
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec,
                            )  # (Wb, ob*c_): column block oo = dkw_oo
                            dvw_all = jax.lax.dot_general(
                                ps[j][rows].astype(md), g_diag,
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec,
                            )
                            for oo in range(ob):
                                o = g0 + oo
                                c0b = col0(j, b0 + o)
                                csl = slice(oo * c_, (oo + 1) * c_)
                                dkv_ref[
                                    b0 + o, pl.ds(c0b, wb), k0:k0 + c_
                                ] = dkv_ref[
                                    b0 + o, pl.ds(c0b, wb), k0:k0 + c_
                                ] + dkw_all[:, csl]
                                dkv_ref[
                                    b0 + o, pl.ds(c0b, wb), v0:v0 + c_
                                ] = dkv_ref[
                                    b0 + o, pl.ds(c0b, wb), v0:v0 + c_
                                ] + dvw_all[:, csl]

                for o in range(wsg):
                    osl = slice(o * tq, (o + 1) * tq)
                    dq = dlb[osl] * bk_ref[:, hi].astype(jnp.float32)[None, :]
                    for j, dl in enumerate(dls):
                        dlm = dl[osl].astype(md)
                        k = get_kv(j, b0 + o, 2 * hi * c_,
                                   (2 * hi + 1) * c_)
                        if "nodq" not in bprobe:
                            dq = dq + jax.lax.dot_general(
                                dlm, k, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec,
                            )
                        if "nodkv" in bprobe or ob > 1:
                            continue
                        if "dkvnomm" in bprobe:
                            # keep the (wb, c_) ref accumulation, replace
                            # the matmuls with an 8-row stand-in (~tq/8 x
                            # cheaper) — separates matmul vs RMW cost
                            dkw = jax.lax.dot_general(
                                dlm[:8],
                                q_ref[b0 + o, :8, hi * c_:(hi + 1) * c_],
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec,
                            )
                            dvw = jax.lax.dot_general(
                                ps[j][osl][:8].astype(md), go_s_tall[osl][:8],
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec,
                            )
                        else:
                            dkw = jax.lax.dot_general(
                                dlm, q_ref[b0 + o, :, hi * c_:(hi + 1) * c_],
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec,
                            )
                            dvw = jax.lax.dot_general(
                                ps[j][osl].astype(md), go_s_tall[osl],
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec,
                            )  # go_s carries the pinv row scale
                        if dkv_cat:
                            cat_parts[o][2 * hi] = dkw
                            cat_parts[o][2 * hi + 1] = dvw
                            continue
                        k0 = 2 * hi * c_
                        v0 = (2 * hi + 1) * c_
                        c0b = col0(j, b0 + o)
                        dkv_ref[b0 + o, pl.ds(c0b, wb), k0:k0 + c_] = (
                            dkv_ref[b0 + o, pl.ds(c0b, wb), k0:k0 + c_]
                            + dkw
                        )
                        dkv_ref[b0 + o, pl.ds(c0b, wb), v0:v0 + c_] = (
                            dkv_ref[b0 + o, pl.ds(c0b, wb), v0:v0 + c_]
                            + dvw
                        )
                    dq_ref[b0 + o, :, hi * c_:(hi + 1) * c_] = (
                        dq.astype(dq_ref.dtype)
                    )

                # dpe: image-summed dl per band, then 5 plane reduces
                # (geometry is image-invariant under batch_inv)
                for j, dl in enumerate(dls):
                    if "nodpe" in bprobe:
                        break
                    dl_sum = dl[0:tq, :]
                    for o in range(1, wsg):
                        dl_sum = dl_sum + dl[o * tq:(o + 1) * tq, :]
                    g = geos[j]
                    for f, plane in enumerate(
                        (g[0], g[1], g[5], g[6], g[7])
                    ):
                        val = (dl_sum * plane).sum()
                        dpe_tile = dpe_tile + jnp.where(
                            (row_i == f) & (lane_i == hi), val, 0.0
                        )
                    dpe_tile = dpe_tile + jnp.where(
                        (row_i == 5) & (lane_i == hi), dl_sum.sum(), 0.0
                    )

                dbk = jax.lax.dot_general(
                    q_tall.astype(jnp.float32), dlb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                dbv = jax.lax.dot_general(
                    go_s32_tall, pb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                dblank_ref[0, 0:c_, hi:hi + 1] = (
                    dblank_ref[0, 0:c_, hi:hi + 1] + dbk
                )
                dblank_ref[0, c_:2 * c_, hi:hi + 1] = (
                    dblank_ref[0, c_:2 * c_, hi:hi + 1] + dbv
                )
            if dkv_cat and cat_parts[0][0] is not None:
                # one aligned full-width banded accumulate per image
                for o in range(wsg):
                    c0b = col0(0, b0 + o)
                    blk = jnp.concatenate(cat_parts[o], axis=1)
                    dkv_ref[b0 + o, pl.ds(c0b, wb), :] = (
                        dkv_ref[b0 + o, pl.ds(c0b, wb), :] + blk
                    )
        dpe_ref[...] = dpe_ref[...] + dpe_tile
        return

    for bi in range(gb):
        if not batch_inv:
            geos = [band_geometry(bi, j) for j in range(nbands)]

        for hi in range(h):
            q = q_ref[bi, :, hi * c_:(hi + 1) * c_]
            go = gout_ref[bi, :, hi * c_:(hi + 1) * c_]  # (tq, c_)
            go32 = go.astype(jnp.float32)
            md = get_kv(0, bi, 0, c_).dtype

            # --- recompute the softmax across bands (flash style) ---
            logits = []
            for j in range(nbands):
                k = get_kv(j, bi, 2 * hi * c_, (2 * hi + 1) * c_)
                lg = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                if batch_inv:
                    lg = lg + biases[hi][j]
                else:
                    g = geos[j]
                    lg = jnp.where(
                        g[4],
                        lg + head_bias(hi, g[0], g[1], g[5], g[6], g[7]),
                        NEG_INF,
                    )
                logits.append(lg)
            blank = jax.lax.dot_general(
                q, bk_ref[:, hi:hi + 1], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (tq, 1)
            if sv:
                # saved stats (see the wsg branch): skip max/sum reduces
                mx = stats_ref[bi, :, hi:hi + 1]
                denom = stats_ref[bi, :, h + hi:h + hi + 1]
                pb_num = jnp.exp(blank - mx)
                ps = [jnp.exp(lg - mx) for lg in logits]
            else:
                mx = blank
                for lg in logits:
                    mx = jnp.maximum(mx, lg.max(axis=-1, keepdims=True))
                ps = []
                denom = jnp.exp(blank - mx)
                pb_num = denom
                for j, lg in enumerate(logits):
                    p = jnp.exp(lg - mx)
                    if not batch_inv:
                        p = jnp.where(geos[j][4], p, 0.0)
                    ps.append(p)
                    denom = denom + p.sum(axis=-1, keepdims=True)
            pinv = 1.0 / denom
            # Normalization folded into NARROW row-scalings (mirror of
            # the forward's pinv move; these kernels are VMEM
            # plane-traffic bound, r4d probes): probabilities stay raw
            # exp planes. With go' = pinv * go, every dp'/dpb' carries
            # exactly one pinv, so the s-reduction over the RAW planes
            # equals the true s, and dl = p_num * (dp' - pinv*s).
            go_s32 = go32 * pinv  # (tq, c_)
            go_s = go_s32.astype(md)

            # --- softmax backward across bands ---
            # With attention dropout (out = sum_j p_j mask_j v_j):
            # dL/dp_j = mask_j * (go . v_j), so the dp planes are masked
            # BEFORE the s-reduction, while the softmax jacobian itself
            # uses the pre-drop p. dv uses the dropped probs (below).
            dmasks = None
            if seed_ref is not None:
                seed0 = seed_ref[0]
                img = pl.program_id(0) * gb + bi
                row0 = ti * tq
                dmasks = [
                    _drop_keep(seed0, img, hi, row0, col0(j, bi), tq, wb,
                               drop_rate)
                    for j in range(nbands)
                ]
                bmask = _drop_keep(seed0, img, hi, row0, 65535, tq, 1,
                                   drop_rate)
            dpb = jax.lax.dot_general(
                go_s32, bv_ref[hi:hi + 1, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (tq, 1) — pinv-scaled
            if dmasks is not None:
                dpb = dpb * bmask
            dps = []
            s = dpb * pb_num
            for j, p in enumerate(ps):
                v = get_kv(j, bi, (2 * hi + 1) * c_, (2 * hi + 2) * c_)
                dp = jax.lax.dot_general(
                    go_s, v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )  # (tq, Wb) — pinv-scaled
                if dmasks is not None:
                    dp = dp * dmasks[j]
                dps.append(dp)
                if not sv:
                    s = s + (dp * p).sum(axis=-1, keepdims=True)
            if sv:
                # flash delta trick on the saved fwd output (see wsg
                # branch): s = dpb*pb + sum(dp*p) == rowsum(go * out),
                # a (tq, c_) reduce instead of (tq, Wb) per band
                outp = outp_ref[
                    bi, :, hi * c_:(hi + 1) * c_
                ].astype(jnp.float32)
                s = (go32 * outp).sum(axis=-1, keepdims=True)
            us = s * pinv  # (tq, 1)
            dlb = pb_num * (dpb - us)  # (tq, 1)

            dq = dlb * bk_ref[:, hi].astype(jnp.float32)[None, :]
            for j, (p, dp) in enumerate(zip(ps, dps)):
                dl = p * (dp - us)  # (tq, Wb) fp32; 0 at non-members
                dlm = dl.astype(md)
                k = get_kv(j, bi, 2 * hi * c_, (2 * hi + 1) * c_)
                dq = dq + jax.lax.dot_general(
                    dlm, k, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )

                dkw = jax.lax.dot_general(
                    dlm, q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )  # (Wb, c_)
                pa = p if dmasks is None else p * dmasks[j]
                dvw = jax.lax.dot_general(
                    pa.astype(md), go_s, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )  # (Wb, c_) — go_s carries the pinv row scale
                k0 = 2 * hi * c_
                v0 = (2 * hi + 1) * c_
                if cu:
                    dkvc_ref[bi, :, k0:k0 + c_] = (
                        dkvc_ref[bi, :, k0:k0 + c_] + dkw
                    )
                    dkvc_ref[bi, :, v0:v0 + c_] = (
                        dkvc_ref[bi, :, v0:v0 + c_] + dvw
                    )
                elif nb:
                    c0b = col0(j, bi)
                    dkv_ref[bi, pl.ds(c0b, wb), k0:k0 + c_] = (
                        dkv_ref[bi, pl.ds(c0b, wb), k0:k0 + c_] + dkw
                    )
                    dkv_ref[bi, pl.ds(c0b, wb), v0:v0 + c_] = (
                        dkv_ref[bi, pl.ds(c0b, wb), v0:v0 + c_] + dvw
                    )
                else:
                    dkv_ref[bi, :, k0:k0 + c_] = (
                        dkv_ref[bi, :, k0:k0 + c_] + dkw
                    )
                    dkv_ref[bi, :, v0:v0 + c_] = (
                        dkv_ref[bi, :, v0:v0 + c_] + dvw
                    )

                dx, dy = geos[j][0], geos[j][1]
                dist, sinp, cosp = geos[j][5], geos[j][6], geos[j][7]
                for f, plane in enumerate((dx, dy, dist, sinp, cosp)):
                    val = (dl * plane).sum()
                    dpe_tile = dpe_tile + jnp.where(
                        (row_i == f) & (lane_i == hi), val, 0.0
                    )
                dpe_tile = dpe_tile + jnp.where(
                    (row_i == 5) & (lane_i == hi), dl.sum(), 0.0
                )
            dq_ref[bi, :, hi * c_:(hi + 1) * c_] = dq.astype(dq_ref.dtype)

            # blank grads: rows [0, c_) = d_blank_k, rows [c_, 2c_) = d_blank_v
            dbk = jax.lax.dot_general(
                q.astype(jnp.float32), dlb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (c_, 1)
            pbd = pb_num if dmasks is None else pb_num * bmask
            dbv = jax.lax.dot_general(
                go_s32, pbd, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (c_, 1) — d_blank_v[hi] = sum_t pb_dropped[t] * g_out[t]
            dblank_ref[0, 0:c_, hi:hi + 1] = (
                dblank_ref[0, 0:c_, hi:hi + 1] + dbk
            )
            dblank_ref[0, c_:2 * c_, hi:hi + 1] = (
                dblank_ref[0, c_:2 * c_, hi:hi + 1] + dbv
            )
    if cu:
        # scatter the compact dk/dv accumulator back into the resident
        # dkv block (all images of the group at once per union block)
        tic = pl.program_id(1)
        for u in range(cu):
            s = jnp.maximum(starts_ref[tic, u], 0) * cbs
            dkv_ref[:, pl.ds(s, cbs), :] = (
                dkv_ref[:, pl.ds(s, cbs), :]
                + dkvc_ref[:, u * cbs:(u + 1) * cbs, :]
            )
    dpe_ref[...] = dpe_ref[...] + dpe_tile


def _attention_bwd_impl(q, kv, ncc, pos, pe_kernel, pe_bias, blank_k,
                        blank_v, g_out, h, cs, rel_width, clamp_width,
                        static_ncc, drop=None, saved=None):
    """Pallas backward; static decisions (tile, window, gb) mirror the
    forward exactly so window offsets line up.

    ``saved`` (windowed batch-invariant path only): ``(out, stats)``
    residuals from the forward — the attention output and the (b, n, 2h)
    per-row softmax (max, denom). When present the kernel skips the
    softmax max/sum recompute reductions and uses the flash delta trick
    for the jacobian row term (see _fca_fwd)."""
    wsg_b = 1
    b, n, c = q.shape
    nnc = ncc.shape[-1]
    kk = -(-n // cs)
    np_ = kk * cs
    c_ = c // h
    pos_q = pos
    # Path selection is shared with the forward via _route (window/compact
    # paths must keep the forward's tile so window offsets line up); only
    # the dense/banded tile budgets differ (see _route's bwd re-pick —
    # curriculum UD at ratio 1.0, n=4161: the fwd-sized tile put the bwd
    # body 20 MB over the 100 MB scoped-VMEM limit, queue r3f-6).
    route = _route(n, np_, cs, static_ncc, drop, bwd=True)
    tq, window, compact = route.tq, route.window, route.compact
    clamp_hi = clamp_width - 1 if clamp_width else None
    hiprec = q.dtype == jnp.float32

    if compact:
        _, cu, cbs, np_, starts_np, clc_np, posc_np = window
        ucs = cu * cbs
        # resident K/V + fp32 dkv accumulator + the two compact scratches
        gb = _gb_for(
            b,
            np_ * (2 * c * kv.dtype.itemsize + 2 * c * 4)
            + ucs * 2 * c * (kv.dtype.itemsize + 4),
            24 * 1024 * 1024, cap=8, h=h)
        nb, Wb = 0, ucs
    elif window is not None:
        nb, Wb, np_, offs_np = window
        # resident K/V + fp32 dkv accumulator per image in VMEM
        gb = _gb_for(
            b,
            np_ * (2 * c * kv.dtype.itemsize + 2 * c * 4 + 2 * 4),
            24 * 1024 * 1024, cap=8, h=h)
        # bwd row-stacking (see the wsg branch in _bwd_kernel): snap the
        # requested group to a divisor of gb and to the scoped-VMEM
        # budget — the bwd keeps ~5 tall band planes live (2 scratches
        # + the p/dp/dl value planes)
        if route.wsg_ok:
            # DEFAULT ON since the r4f chip parity + A/B (2026-08-21):
            # mini train 994.5 -> 1034.5 img/s, stage-1 grad parity
            # inside the envelope. MLAFF_WSTACK_BWD=0 restores the
            # per-image chains; =N forces group N.
            env_wsg = os.environ.get("MLAFF_WSTACK_BWD", "1")
            req = int(env_wsg)
            if req == 1:
                req = 8 if c <= 64 else 2
            wsg_b = max(1, req)
            while wsg_b > 1 and gb % wsg_b:
                wsg_b -= 1
            resident = gb * np_ * (
                2 * c * kv.dtype.itemsize + 2 * c * 4 + 2 * 4
            )
            limit = 64 * 1024 * 1024
            while (wsg_b > 1 and
                   max(nb, 1) * wsg_b * tq * Wb * 4 * 5 + resident > limit):
                wsg_b -= 1
                while wsg_b > 1 and gb % wsg_b:
                    wsg_b -= 1
    else:
        # static K-bands (route.nb > 0), mirroring the forward; the
        # banded-bwd 48-plane tile charge history lives in _route
        # (np_=4168 fwd-style charge compiled to a 162 MB scoped-VMEM
        # program — over the 128 MB cap, queue r4a-1; planes=40 still
        # left the fp32 variant 13 M over, queue r4b-1 — 48 holds both).
        nb, Wb, np_ = route.nb, route.wb, route.np_
        # cap 8: the unrolled gb*h backward body keeps more planes live
        # than the forward (measured: gb=16 exceeds VMEM at stage-3 shapes)
        gb = _gb_for(b, (np_ * 2 * c * 2) + (2 * np_ * c * 4),
                     24 * 1024 * 1024, cap=8, h=h, np_=np_)

    kv_p = _pad_rows(kv, np_)
    pos_p = _pad_rows(pos, np_)

    nt = n // tq
    sbands = window is None and nb > 0
    # saved-residual fast path: windowed batch-invariant or stacked
    # routes (the fwd produced stats under its own _route; if the bwd
    # route diverges — e.g. MLAFF_STACK_BWD=0 — the residuals are
    # simply unused and the recompute path runs)
    use_saved = saved is not None and route.wsg_ok
    kernel = functools.partial(
        _bwd_kernel, h=h, cs=cs, n_valid=n, rel_width=rel_width,
        clamp_hi=clamp_hi, hiprec=hiprec, nb=nb, wb=Wb,
        batch_inv=static_ncc is not None,
        cu=cu if compact else 0, cbs=cbs if compact else 0,
        sbands=sbands, drop_rate=drop[0] if drop is not None else 0.0,
        wsg=wsg_b, sv=use_saved,
    )
    out_shape = [
        jax.ShapeDtypeStruct((b, n, c), q.dtype),           # dq
        jax.ShapeDtypeStruct((b, np_, 2 * c), jnp.float32),  # dkv (padded)
        jax.ShapeDtypeStruct((b // gb, 8, 128), jnp.float32),    # pe parts
        jax.ShapeDtypeStruct((b // gb, 2 * c_, h), jnp.float32),  # blank parts
    ]
    if drop is not None:
        tail_operands = (
            pe_kernel.astype(jnp.float32), pe_bias.astype(jnp.float32),
            blank_k.astype(q.dtype), blank_v.astype(jnp.float32),
            drop[1].astype(jnp.int32), g_out,
        )
    else:
        tail_operands = (
            pe_kernel.astype(jnp.float32), pe_bias.astype(jnp.float32),
            blank_k.astype(q.dtype), blank_v.astype(jnp.float32), g_out,
        )
    if use_saved:
        # fwd output + softmax stats ride as two extra inputs after g_out
        tail_operands = tail_operands + (
            saved[0], saved[1].astype(jnp.float32),
        )
    # seed spec (SMEM) slots between blank_v and g_out when dropout is on
    seed_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)] if drop is not None else []
    )
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024
    )

    # row-stacked backward for the small-token stages (gate shared with
    # the forward via _route; see _bwd_kernel_stacked — the plain bwd at
    # these shapes is per-(image, head) chain-issue bound: r4b train
    # profile, stage-3 bwd 2.87 ms/block vs stacked fwd 0.67. Separate
    # bwd bound MLAFF_STACK_BWD_NMAX, default 800: unlike the fwd —
    # which LOST at stage-2 widths pre-pinv — stacking the stage-2
    # BACKWARD wins, r4f-4 chip A/B: mini train 1034.5 -> 1060.1 img/s)
    stacked_bwd = route.stacked
    use_saved_stacked = (
        saved is not None and stacked_bwd and _saved_stacked_ok(np_)
    )
    if stacked_bwd:
        # empirical charge: the measured Mosaic scoped footprint at
        # (gb=8, np_=248, c=192, h=6) was 111 M (queue r4c-2 OOM), i.e.
        # ~36 fp32 planes per image-row block — far above the naive
        # geometry+flows count (concat sources/dest and head-loop
        # pipelining overlap more than the liveness math suggests)
        per_img = np_ * 2 * c * (2 + 4) + np_ * np_ * 4 * 36
        gb_s = _gb_for(b, per_img, 40 * 1024 * 1024, h=h, np_=np_)
        env = os.environ.get("MLAFF_STACK_GB")
        if env:
            gb_s = min(gb_s, int(env))
            while b % gb_s:
                gb_s -= 1
        skernel = functools.partial(
            _bwd_kernel_stacked, h=h, cs=cs, n_valid=n, np_=np_,
            rel_width=rel_width, clamp_hi=clamp_hi, hiprec=hiprec,
            gb=gb_s, sv=use_saved_stacked,
        )
        q_s = _pad_rows(q, np_).reshape(b * np_, c)
        posq_s = _pad_rows(pos_q, np_).reshape(b * np_, 2)
        ncc_s = _pad_rows(ncc, np_).reshape(b * np_, nnc)
        go_s = _pad_rows(g_out, np_).reshape(b * np_, c)
        saved_operands = ()
        saved_specs = []
        if use_saved_stacked:
            outp_s = _pad_rows(saved[0], np_).reshape(b * np_, c)
            stats_p = _pad_rows(saved[1].astype(jnp.float32), np_)
            if np_ != n:
                # padded rows carry (mx=+big, denom=1) so the kernel's
                # exp(lg - mx) underflows to exact zeros there (their
                # q rows are zero but the bias plane is not — a zero mx
                # would let exp(bias) overflow; see _bwd_kernel_stacked)
                row = jnp.arange(np_)[None, :, None]
                lane = jnp.arange(2 * h)[None, None, :]
                pad_stats = jnp.where(lane < h, 1e30, 1.0)
                stats_p = jnp.where(row < n, stats_p, pad_stats)
            saved_operands = (outp_s, stats_p.reshape(b * np_, 2 * h))
            saved_specs = [
                pl.BlockSpec((gb_s * np_, c), lambda bi: (bi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb_s * np_, 2 * h), lambda bi: (bi, 0),
                             memory_space=pltpu.VMEM),
            ]
        outs = pl.pallas_call(
            skernel,
            grid=(b // gb_s,),
            interpret=_interpret(),
            compiler_params=compiler_params,
            in_specs=[
                pl.BlockSpec((gb_s * np_, c), lambda bi: (bi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb_s, np_, 2 * c), lambda bi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb_s * np_, 2), lambda bi: (bi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb_s, 2, np_), lambda bi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb_s * np_, nnc), lambda bi: (bi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((gb_s * np_, c), lambda bi: (bi, 0),
                             memory_space=pltpu.VMEM),
                *saved_specs,
            ],
            out_specs=[
                pl.BlockSpec((gb_s * np_, c), lambda bi: (bi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb_s, np_, 2 * c), lambda bi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 128), lambda bi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2 * c_, h), lambda bi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b * np_, c), q.dtype),
                jax.ShapeDtypeStruct((b, np_, 2 * c), jnp.float32),
                jax.ShapeDtypeStruct((b // gb_s, 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((b // gb_s, 2 * c_, h), jnp.float32),
            ],
        )(q_s, kv_p, posq_s, pos_p.transpose(0, 2, 1), ncc_s,
          pe_kernel.astype(jnp.float32), pe_bias.astype(jnp.float32),
          blank_k.astype(q.dtype), blank_v.astype(jnp.float32), go_s,
          *saved_operands)
        o_dq, o_dkv, o_dpe, o_dblank = outs
        dq = o_dq.reshape(b, np_, c)[:, :n]
        dkv = o_dkv[:, :n]
        dpe_sum = o_dpe.sum(axis=0)
        dblank_sum = o_dblank.sum(axis=0)
        d_pe_kernel = dpe_sum[:5, :h]
        d_pe_bias = dpe_sum[5, :h]
        d_blank_k = dblank_sum[:c_]
        d_blank_v = dblank_sum[c_:].T
        return (
            dq,
            dkv.astype(kv.dtype),
            d_pe_kernel.astype(pe_kernel.dtype),
            d_pe_bias.astype(pe_bias.dtype),
            d_blank_k.astype(blank_k.dtype),
            d_blank_v.astype(blank_v.dtype),
        )

    def out_specs(windowed):
        if windowed:
            return [
                pl.BlockSpec((gb, tq, c),
                             lambda bi, ti, offs: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, np_, 2 * c),
                             lambda bi, ti, offs: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 128),
                             lambda bi, ti, offs: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2 * c_, h),
                             lambda bi, ti, offs: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
        return [
            pl.BlockSpec((gb, tq, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, np_, 2 * c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c_, h), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    if compact:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // gb, nt),
            in_specs=[
                pl.BlockSpec((gb, tq, c),
                             lambda bi, ti, sts: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, np_, 2 * c),
                             lambda bi, ti, sts: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, tq, 2),
                             lambda bi, ti, sts: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, ucs),
                             lambda bi, ti, sts: (ti, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, ucs),
                             lambda bi, ti, sts: (ti, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, tq, nnc),
                             lambda bi, ti, sts: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                *seed_specs,
                pl.BlockSpec((gb, tq, c),
                             lambda bi, ti, sts: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs(True),
            scratch_shapes=[
                pltpu.VMEM((gb, ucs, 2 * c), kv_p.dtype),
                pltpu.VMEM((gb, ucs, 2 * c), jnp.float32),
            ],
        )
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            interpret=_interpret(),
            compiler_params=compiler_params,
            out_shape=out_shape,
        )(jnp.asarray(starts_np), q, kv_p, pos_q, jnp.asarray(clc_np),
          jnp.asarray(posc_np), ncc, *tail_operands)
    elif window is not None:
        # Resident K/V + K-positions (tile-invariant index maps: one fetch
        # per image group); band starts via scalar prefetch, sliced in-VMEM.
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // gb, nt),
            in_specs=[
                pl.BlockSpec((gb, tq, c),
                             lambda bi, ti, offs: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, np_, 2 * c),
                             lambda bi, ti, offs: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, tq, 2),
                             lambda bi, ti, offs: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, 2, np_),
                             lambda bi, ti, offs: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, tq, nnc),
                             lambda bi, ti, offs: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                *seed_specs,
                pl.BlockSpec((gb, tq, c),
                             lambda bi, ti, offs: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                *([pl.BlockSpec((gb, tq, c),
                                lambda bi, ti, offs: (bi, ti, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((gb, tq, 2 * h),
                                lambda bi, ti, offs: (bi, ti, 0),
                                memory_space=pltpu.VMEM)]
                  if use_saved else []),
            ],
            out_specs=out_specs(True),
            scratch_shapes=(
                [pltpu.VMEM((max(nb, 1), wsg_b * tq, Wb), jnp.float32),
                 pltpu.VMEM((max(nb, 1), wsg_b * tq, Wb), jnp.float32)]
                if wsg_b > 1 else []
            ),
        )
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            interpret=_interpret(),
            compiler_params=compiler_params,
            out_shape=out_shape,
        )(jnp.asarray(offs_np), q, kv_p, pos_q,
          pos_p.transpose(0, 2, 1), ncc, *tail_operands)
    else:
        # traced-window backward (dispatch rule shared with the forward
        # via _route; the offsets recompute deterministically from the
        # saved ncc). Computed BEFORE the padding decision so padding can
        # gate on whether the window actually materialized (with
        # MLAFF_TWIN=1 and unfactorable n, _twin_tile can find no divisor
        # and return None — the dense body must then still get its padded
        # grid).
        twin = None
        if route.twin:
            ttq = _twin_tile(n)
            if ttq is not None:
                wt, offs128, ok = _traced_window(ncc, n, np_, cs, ttq)
                if wt is not None:
                    twin = (ttq, wt, offs128, ok)

        # Query-row padding for unfactorable dense stages, mirroring the
        # forward (see _dense_pad_tile). Padded g_out rows are ZERO, so
        # their contributions to dkv/dpe/dblank are exact zeros and their
        # dq rows are sliced off. Skipped when a traced window is live
        # (the lax.cond branches must return identical shapes).
        nq_b, tq_b = n, tq
        q_b, posq_b, ncc_b = q, pos_q, ncc
        tail_b = tail_operands
        if twin is None and tq >= n and n > 512:
            nq_b, tq_b = _dense_pad_tile(
                n, np_, planes=48 if nb else 16
            )
            q_b = _pad_rows(q, nq_b)
            posq_b = _pad_rows(pos_q, nq_b)
            ncc_b = _pad_rows(ncc, nq_b)
            tail_b = tail_operands[:-1] + (_pad_rows(g_out, nq_b),)
        pos_tb = pos_p.transpose(0, 2, 1)
        if sbands:
            # per-band K-position rows, mirroring the forward
            pos_tb = pos_tb.reshape(b, 2, nb, Wb).transpose(
                0, 2, 1, 3).reshape(b, 2 * nb, Wb)

        def _dense_bwd(_):
            oshape = out_shape
            ospecs = out_specs(False)
            if nq_b != n:
                oshape = [jax.ShapeDtypeStruct((b, nq_b, c), q.dtype),
                          *out_shape[1:]]
                ospecs = [
                    pl.BlockSpec((gb, tq_b, c), lambda bi, ti: (bi, ti, 0),
                                 memory_space=pltpu.VMEM),
                    *out_specs(False)[1:],
                ]
            outs = pl.pallas_call(
                kernel,
                grid=(b // gb, nq_b // tq_b),
                interpret=_interpret(),
                compiler_params=compiler_params,
                in_specs=[
                    pl.BlockSpec((gb, tq_b, c), lambda bi, ti: (bi, ti, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((gb, np_, 2 * c),
                                 lambda bi, ti: (bi, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((gb, tq_b, 2), lambda bi, ti: (bi, ti, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (gb, 2 * nb, Wb) if sbands else (gb, 2, np_),
                        lambda bi, ti: (bi, 0, 0),
                        memory_space=pltpu.VMEM),
                    pl.BlockSpec((gb, tq_b, nnc),
                                 lambda bi, ti: (bi, ti, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    *seed_specs,
                    pl.BlockSpec((gb, tq_b, c), lambda bi, ti: (bi, ti, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=ospecs,
                out_shape=oshape,
            )(q_b, kv_p, posq_b, pos_tb, ncc_b,
              *tail_b)
            o_dq, o_dkv, o_dpe, o_dblank = outs
            return (o_dq[:, :n], o_dkv[:, :n], o_dpe.sum(axis=0),
                    o_dblank.sum(axis=0))

        if twin is None:
            dq, dkv, dpe_sum, dblank_sum = _dense_bwd(None)
        else:
            ttq, wt, offs128, ok = twin
            np128 = -(-np_ // 128) * 128
            gbw = _gb_for(
                b,
                np128 * (2 * c * kv.dtype.itemsize + 2 * c * 4 + 2 * 4),
                24 * 1024 * 1024, cap=8, h=h)
            kv_pw = _pad_rows(kv, np128)
            pos_pw = _pad_rows(pos, np128)
            wkernel = functools.partial(
                _bwd_kernel, h=h, cs=cs, n_valid=n, rel_width=rel_width,
                clamp_hi=clamp_hi, hiprec=hiprec, nb=1, wb=wt,
                batch_inv=False,
            )
            ntw = n // ttq
            w_out_shape = [
                jax.ShapeDtypeStruct((b, n, c), q.dtype),
                jax.ShapeDtypeStruct((b, np128, 2 * c), jnp.float32),
                jax.ShapeDtypeStruct((b // gbw, 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((b // gbw, 2 * c_, h), jnp.float32),
            ]
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b // gbw, ntw),
                in_specs=[
                    pl.BlockSpec((gbw, ttq, c),
                                 lambda bi, ti, offs: (bi, ti, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((gbw, np128, 2 * c),
                                 lambda bi, ti, offs: (bi, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((gbw, ttq, 2),
                                 lambda bi, ti, offs: (bi, ti, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((gbw, 2, np128),
                                 lambda bi, ti, offs: (bi, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((gbw, ttq, nnc),
                                 lambda bi, ti, offs: (bi, ti, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec((gbw, ttq, c),
                                 lambda bi, ti, offs: (bi, ti, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((gbw, ttq, c),
                                 lambda bi, ti, offs: (bi, ti, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((gbw, np128, 2 * c),
                                 lambda bi, ti, offs: (bi, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8, 128),
                                 lambda bi, ti, offs: (bi, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 2 * c_, h),
                                 lambda bi, ti, offs: (bi, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
            )

            def _twin_bwd(_):
                outs = pl.pallas_call(
                    wkernel,
                    grid_spec=grid_spec,
                    interpret=_interpret(),
                    compiler_params=compiler_params,
                    out_shape=w_out_shape,
                )(offs128.reshape(b // gbw, gbw, ntw), q, kv_pw, pos_q,
                  pos_pw.transpose(0, 2, 1), ncc, *tail_operands)
                o_dq, o_dkv, o_dpe, o_dblank = outs
                return (o_dq, o_dkv[:, :n], o_dpe.sum(axis=0),
                        o_dblank.sum(axis=0))

            dq, dkv, dpe_sum, dblank_sum = jax.lax.cond(
                ok, _twin_bwd, _dense_bwd, 0
            )
        d_pe_kernel = dpe_sum[:5, :h]
        d_pe_bias = dpe_sum[5, :h]
        d_blank_k = dblank_sum[:c_]
        d_blank_v = dblank_sum[c_:].T
        return (
            dq,
            dkv.astype(kv.dtype),
            d_pe_kernel.astype(pe_kernel.dtype),
            d_pe_bias.astype(pe_bias.dtype),
            d_blank_k.astype(blank_k.dtype),
            d_blank_v.astype(blank_v.dtype),
        )

    dq, dkv, dpe, dblank = outs
    dpe_sum = dpe.sum(axis=0)  # (8, 128)
    d_pe_kernel = dpe_sum[:5, :h]
    d_pe_bias = dpe_sum[5, :h]
    dblank_sum = dblank.sum(axis=0)  # (2c_, h)
    d_blank_k = dblank_sum[:c_]
    d_blank_v = dblank_sum[c_:].T  # (h, c_)
    return (
        dq,
        dkv[:, :n].astype(kv.dtype),
        d_pe_kernel.astype(pe_kernel.dtype),
        d_pe_bias.astype(pe_bias.dtype),
        d_blank_k.astype(blank_k.dtype),
        d_blank_v.astype(blank_v.dtype),
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
    slot = jnp.arange(cs)
    token_idx = ncc[..., None] * cs + slot  # b n nnc cs
    return (token_idx < n).reshape(b, n, nnc * cs)


def fused_cluster_attention(q, kv, ncc, pos, pe_kernel, pe_bias,
                            blank_k, blank_v, num_heads, cs, rel_width,
                            clamp_width=0, static_ncc=None,
                            static_pos=None, drop_rate=0.0,
                            drop_seed=None):
    """Fused local cluster attention (see module docstring).

    Args:
        q: (b, n, c) pre-scaled queries, token-major (head hi occupies
            channels [hi*c_, (hi+1)*c_), c_ = c // num_heads);
            cluster-ordered rows.
        kv: (b, n, 2c) fused keys/values, channel structure (h, 2, c_) —
            per head, k then v — exactly the kv Linear output (matches the
            reference's ``kv.view(b, n, h, 2, c_)``).
        ncc: (b, n, nnc) int32 nearest-cluster indices.
        pos: (b, n, 2) float token positions (cluster-ordered).
        pe_kernel: (5, h) pos_embed weights; pe_bias: (h,).
        blank_k: (c_, h) learned blank-key slices (logit = q_h @ blank_k[:, h]).
        blank_v: (h, c_) learned blank-value slices.
        num_heads: h.
        cs: cluster size; rel_width: R; clamp_width: table width for the
            MixRes clamp (0 = no clamp, AFF semantics).
        static_ncc: optional host-constant (n, nnc) numpy copy of ``ncc``.
            Contract: BOTH ``ncc`` and ``pos`` are identical across the
            batch (true only for the on-grid stage, where clustering/kNN
            are pure functions of (h, w)). Enables the windowed-K/V fast
            path (each query tile streams only its cluster band) and
            batch-invariant geometry hoisting (rel-pos/mask/bias planes
            computed once per instance instead of per image).
        static_pos: optional host-constant (n, 2) numpy copy of ``pos``
            (cluster-ordered, same contract). Together with ``static_ncc``
            it additionally enables the compact-union K/V layout
            (``MLAFF_COMPACT=1``, see ``_static_compact``).

        drop_rate / drop_seed: attention-prob dropout (reference
            ``aff_transformer.py:148``). When ``drop_rate > 0`` a (1,)
            int32 ``drop_seed`` must be supplied; the kernels drop
            post-softmax probabilities (incl. the blank slot) with a
            stateless coordinate hash (see ``_drop_keep``), identically
            reproduced in the backward. Requires c_ % 8 == 0 (the Pallas
            backward is mandatory — the XLA-oracle bwd has no mask).
            The no-drop program is byte-identical to drop_rate=0.

    Returns:
        out (b, n, c) with the blank-token contribution already added.
    """
    wrapped = (
        None if static_ncc is None else _StaticNcc(static_ncc, static_pos)
    )
    if drop_rate > 0.0:
        assert drop_seed is not None, "drop_rate > 0 requires drop_seed"
        c_ = q.shape[-1] // num_heads
        assert c_ % 8 == 0, "fused attention dropout requires c_ % 8 == 0"
        return _fca_drop(q, kv, ncc, pos, pe_kernel, pe_bias, blank_k,
                         blank_v, drop_seed, num_heads, cs, rel_width,
                         clamp_width, wrapped, float(drop_rate))
    return _fca(q, kv, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
                num_heads, cs, rel_width, clamp_width, wrapped)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def _fca(q, kv, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
         h, cs, rel_width, clamp_width, static_ncc):
    return _attention_fwd_impl(
        q, kv, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
        h, cs, rel_width, clamp_width, static_ncc,
    )


def _fca_fwd(q, kv, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
             h, cs, rel_width, clamp_width, static_ncc):
    # MLAFF_BWD_SAVED (windowed batch-invariant path): save the per-row
    # softmax (max, denom) and the forward OUTPUT as residuals. The bwd
    # then (a) skips its max/sum lane reductions over the (tq, W) planes
    # and (b) computes the jacobian row term via the flash "delta trick"
    # s = rowsum(g_out * out) on (tq, c_) instead of reducing dp*p over
    # W — the r5a chip decomposition showed those two VPU chains are
    # ~75% of the stage-1 backward (nosm 13.95 -> 8.86 ms, nojac ->
    # 8.52 ms at b128).
    b, n, c = q.shape
    np_ = -(-n // cs) * cs
    rf = _route(n, np_, cs, static_ncc, None, bwd=False)
    want = (
        os.environ.get("MLAFF_BWD_SAVED", "1") == "1"
        and _PALLAS_BWD and (c // h) % 8 == 0
        and (rf.wsg_ok or (rf.stacked and _saved_stacked_ok(np_)))
    )
    if want:
        out, stats = _attention_fwd_impl(
            q, kv, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
            h, cs, rel_width, clamp_width, static_ncc, want_stats=True,
        )
    else:
        out = _attention_fwd_impl(
            q, kv, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
            h, cs, rel_width, clamp_width, static_ncc,
        )
        stats = None
    saved = None if stats is None else (out, stats)
    return out, (q, kv, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
                 saved)


def _split_heads(x, h):
    b, n, c = x.shape
    return x.reshape(b, n, h, c // h).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, n, c_ = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * c_)


def _fca_bwd(h, cs, rel_width, clamp_width, static_ncc, residuals,
             g_out):
    (q, kv, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
     saved) = residuals
    c_ = q.shape[-1] // h
    # The interpreter normally takes the XLA-oracle backward (the Pallas
    # bwd is the production TPU path) — but that left the Pallas bwd with
    # ZERO CPU test coverage, which hid a missing d_blank_v accumulation
    # (found by the on-chip probe, round 2). MLAFF_PALLAS_BWD_INTERPRET=1
    # forces the Pallas bwd under the interpreter for parity tests.
    force_interp_bwd = (
        os.environ.get("MLAFF_PALLAS_BWD_INTERPRET", "0") == "1"
    )
    if _PALLAS_BWD and c_ % 8 == 0 and (not _interpret() or force_interp_bwd):
        dq, dkv, d_pe_kernel, d_pe_bias, d_blank_k, d_blank_v = (
            _attention_bwd_impl(
                q, kv, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
                g_out, h, cs, rel_width, clamp_width, static_ncc,
                saved=saved,
            )
        )
        return (dq, dkv, None, None, d_pe_kernel, d_pe_bias,
                d_blank_k, d_blank_v)

    # XLA one-hot oracle backward (reference algebra, deterministic)
    b, n, c = q.shape
    nnc = ncc.shape[-1]
    kk = -(-n // cs)
    qh = _split_heads(q, h).astype(jnp.float32)  # b h n c_
    kvh = kv.reshape(b, n, h, 2, c_)
    kh = kvh[..., 0, :].transpose(0, 2, 1, 3)  # b h n c_
    vh = kvh[..., 1, :].transpose(0, 2, 1, 3)
    goh = _split_heads(g_out, h).astype(jnp.float32)

    feat5 = _rel_feat(pos, ncc, cs, rel_width, clamp_width)  # b n m 5
    bias = (
        jnp.einsum("bnmf,fh->bhnm", feat5, pe_kernel.astype(jnp.float32))
        + pe_bias.astype(jnp.float32)[None, :, None, None]
    )
    pad_ok = _pad_mask(ncc, cs, n, nnc)[:, None]  # b 1 n m
    kg = gather_clusters_onehot(kh, ncc, cs)
    vg = gather_clusters_onehot(vh, ncc, cs)
    logits = jnp.einsum("bhic,bhimc->bhim", qh, kg.astype(jnp.float32)) + bias
    logits = jnp.where(pad_ok, logits, NEG_INF)
    bk32 = blank_k.astype(jnp.float32).T  # (h, c_)
    bv32 = blank_v.astype(jnp.float32)  # (h, c_)
    blank = jnp.einsum("bhic,hc->bhi", qh, bk32)[..., None]  # b h n 1
    mx = jnp.maximum(logits.max(-1, keepdims=True), blank)
    p = jnp.where(pad_ok, jnp.exp(logits - mx), 0.0)
    pb = jnp.exp(blank - mx)
    denom = p.sum(-1, keepdims=True) + pb
    p = p / denom
    pb = pb / denom

    dp = jnp.einsum("bhic,bhimc->bhim", goh, vg.astype(jnp.float32))
    dpb = jnp.einsum("bhic,hc->bhi", goh, bv32)[..., None]

    s = (dp * p).sum(-1, keepdims=True) + dpb * pb
    dlogits = p * (dp - s)  # zero at masked slots since p there is 0
    dlb = pb * (dpb - s)  # b h n 1

    dqh = jnp.einsum("bhim,bhimc->bhic", dlogits, kg.astype(jnp.float32))
    dqh = dqh + dlb * bk32[None, :, None, :]
    d_pe_kernel = jnp.einsum("bhnm,bnmf->fh", dlogits, feat5)
    d_pe_bias = dlogits.sum(axis=(0, 2, 3))
    d_blank_k = jnp.einsum("bhic,bhi->ch", qh, dlb[..., 0])
    d_blank_v = jnp.einsum("bhi,bhic->hc", pb[..., 0], goh)

    # scatter-adds as transposed one-hot matmuls (deterministic)
    onehot = jax.nn.one_hot(ncc.reshape(b, -1), kk, dtype=jnp.float32)
    dkg = qh[:, :, :, None, :] * dlogits[..., None]
    dvg = p[..., None] * goh[:, :, :, None, :]

    def scatter(dxg):
        flat = dxg.reshape(b, h, n * nnc, cs * c // h)
        acc = jnp.einsum("bek,bhed->bhkd", onehot, flat)
        return acc.reshape(b, h, kk * cs, c // h)[:, :, :n]

    dkh = scatter(dkg)
    dvh = scatter(dvg)
    dkv = (
        jnp.stack([dkh, dvh], axis=3)  # b h n 2 c_
        .transpose(0, 2, 1, 3, 4)
        .reshape(b, n, 2 * c)
    )
    return (
        _merge_heads(dqh).astype(q.dtype),
        dkv.astype(kv.dtype),
        None,
        None,
        d_pe_kernel.astype(pe_kernel.dtype),
        d_pe_bias.astype(pe_bias.dtype),
        d_blank_k.astype(blank_k.dtype),
        d_blank_v.astype(blank_v.dtype),
    )


_fca.defvjp(_fca_fwd, _fca_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def _fca_drop(q, kv, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
              seed, h, cs, rel_width, clamp_width, static_ncc, drop_rate):
    """Dropout variant of :func:`_fca` (separate primitive so the
    no-drop path's traced program — and its compile cache — is
    untouched). ``seed`` is a (1,) int32 operand; ``drop_rate`` is
    static."""
    return _attention_fwd_impl(
        q, kv, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
        h, cs, rel_width, clamp_width, static_ncc,
        drop=(drop_rate, seed),
    )


def _fca_drop_fwd(q, kv, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
                  seed, h, cs, rel_width, clamp_width, static_ncc,
                  drop_rate):
    out = _attention_fwd_impl(
        q, kv, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
        h, cs, rel_width, clamp_width, static_ncc,
        drop=(drop_rate, seed),
    )
    return out, (q, kv, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
                 seed)


def _fca_drop_bwd(h, cs, rel_width, clamp_width, static_ncc, drop_rate,
                  residuals, g_out):
    # the Pallas backward is mandatory here (the XLA-oracle bwd has no
    # dropout mask); fused_cluster_attention enforces c_ % 8 == 0
    q, kv, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v, seed = residuals
    dq, dkv, d_pe_kernel, d_pe_bias, d_blank_k, d_blank_v = (
        _attention_bwd_impl(
            q, kv, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
            g_out, h, cs, rel_width, clamp_width, static_ncc,
            drop=(drop_rate, seed),
        )
    )
    return (dq, dkv, None, None, d_pe_kernel, d_pe_bias,
            d_blank_k, d_blank_v, None)


_fca_drop.defvjp(_fca_drop_fwd, _fca_drop_bwd)
