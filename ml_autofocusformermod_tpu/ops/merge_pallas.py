"""Fused PointConv cluster-merge (CLUSTEN-WF + cluster gather) as a Pallas
TPU kernel.

The reference runs ClusterMerging's aggregation as a CUDA gather-kernel
(``clusten/src/clustenwf_cuda_kernel.cu:18-53``): for each merge center,
gather its ``m = nnc*cs`` neighborhood rows and contract against the
pointconv weights. The XLA lowering here (``ops/clusten.py::clusten_wf`` /
``cluster_gather.py::gather_clusters_onehot`` + ``wf_contract``) is
correct but materializes the gathered ``(b, n'*m, c)`` features in HBM and
surrounds the conv-ified one-hot matmuls with full relayout copies — the
AFF-Mini b128 forward profile shows ~9.6 ms/iter of merge-chain glue
(fusions + copies at [128,1,4704,256]-shaped tensors and friends), over a
49 ms iteration.

This kernel applies the same TPU-first move as the attention kernel
(``clusten_pallas.py``): the per-image features are tiny (AFF stage 1:
392 x 256 bf16 = 200 KB), so they stay RESIDENT in VMEM viewed at cluster
granularity, and each of a center's ``nnc`` nearest clusters is fetched by
an in-VMEM one-hot matmul — the gathered block lives only in VMEM and is
immediately folded into the weighted reduction:

    out[t, i, c] = sum_j sum_s w[t, (j,s), i] * feat[ncc[t,j]*cs + s, c]

Kernel-layout notes (v3; v1 compiled to an 80 MB scoped-VMEM stack and
was rejected by Mosaic; v2's rolled per-(j, s) loops fit but issued the
gather as cs separate (n', k) @ (k, c) matmuls — 32-lane outputs at 1/4
MXU utilization — and lost its model A/B, PERF.md R2F-1..3):

* the ``j`` (neighbor cluster) loop is a ``lax.fori_loop`` whose body
  does ONE full-width (n', k) @ (k, cs*c) gather matmul (256-lane MXU
  output at AFF shapes), then a statically-unrolled ``s`` loop of VPU
  FMAs over the in-register gathered plane (static lane offsets);
* width-1 lane slices (``w_ref[bi, :, col:col+1]``) are gone.  Each one
  forced a 128-lane-padded (n', 1) stack temporary.  The per-(s, i)
  weight broadcast is a tiny constant-matrix MXU matmul:
  ``wjs @ E_j`` with ``E_j[r, i*c+c'] = (r == j*ic + i)`` built from a
  traced-``j`` iota compare;
* features arrive at cluster granularity ``(b, k, cs*c)`` — a pure
  reshape of the token-major layout, no host transpose; weights keep
  ``s`` LEADING (``(b, cs, n'_pad, nnc*ic)``) so the unrolled body
  indexes ``w_ref[bi, s]`` on non-tiled dims, which Mosaic supports
  natively.

One-hot x bf16 is exact (each gathered row is a verbatim feature row), so
this is a gather, not an approximation. FLOPs are n'*nnc*k*(cs*c) MACs —
half of a dense (n', n) weight-plane formulation (the round-1 negative
result, PERF.md) because the one-hot contracts at CLUSTER granularity.

Backward: custom_vjp with a Pallas kernel of the same structure (the
scatter-add into d_feat becomes the one-hot transpose matmul, in VMEM,
deterministic by construction), or the XLA reference chain's VJP under
``MLAFF_MERGE_BWD=xla``. (Same split as the reference: its WF backward is
two separate CUDA kernels, ``clustenwf_cuda_kernel.cu:96-169``.)
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# fp32 parity probes keep 2x the bf16 planes live; the default 16 MB
# scoped-VMEM stack rejected small-s1 fp32 by 880 KB (queue r3f-7) —
# raise to the same 100 MB limit the attention kernel compiles under
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

from .cluster_gather import gather_clusters_onehot
from .clusten import wf_contract

__all__ = ["fused_cluster_merge"]

def _interpret() -> bool:
    # read at CALL time, not import time: this module is imported eagerly
    # by models/layers.py, before test modules get a chance to set the
    # env var.  Off-TPU backends can only run pallas_call under the
    # interpreter (XLA:CPU raises otherwise), so auto-interpret there —
    # an explicit merge_mode='pallas' then works on every backend.
    return (
        os.environ.get("MLAFF_PALLAS_INTERPRET", "0") == "1"
        or jax.default_backend() != "tpu"
    )


def _nccj_column(ncc_all, j):
    """(n', 1) int32: column ``j`` of the (n', nnc) index block, extracted
    with a masked lane-reduction (no dynamic lane slicing)."""
    n_, nnc = ncc_all.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_, nnc), 1)
    return jnp.sum(jnp.where(lane == j, ncc_all, 0), axis=1, keepdims=True)


def _expand_mat(j, nnc, ic, c, dtype):
    """E_j (nnc*ic, ic*c): E[r, i*c + c'] = (r == j*ic + i).

    ``wjs @ E_j`` broadcasts weight column ``j*ic+i`` across output lane
    block ``i`` — the MXU replacement for width-1 lane slices."""
    r = jax.lax.broadcasted_iota(jnp.int32, (nnc * ic, ic * c), 0)
    q = jax.lax.broadcasted_iota(jnp.int32, (nnc * ic, ic * c), 1)
    return (r == j * ic + q // c).astype(dtype)


def _reduce_mat(j, nnc, ic, c, dtype):
    """R_j (ic*c, nnc*ic): R[i*c + c', j*ic + i'] = (i == i').

    ``P @ R_j`` sums each ic*c lane block over its c lanes into weight
    column ``j*ic+i`` — the transpose of ``E_j`` (d_weights path)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (ic * c, nnc * ic), 0)
    q = jax.lax.broadcasted_iota(jnp.int32, (ic * c, nnc * ic), 1)
    return (q == j * ic + r // c).astype(dtype)


def _sum_i_mat(ic, c, dtype):
    """Rm (ic*c, c): Rm[i*c + c', c''] = (c' == c'') — sums over i."""
    r = jax.lax.broadcasted_iota(jnp.int32, (ic * c, c), 0)
    q = jax.lax.broadcasted_iota(jnp.int32, (ic * c, c), 1)
    return (r % c == q).astype(dtype)


def _tile_mat(ic, c, dtype):
    """T (c, ic*c): T[c', i*c + c''] = (c' == c'') — ``gs @ T`` replicates
    the (n', c) gathered slot across the ic lane blocks.  The MXU
    replacement for ``jnp.concatenate([gs] * ic, axis=1)``: at c % 128 != 0
    (AFF stage 1, c=32) the concat's misaligned lane offsets lower to
    VPU shuffle chains (r5g decomposition: 0.73 ms of the 3.8 ms s1
    forward), while the one-hot matmul is exact (each output column is a
    verbatim copy) and near-free on the MXU."""
    r = jax.lax.broadcasted_iota(jnp.int32, (c, ic * c), 0)
    q = jax.lax.broadcasted_iota(jnp.int32, (c, ic * c), 1)
    return (r == q % c).astype(dtype)


def _gtile_mm(c) -> bool:
    """Route the ic-fold lane replication: matmul when the slot width is
    lane-misaligned (unless forced), concat when aligned (free)."""
    mode = os.environ.get("MLAFF_MERGE_GTILE", "cat")
    if mode == "mm":
        return True
    if mode == "cat":
        return False
    return c % 128 != 0


# --- s-batched (v4) constant matrices -------------------------------------
# The v3 bodies loop the cs=8 cluster slots and issue 24-to-32-lane-output
# matmuls per slot (1/4-or-worse MXU utilization; the same narrowness that
# killed v2). The v4 branch assembles every per-slot operand along the lane
# axis once — blocks (s, i) of width c — and contracts with block-diagonal
# one-hot matrices so each (image, j) iteration issues a few FULL-width
# matmuls instead of 3*cs narrow ones. Gated by MLAFF_MERGE_SBATCH and a
# lane-width cap (cs*ic*c beyond ~4k lanes enters the plane class that
# faulted the dense attention kernel; those stages keep the v3 loop).


def _sbatch_dw_mat(j, nnc, ic, c, cs, dtype):
    """RB_j (cs*ic*c, cs*nnc*ic): [s,i,c'] -> column (s, j, i)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (cs * ic * c, cs * nnc * ic), 0)
    q = jax.lax.broadcasted_iota(jnp.int32, (cs * ic * c, cs * nnc * ic), 1)
    s_r, i_r = r // (ic * c), (r // c) % ic
    s_q, rem = q // (nnc * ic), q % (nnc * ic)
    return ((s_r == s_q) & (i_r == rem % ic)
            & (rem // ic == j)).astype(dtype)


def _sbatch_we_mat(j, nnc, ic, c, cs, dtype):
    """EB_j (cs*nnc*ic, cs*ic*c): column (s, j, i) -> blocks (s, i, :)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (cs * nnc * ic, cs * ic * c), 0)
    q = jax.lax.broadcasted_iota(jnp.int32, (cs * nnc * ic, cs * ic * c), 1)
    s_r, rem = r // (nnc * ic), r % (nnc * ic)
    s_q, i_q = q // (ic * c), (q // c) % ic
    return ((s_r == s_q) & (rem % ic == i_q)
            & (rem // ic == j)).astype(dtype)


def _sbatch_sum_i_mat(ic, c, cs, dtype):
    """RMB (cs*ic*c, cs*c): sums blocks over i, keeps (s, c')."""
    r = jax.lax.broadcasted_iota(jnp.int32, (cs * ic * c, cs * c), 0)
    q = jax.lax.broadcasted_iota(jnp.int32, (cs * ic * c, cs * c), 1)
    return ((r // (ic * c) == q // c) & (r % c == q % c)).astype(dtype)


def _sbatch_sum_i_mat(ic, c, cs, dtype):
    """RMB (cs*ic*c, cs*c): sums blocks over i, keeps (s, c')."""
    r = jax.lax.broadcasted_iota(jnp.int32, (cs * ic * c, cs * c), 0)
    q = jax.lax.broadcasted_iota(jnp.int32, (cs * ic * c, cs * c), 1)
    return ((r // (ic * c) == q // c) & (r % c == q % c)).astype(dtype)


def _sbatch_on(cs, ic, c) -> bool:
    if os.environ.get("MLAFF_MERGE_SBATCH", "0") != "1":
        return False
    cap = int(os.environ.get("MLAFF_MERGE_SBATCH_WMAX", "4096"))
    return cs * ic * c <= cap


def _merge_fwd_kernel(w_ref, feat_ref, ncc_ref, out_ref, *, cs: int,
                      ic: int, hiprec: bool):
    """v3 loop structure: ONE full-width (n', k) @ (k, cs*c) gather matmul
    per neighbor cluster ``j`` (256-lane MXU output at AFF shapes), then a
    statically-unrolled ``s`` loop of VPU FMAs over the in-register plane.
    v2 issued the gather as cs separate (n', k) @ (k, c) matmuls — 32-lane
    outputs at 1/4 MXU utilization were why it lost its model A/B
    (PERF.md, R2F-1..3)."""
    gb, k, csc = feat_ref.shape
    n_ = w_ref.shape[2]
    nnc = ncc_ref.shape[2]
    c = csc // cs
    prec = jax.lax.Precision.HIGHEST if hiprec else None
    cdt = jnp.float32 if hiprec else jnp.bfloat16
    sbatch = _sbatch_on(cs, ic, c)
    tilemm = _tile_mat(ic, c, cdt) if _gtile_mm(c) else None
    # MLAFF_MPROBE (perf decomposition only — breaks numerics, mirror of
    # the attention kernel's MLAFF_BPROBE): 'ohconst' drops the ncc
    # masked-lane-reduction one-hot build, 'nogather' the (n', k) @
    # (k, cs*c) gather matmul, 'nowe' the per-s weight-broadcast matmuls,
    # 'nogtile' the per-s lane concat, 'nosloop' the whole per-s FMA
    # chain. scripts/bench_merge.py uses these to attribute the merge
    # cost per stage. Trace-time only; comma-separable.
    mprobe = os.environ.get("MLAFF_MPROBE", "")
    for bi in range(gb):
        ncc_all = ncc_ref[bi]  # (n', nnc)
        kiota = jax.lax.broadcasted_iota(jnp.int32, (n_, k), 1)
        feat2 = feat_ref[bi]  # (k, cs*c) resident

        def jbody(j, acc):
            if "ohconst" in mprobe:
                oh = (kiota == j).astype(cdt)
            else:
                oh = (kiota == _nccj_column(ncc_all, j)).astype(cdt)
            if "nogather" in mprobe:
                # stand-in with a normal layout: a (n', 8) @ (8, cs*c)
                # matmul, ~k/8 x cheaper than the real gather
                g = jax.lax.dot_general(
                    jnp.full((n_, 8), 0.125, cdt), feat2[:8],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
            else:
                g = jax.lax.dot_general(
                    oh, feat2, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )  # (n', cs*c): the full gathered clusters ncc[:, j], f32
            if "nosloop" in mprobe:
                return acc + g[:, : ic * c]
            if sbatch:
                # v4: ONE (n', cs*nnc*ic) @ EB_j broadcast + ONE
                # lane-assembled f32 product + cs-1 block adds replace the
                # cs-iteration loop of 24-lane matmuls; the s-sum stays
                # f32 VPU adds so numerics match the v3 accumulate exactly
                w_cat = jnp.concatenate(
                    [w_ref[bi, s] for s in range(cs)], axis=1
                )  # (n', cs*nnc*ic)
                we_cat = jax.lax.dot_general(
                    w_cat, _sbatch_we_mat(j, nnc, ic, c, cs, cdt),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )  # (n', cs*ic*c): blocks (s, i) = w[:, (j,s,i)]
                g_cat = jnp.concatenate(
                    [jnp.concatenate(
                        [g[:, s * c:(s + 1) * c]] * ic, axis=1)
                     for s in range(cs)], axis=1
                )  # (n', cs*ic*c): blocks (s, i) = gs
                prod = we_cat * g_cat  # f32
                for s in range(cs):
                    acc = acc + prod[:, s * ic * c:(s + 1) * ic * c]
                return acc
            ej = _expand_mat(j, nnc, ic, c, cdt)
            for s in range(cs):  # static: lane slices at fixed offsets
                gs = g[:, s * c:(s + 1) * c]
                if "nowe" in mprobe:
                    we = g[:, : ic * c]
                else:
                    we = jax.lax.dot_general(
                        w_ref[bi, s], ej, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec,
                    )  # (n', ic*c): w[:,(j,s,i)] broadcast over lane blk i
                if "nogtile" in mprobe:
                    gtile = g[:, : ic * c]
                elif tilemm is not None:
                    # exact one-hot replication, no lane shuffles. bf16
                    # operands: the gathered rows are verbatim bf16
                    # feature values (one-hot x bf16), so the cast is
                    # exact; an f32 HIGHEST variant measured 3.8 -> 8.4
                    # ms s1 fwd (f32 MXU passes, 48 issues/image)
                    gtile = jax.lax.dot_general(
                        gs.astype(cdt), tilemm, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    )
                else:
                    gtile = jnp.concatenate([gs] * ic, axis=1)
                acc = acc + we * gtile
            return acc

        acc = jax.lax.fori_loop(
            0, nnc, jbody, jnp.zeros((n_, ic * c), jnp.float32)
        )
        out_ref[bi] = acc.astype(out_ref.dtype)


def _merge_bwd_kernel(w_ref, feat_ref, ncc_ref, g_ref, dw_ref, dfeat_ref,
                      *, cs: int, ic: int, hiprec: bool):
    """Backward of the fused merge, same in-VMEM structure as forward.

    d_w[t,(j,s),i] = sum_c g[t,i,c] * gs_j[t, c]
    d_feat_s      += sum_j oh_j^T @ M_js,
        M_js[t, c] = sum_i w[t,(j,s),i] * g[t,i,c]

    The reference splits its WF backward the same way into a dense
    d_weights kernel and a scatter-add d_feat kernel
    (``clustenwf_cuda_kernel.cu:96-169``); the scatter-add becomes the
    one-hot transpose matmul, in VMEM, deterministic by construction.
    Disjoint weight columns are written per ``j`` via read-modify-write
    (exact: every slab is only touched once); d_feat accumulates in a
    float32 ref.
    """
    gb, k, csc = feat_ref.shape
    n_ = w_ref.shape[2]
    nnc = ncc_ref.shape[2]
    c = csc // cs
    prec = jax.lax.Precision.HIGHEST if hiprec else None
    cdt = jnp.float32 if hiprec else jnp.bfloat16
    rm = _sum_i_mat(ic, c, cdt)
    sbatch = _sbatch_on(cs, ic, c)
    rmb = _sbatch_sum_i_mat(ic, c, cs, cdt) if sbatch else None
    tilemm = _tile_mat(ic, c, cdt) if _gtile_mm(c) else None
    # MLAFF_MERGE_BWD_ACC=reg: accumulate d_feat and the cs d_weights
    # slabs in the fori carry and write each ref ONCE after the j loop.
    # Motivated by the r5g decomposition (the ref RMW legs are the two
    # largest bwd exposures at every stage) but it LOST the r5l chip A/B
    # at every stage (s1 bwd 5.85 vs 4.94 ms): Mosaic materializes the
    # carry tuple per iteration, costing more than the RMWs it removes.
    # The v3 read-modify-write stays the default; numerics of the two
    # paths are identical (f32, same j order, each slab produced once).
    regacc = (os.environ.get("MLAFF_MERGE_BWD_ACC", "ref") == "reg"
              and not sbatch)
    # MLAFF_MPROBE bwd legs (see forward): 'ohconst', 'nogather', plus
    # 'nodw' (drop the d_weights P@R_j chain), 'nowe' (drop the
    # M_js = (w@E_j . g) @ Rm chain; the scatter consumes g instead) and
    # 'noscatter' (drop the oh^T @ mall d_feat matmul + accumulate).
    mprobe = os.environ.get("MLAFF_MPROBE", "")
    for bi in range(gb):
        ncc_all = ncc_ref[bi]
        kiota = jax.lax.broadcasted_iota(jnp.int32, (n_, k), 1)
        gall = g_ref[bi]  # (n', ic*c)
        feat2 = feat_ref[bi]  # (k, cs*c)
        if not regacc:
            for s in range(cs):
                dw_ref[bi, s] = jnp.zeros(dw_ref.shape[2:], dw_ref.dtype)
            dfeat_ref[bi] = jnp.zeros(dfeat_ref.shape[1:], dfeat_ref.dtype)
        if sbatch:
            # blocks (s, i) = gall_i — image-invariant across j, hoisted
            gall_cat = jnp.concatenate([gall] * cs, axis=1)
            w_cat = jnp.concatenate(
                [w_ref[bi, s] for s in range(cs)], axis=1
            )  # (n', cs*nnc*ic)

        def jbody_sbatch(j, _):
            # v4: per (image, j) issue 4 full-width matmuls (gather,
            # dw-reduce, we-broadcast, dfeat-scatter) + 1 lane product
            # instead of the v3 cs-loop's 3*cs narrow (24/32-lane) ones
            oh = (kiota == _nccj_column(ncc_all, j)).astype(cdt)
            g = jax.lax.dot_general(
                oh, feat2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (n', cs*c)
            g_cat = jnp.concatenate(
                [jnp.concatenate(
                    [g[:, s * c:(s + 1) * c]] * ic, axis=1)
                 for s in range(cs)], axis=1
            )  # (n', cs*ic*c): blocks (s, i) = gs
            # d_w: products rounded to cdt pre-reduce exactly like v3's
            # (gall * gstile) @ rj path
            ps = (gall_cat.astype(jnp.float32)
                  * g_cat).astype(cdt)  # (n', cs*ic*c)
            dw_cat = jax.lax.dot_general(
                ps, _sbatch_dw_mat(j, nnc, ic, c, cs, cdt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (n', cs*nnc*ic), nonzero only in j's columns per s block
            for s in range(cs):
                dw_ref[bi, s] = dw_ref[bi, s] + dw_cat[
                    :, s * nnc * ic:(s + 1) * nnc * ic
                ].astype(dw_ref.dtype)
            # M blocks: sum_i w[:, (j,s,i)] * g_i, assembled for ALL s
            we_cat = jax.lax.dot_general(
                w_cat, _sbatch_we_mat(j, nnc, ic, c, cs, cdt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (n', cs*ic*c)
            mall = jax.lax.dot_general(
                (we_cat * gall_cat.astype(jnp.float32)).astype(cdt), rmb,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (n', cs*c)
            dfeat_ref[bi] = dfeat_ref[bi] + jax.lax.dot_general(
                oh, mall.astype(cdt), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ).astype(dfeat_ref.dtype)
            return 0

        def jbody(j, carry):
            if regacc:
                dfeat_acc, dw_accs = carry
            if "ohconst" in mprobe:
                oh = (kiota == j).astype(cdt)
            else:
                oh = (kiota == _nccj_column(ncc_all, j)).astype(cdt)
            if "nogather" in mprobe:
                # stand-in with a normal layout: a (n', 8) @ (8, cs*c)
                # matmul, ~k/8 x cheaper than the real gather
                g = jax.lax.dot_general(
                    jnp.full((n_, 8), 0.125, cdt), feat2[:8],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
            else:
                g = jax.lax.dot_general(
                    oh, feat2, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )  # (n', cs*c) gathered clusters, f32 (fwd's hoist)
            ej = _expand_mat(j, nnc, ic, c, cdt)
            rj = _reduce_mat(j, nnc, ic, c, cdt)
            mjs_all = []
            for s in range(cs):  # static lane offsets
                gs = g[:, s * c:(s + 1) * c]
                if "nodw" not in mprobe:
                    if tilemm is not None:
                        gstile = jax.lax.dot_general(
                            gs.astype(cdt), tilemm, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec,
                        )  # exact replication (see fwd), no lane shuffles
                    else:
                        gstile = jnp.concatenate(
                            [gs] * ic, axis=1)  # (n', ic*c)
                    # d_w columns j*ic+i: sum_c g_i * gs  (P @ R_j)
                    dws = jax.lax.dot_general(
                        (gall * gstile.astype(gall.dtype)), rj,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec,
                    )  # (n', nnc*ic), nonzero only in this j's columns
                    if regacc:
                        dw_accs = (dw_accs[:s]
                                   + (dw_accs[s] + dws,)
                                   + dw_accs[s + 1:])
                    else:
                        dw_ref[bi, s] = (
                            dw_ref[bi, s] + dws.astype(dw_ref.dtype)
                        )
                if "nowe" in mprobe:
                    continue
                # M_js = sum_i w[:, (j,s,i)] * g_i  ((WE . g) @ Rm)
                we = jax.lax.dot_general(
                    w_ref[bi, s], ej, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                mjs_all.append(jax.lax.dot_general(
                    (we * gall.astype(jnp.float32)).astype(cdt), rm,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                ))  # (n', c)
            if "noscatter" in mprobe:
                return (dfeat_acc, dw_accs) if regacc else 0
            # d_feat scatter for this j: ONE (k, n') @ (n', cs*c) one-hot
            # transpose matmul over the s-assembled plane (v2 issued cs
            # separate (k, n') @ (n', c) 32-lane matmuls here)
            if "nowe" in mprobe:
                mall = g  # shape-compatible stand-in, keeps the scatter
            else:
                mall = jnp.concatenate(mjs_all, axis=1)  # (n', cs*c)
            dfj = jax.lax.dot_general(
                oh, mall.astype(cdt), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            if regacc:
                return (dfeat_acc + dfj, dw_accs)
            dfeat_ref[bi] = dfeat_ref[bi] + dfj.astype(dfeat_ref.dtype)
            return 0

        if sbatch:
            jax.lax.fori_loop(0, nnc, jbody_sbatch, 0)
        elif regacc:
            init = (
                jnp.zeros((k, csc), jnp.float32),
                tuple(jnp.zeros((n_, nnc * ic), jnp.float32)
                      for _ in range(cs)),
            )
            dfeat_acc, dw_accs = jax.lax.fori_loop(0, nnc, jbody, init)
            dfeat_ref[bi] = dfeat_acc.astype(dfeat_ref.dtype)
            for s in range(cs):
                dw_ref[bi, s] = dw_accs[s].astype(dw_ref.dtype)
        else:
            jax.lax.fori_loop(0, nnc, jbody, 0)


def _pad_axis(x, axis, target):
    n = x.shape[axis]
    if n == target:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    return jnp.pad(x, pad)


def _layouts(weights, feat, ncc, cs):
    """Host-side re-layouts. Features need only a reshape to cluster
    granularity (b, k, cs*c) — the same resident layout the attention
    kernel uses; weights move s to a leading (Mosaic-indexable) dim."""
    b, n_, m, ic = weights.shape
    n, c = feat.shape[1], feat.shape[2]
    nnc = ncc.shape[-1]
    k = -(-n // cs)
    n_pad = -(-n_ // 8) * 8
    feat2 = _pad_axis(feat, 1, k * cs).reshape(b, k, cs * c)
    # weights (b, n', nnc*cs, ic) -> (b, cs, n'_pad, nnc*ic)
    w4 = (
        _pad_axis(weights.reshape(b, n_, nnc, cs, ic), 1, n_pad)
        .transpose(0, 3, 1, 2, 4)
        .reshape(b, cs, n_pad, nnc * ic)
    )
    nccp = _pad_axis(ncc, 1, n_pad)
    return feat2, w4, nccp, k, n_pad


def _pick_gb(b, per_image):
    budget = int(os.environ.get("MLAFF_MERGE_BUDGET_MB", "8")) * 2**20
    gb = 1
    while gb < 4 and gb * 2 <= b and b % (gb * 2) == 0 \
            and gb * 2 * per_image <= budget:
        gb *= 2
    return gb


def _stack_model(n_, k, cs, c, ic, nnc, itemsize, bwd=False):
    """Per-image scoped-VMEM estimate for the rolled-loop kernel body.

    Everything n'-rows-tall is lane-padded to 128 by Mosaic, so count
    max(lanes, 128); the fori bodies reuse their stack across iterations
    so only ONE (j, s) iteration is live at a time."""
    lane = 128
    f32 = 4
    base = (
        n_ * max(k, lane) * itemsize      # one-hot
        + n_ * max(cs * c, lane) * f32    # gathered plane g (live per j)
        + n_ * max(ic * c, lane) * f32 * 3  # acc + we + gtile
        + n_ * max(nnc * ic, lane) * f32  # wjs load / dws
        + n_ * max(nnc, lane) * 4 * 2     # ncc block + masked temp
        + k * max(cs * c, lane) * itemsize  # feat slab
    )
    if _sbatch_on(cs, ic, c):
        # v4 keeps ~3 lane-assembled (n', cs*ic*c) planes live per j
        # (g_cat / we_cat / product) plus the hoisted gall_cat
        base += n_ * max(cs * ic * c, lane) * f32 * 4
    if bwd and os.environ.get("MLAFF_MERGE_BWD_ACC", "ref") == "reg":
        # v5 bwd fori carry: d_feat (k, cs*c) + cs d_weights slabs
        # (lane-padded) held in registers/stack across the j loop
        base += k * max(cs * c, lane) * f32
        base += cs * n_ * max(nnc * ic, lane) * f32
    return base


def _merge_fwd_impl(weights, feat, ncc, cluster_size):
    b, n_, m, ic = weights.shape
    n, c = feat.shape[1], feat.shape[2]
    nnc = ncc.shape[-1]
    cs = cluster_size
    assert m == nnc * cs, f"m={m} != nnc*cs={nnc}*{cs}"
    feat2, w4, nccp, k, n_pad = _layouts(weights, feat, ncc, cs)
    gb = _pick_gb(b, _stack_model(n_pad, k, cs, c, ic, nnc,
                                  feat2.dtype.itemsize))

    kernel = functools.partial(
        _merge_fwd_kernel, cs=cs, ic=ic,
        hiprec=(weights.dtype == jnp.float32),
    )
    out = pl.pallas_call(
        kernel,
        grid=(b // gb,),
        in_specs=[
            pl.BlockSpec((gb, cs, n_pad, nnc * ic), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((gb, k, cs * c), lambda i: (i, 0, 0)),
            pl.BlockSpec((gb, n_pad, nnc), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((gb, n_pad, ic * c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, ic * c), weights.dtype),
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(w4, feat2, nccp)
    return out[:, :n_].reshape(b, n_, ic, c)


def _merge_bwd_impl(weights, feat, ncc, cluster_size, g):
    b, n_, m, ic = weights.shape
    n, c = feat.shape[1], feat.shape[2]
    nnc = ncc.shape[-1]
    cs = cluster_size
    feat2, w4, nccp, k, n_pad = _layouts(weights, feat, ncc, cs)
    g3 = _pad_axis(
        g.reshape(b, n_, ic * c).astype(weights.dtype), 1, n_pad
    )
    gb = _pick_gb(b, _stack_model(n_pad, k, cs, c, ic, nnc,
                                  feat2.dtype.itemsize, bwd=True) * 2)

    kernel = functools.partial(
        _merge_bwd_kernel, cs=cs, ic=ic,
        hiprec=(weights.dtype == jnp.float32),
    )
    dw4, dfeat2 = pl.pallas_call(
        kernel,
        grid=(b // gb,),
        in_specs=[
            pl.BlockSpec((gb, cs, n_pad, nnc * ic), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((gb, k, cs * c), lambda i: (i, 0, 0)),
            pl.BlockSpec((gb, n_pad, nnc), lambda i: (i, 0, 0)),
            pl.BlockSpec((gb, n_pad, ic * c), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((gb, cs, n_pad, nnc * ic), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((gb, k, cs * c), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, cs, n_pad, nnc * ic), weights.dtype),
            jax.ShapeDtypeStruct((b, k, cs * c), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(w4, feat2, nccp, g3)
    dw = (
        dw4.reshape(b, cs, n_pad, nnc, ic)
        .transpose(0, 2, 3, 1, 4)
        .reshape(b, n_pad, m, ic)[:, :n_]
    )
    dfeat = dfeat2.reshape(b, k * cs, c)[:, :n].astype(feat.dtype)
    return dw, dfeat


def _merge_ref(weights, feat, ncc, cluster_size):
    """XLA reference semantics (identical math): gather + contract."""
    feat_g = gather_clusters_onehot(
        feat[:, None].astype(weights.dtype), ncc, cluster_size
    )[:, 0]
    return wf_contract(weights, feat_g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_cluster_merge(weights, feat, ncc, cluster_size):
    """PointConv merge over cluster neighborhoods, gather fused in-VMEM.

    Args:
        weights: ``(b, n', m, ic)`` pointconv weights, ``m = nnc * cs``
            ordered member-major (cluster j's slot s at ``j*cs + s``) —
            the layout ``ClusterMerging`` already produces.
        feat: ``(b, n, c)`` cluster-ordered token features.
        ncc: ``(b, n', nnc)`` int32 nearest-cluster indices per center.
        cluster_size: ``cs``.

    Returns:
        ``(b, n', ic, c)``, bit-comparable to
        ``wf_contract(weights, gather_clusters_onehot(feat[:,None], ncc,
        cs)[:,0])`` (both accumulate in f32).
    """
    return _merge_fwd_impl(weights, feat, ncc, cluster_size)


def _fcm_fwd(weights, feat, ncc, cluster_size):
    return _merge_fwd_impl(weights, feat, ncc, cluster_size), (
        weights, feat, ncc,
    )


def _fcm_bwd(cluster_size, res, g):
    weights, feat, ncc = res
    if os.environ.get("MLAFF_MERGE_BWD", "pallas") == "pallas":
        dw, df = _merge_bwd_impl(weights, feat, ncc, cluster_size, g)
    else:
        # XLA reference chain's VJP (A/B + fallback): the scatter-add into
        # d_feat is the one-hot transpose matmul XLA lowers deterministically
        _, vjp = jax.vjp(
            lambda w, f: _merge_ref(w, f, ncc, cluster_size), weights, feat
        )
        dw, df = vjp(g)
    return dw, df, None


fused_cluster_merge.defvjp(_fcm_fwd, _fcm_bwd)
