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
granularity ``(k, cs*c)``, and each of a center's ``nnc`` nearest clusters
is fetched by an in-VMEM one-hot matmul — the gathered block lives only in
registers/VMEM and is immediately folded into the weighted reduction:

    out[t, i, c] = sum_j sum_s w[t, (j,s), i] * feat[ncc[t,j]*cs + s, c]

per image:  for j < nnc:   G_j = onehot(ncc[:, j]) @ featc   (MXU, k-dim)
            for s < cs, i < ic:  acc_i += w3[:, (j,s,i)] * G_j[:, s*c:(s+1)*c]

One-hot x bf16 is exact (each G_j row is a verbatim feature row), so this
is a gather, not an approximation. FLOPs are n'*nnc*k*(cs*c) MACs — half
of a dense (n', n) weight-plane formulation (the round-1 negative result,
PERF.md) because the one-hot contracts at CLUSTER granularity. Weight and
index operands are passed through zero-cost row-major reshapes only.

Backward: custom_vjp whose bwd is the XLA reference chain's VJP — the
scatter-add into d_feat becomes the one-hot transpose matmul XLA already
lowers deterministically; d_weights recomputes the gathered block. (Same
split as the reference: its WF backward is two separate CUDA kernels,
``clustenwf_cuda_kernel.cu:96-169``.)
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .cluster_gather import gather_clusters_onehot
from .clusten import wf_contract

__all__ = ["fused_cluster_merge"]

def _interpret() -> bool:
    # read at CALL time, not import time: this module is imported eagerly
    # by models/layers.py, before test modules get a chance to set the
    # env var (clusten_pallas gets away with import-time binding only
    # because it is imported lazily inside ClusterAttention.__call__)
    return os.environ.get("MLAFF_PALLAS_INTERPRET", "0") == "1"


def _merge_fwd_kernel(w_ref, feat_ref, ncc_ref, out_ref, *, cs: int,
                      ic: int, hiprec: bool):
    gb, k, csc = feat_ref.shape
    c = csc // cs
    n_ = w_ref.shape[1]
    nnc = ncc_ref.shape[2]
    prec = jax.lax.Precision.HIGHEST if hiprec else None
    for bi in range(gb):
        featc = feat_ref[bi]  # (k, cs*c) resident
        kiota = jax.lax.broadcasted_iota(jnp.int32, (n_, k), 1)
        accs = [jnp.zeros((n_, c), jnp.float32) for _ in range(ic)]
        for j in range(nnc):
            oh = (kiota == ncc_ref[bi, :, j:j + 1]).astype(featc.dtype)
            gj = jax.lax.dot_general(
                oh, featc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (n_, cs*c): cluster ncc[t, j]'s rows, f32
            for s in range(cs):
                gsc = gj[:, s * c:(s + 1) * c]  # (n_, c) lane slice
                base = (j * cs + s) * ic
                for i in range(ic):
                    wv = w_ref[bi, :, base + i:base + i + 1].astype(
                        jnp.float32
                    )  # (n_, 1) sublane vector
                    accs[i] = accs[i] + wv * gsc
        for i in range(ic):
            out_ref[bi, :, i * c:(i + 1) * c] = accs[i].astype(out_ref.dtype)


def _merge_bwd_kernel(w_ref, feat_ref, ncc_ref, g_ref, dw_ref, dfeat_ref,
                      *, cs: int, ic: int, hiprec: bool):
    """Backward of the fused merge, same in-VMEM structure as forward.

    d_w[t,(j,s),i] = sum_c g[t,i,c] * (oh_j @ featc)[t, s*c+c]
    d_featc       += sum_j oh_j^T @ M_j,
        M_j[t, s*c+c] = sum_i w[t,(j,s),i] * g[t,i,c]

    The reference splits its WF backward the same way into a dense
    d_weights kernel and a scatter-add d_feat kernel
    (``clustenwf_cuda_kernel.cu:96-169``); the scatter-add becomes the
    one-hot transpose matmul, in VMEM, deterministic by construction.
    """
    gb, k, csc = feat_ref.shape
    c = csc // cs
    n_ = w_ref.shape[1]
    nnc = ncc_ref.shape[2]
    prec = jax.lax.Precision.HIGHEST if hiprec else None
    for bi in range(gb):
        featc = feat_ref[bi]
        kiota = jax.lax.broadcasted_iota(jnp.int32, (n_, k), 1)
        gsl = [
            g_ref[bi, :, i * c:(i + 1) * c].astype(jnp.float32)
            for i in range(ic)
        ]
        dfeat = jnp.zeros((k, csc), jnp.float32)
        for j in range(nnc):
            oh = (kiota == ncc_ref[bi, :, j:j + 1]).astype(featc.dtype)
            gj = jax.lax.dot_general(
                oh, featc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (n_, cs*c)
            m_cols = []
            dw_cols = []
            for s in range(cs):
                gj_s = gj[:, s * c:(s + 1) * c]
                acc_s = jnp.zeros((n_, c), jnp.float32)
                for i in range(ic):
                    col = ((j * cs + s) * ic + i)
                    wv = w_ref[bi, :, col:col + 1].astype(jnp.float32)
                    acc_s = acc_s + wv * gsl[i]
                    dw_cols.append(
                        (gsl[i] * gj_s).sum(axis=1, keepdims=True)
                    )
                m_cols.append(acc_s)
            dw_ref[bi, :, j * cs * ic:(j + 1) * cs * ic] = (
                jnp.concatenate(dw_cols, axis=1).astype(dw_ref.dtype)
            )
            mj = jnp.concatenate(m_cols, axis=1).astype(featc.dtype)
            dfeat = dfeat + jax.lax.dot_general(
                oh, mj, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
        dfeat_ref[bi] = dfeat.astype(dfeat_ref.dtype)


def _merge_bwd_impl(weights, feat, ncc, cluster_size, g):
    b, n_, m, ic = weights.shape
    n, c = feat.shape[1], feat.shape[2]
    nnc = ncc.shape[-1]
    cs = cluster_size
    k = -(-n // cs)
    featc = _pad_axis(feat, 1, k * cs).reshape(b, k, cs * c)
    n_pad = -(-n_ // 8) * 8
    w3 = _pad_axis(weights.reshape(b, n_, m * ic), 1, n_pad)
    nccp = _pad_axis(ncc, 1, n_pad)
    g3 = _pad_axis(
        g.reshape(b, n_, ic * c).astype(weights.dtype), 1, n_pad
    )

    per_image = (
        k * cs * c * 2 * 2          # featc + M_j
        + n_pad * cs * c * 4        # G_j f32
        + n_pad * max(k, 128) * 2   # onehot
        + 2 * n_pad * max(m * ic, 256) * 2  # w3 + dw
        + n_pad * max(ic * c, 128) * 2     # g3
        + k * cs * c * 4            # dfeat acc
    )
    budget = int(os.environ.get("MLAFF_MERGE_BUDGET_MB", "10")) * 2**20
    gb = 1
    while gb < 8 and gb * 2 <= b and b % (gb * 2) == 0 \
            and gb * 2 * per_image <= budget:
        gb *= 2

    kernel = functools.partial(
        _merge_bwd_kernel, cs=cs, ic=ic,
        hiprec=(weights.dtype == jnp.float32),
    )
    dw3, dfeatc = pl.pallas_call(
        kernel,
        grid=(b // gb,),
        in_specs=[
            pl.BlockSpec((gb, n_pad, m * ic), lambda i: (i, 0, 0)),
            pl.BlockSpec((gb, k, cs * c), lambda i: (i, 0, 0)),
            pl.BlockSpec((gb, n_pad, nnc), lambda i: (i, 0, 0)),
            pl.BlockSpec((gb, n_pad, ic * c), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((gb, n_pad, m * ic), lambda i: (i, 0, 0)),
            pl.BlockSpec((gb, k, cs * c), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, m * ic), weights.dtype),
            jax.ShapeDtypeStruct((b, k, cs * c), jnp.float32),
        ],
        interpret=_interpret(),
    )(w3, featc, nccp, g3)
    dw = dw3[:, :n_].reshape(b, n_, m, ic)
    dfeat = dfeatc.reshape(b, k * cs, c)[:, :n].astype(feat.dtype)
    return dw, dfeat


def _merge_ref(weights, feat, ncc, cluster_size):
    """XLA reference semantics (identical math): gather + contract."""
    feat_g = gather_clusters_onehot(
        feat[:, None].astype(weights.dtype), ncc, cluster_size
    )[:, 0]
    return wf_contract(weights, feat_g)


def _pad_axis(x, axis, target):
    n = x.shape[axis]
    if n == target:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    return jnp.pad(x, pad)


def _merge_fwd_impl(weights, feat, ncc, cluster_size):
    b, n_, m, ic = weights.shape
    n, c = feat.shape[1], feat.shape[2]
    nnc = ncc.shape[-1]
    cs = cluster_size
    assert m == nnc * cs, f"m={m} != nnc*cs={nnc}*{cs}"
    k = -(-n // cs)
    featc = _pad_axis(feat, 1, k * cs).reshape(b, k, cs * c)
    # (n', m, ic) -> (n', nnc*cs*ic): row-major, zero-cost
    n_pad = -(-n_ // 8) * 8
    w3 = _pad_axis(weights.reshape(b, n_, m * ic), 1, n_pad)
    nccp = _pad_axis(ncc, 1, n_pad)

    # images per instance, VMEM-bounded: featc + G_j + onehot + w3 + accs
    per_image = (
        k * cs * c * 2            # featc bf16
        + n_pad * cs * c * 4      # G_j f32
        + n_pad * max(k, 128) * 2   # onehot bf16 (lane-padded)
        + n_pad * max(m * ic, 256) * 2  # w3
        + (ic + 1) * n_pad * max(c, 128) * 4  # accs + out
    )
    budget = int(os.environ.get("MLAFF_MERGE_BUDGET_MB", "10")) * 2**20
    gb = 1
    while gb < 8 and gb * 2 <= b and b % (gb * 2) == 0 \
            and gb * 2 * per_image <= budget:
        gb *= 2

    kernel = functools.partial(
        _merge_fwd_kernel, cs=cs, ic=ic,
        hiprec=(weights.dtype == jnp.float32),
    )
    out = pl.pallas_call(
        kernel,
        grid=(b // gb,),
        in_specs=[
            pl.BlockSpec((gb, n_pad, m * ic), lambda i: (i, 0, 0)),
            pl.BlockSpec((gb, k, cs * c), lambda i: (i, 0, 0)),
            pl.BlockSpec((gb, n_pad, nnc), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((gb, n_pad, ic * c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, ic * c), weights.dtype),
        interpret=_interpret(),
    )(w3, featc, nccp)
    return out[:, :n_].reshape(b, n_, ic, c)


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
