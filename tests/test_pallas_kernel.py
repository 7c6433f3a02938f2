"""Fused Pallas attention vs the XLA one-hot formulation.

Runs the kernel through the Pallas interpreter on CPU (the TPU-compiled
path is additionally cross-checked on hardware by scripts/parity_probe.py
and the benchmark); exactness argument: the kernel's dense-masked softmax
must match gather-attention wherever neighborhoods are duplicate-free,
which kNN guarantees.

Operand layout: token-major q (b, n, h*c_) and fused kv (b, n, h*2*c_)
with per-head (k, v) channel interleave — see clusten_pallas docstring.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_autofocusformermod_tpu.models.layers import rel_pos_features
from ml_autofocusformermod_tpu.ops.cluster_gather import gather_clusters_onehot
from ml_autofocusformermod_tpu.ops.clusten_pallas import fused_cluster_attention

B, H, CS, NNC, C_ = 2, 2, 8, 3, 16
R = 27


def to_token_major(x):
    """(b, h, n, c_) -> (b, n, h*c_)."""
    b, h, n, c_ = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * c_)


def fuse_kv(k, v):
    """head-major k/v -> (b, n, h*2*c_) with per-head (k, v) interleave."""
    b, h, n, c_ = k.shape
    kv = jnp.stack([k, v], axis=3)  # b h n 2 c_
    return kv.transpose(0, 2, 1, 3, 4).reshape(b, n, h * 2 * c_)


def make_inputs(n, seed=0):
    k_ = -(-n // CS)
    ks = jax.random.split(jax.random.PRNGKey(seed), 9)
    q = jax.random.normal(ks[0], (B, H, n, C_), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, n, C_), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, n, C_), jnp.float32)
    ncc = jnp.argsort(jax.random.uniform(ks[3], (B, n, k_)), axis=-1)[
        :, :, :NNC
    ].astype(jnp.int32)
    pos = jax.random.randint(ks[4], (B, n, 2), 0, 28).astype(jnp.float32)
    w5 = jax.random.normal(ks[5], (5, H)) * 0.1
    bh = jax.random.normal(ks[6], (H,)) * 0.1
    blank_k = jax.random.normal(ks[7], (C_, H)) * 0.5
    blank_v = jax.random.normal(ks[8], (H, C_)) * 0.5
    return q, k, v, ncc, pos, w5, bh, blank_k, blank_v


def xla_reference(q, k, v, ncc, pos, w5, bh, blank_k, blank_v, n):
    pos_g = gather_clusters_onehot(pos[:, None], ncc, CS)[:, 0]
    rel = pos_g - (pos[:, :, None, :] - R)
    pf = rel_pos_features(rel, R)
    bias = jnp.einsum("bnmf,fh->bhnm", pf, w5) + bh[None, :, None, None]
    kg = gather_clusters_onehot(k, ncc, CS)
    vg = gather_clusters_onehot(v, ncc, CS)
    attn = jnp.einsum("bhic,bhimc->bhim", q, kg) + bias
    # exclude padded slots entirely (kernel semantics; equivalent to the
    # reference's -100 within fp32, see clusten_pallas docstring)
    slot = jnp.arange(CS)
    token_idx = (ncc[..., None] * CS + slot).reshape(ncc.shape[0], n, -1)
    pad_ok = (token_idx < n)[:, None]
    attn = jnp.where(pad_ok, attn, -1e30)
    blank = jnp.einsum("bhic,ch->bhi", q, blank_k)[..., None]  # b h n 1
    full = jnp.concatenate([attn, blank], -1)
    p = jax.nn.softmax(full, -1)
    pb = p[..., -1:]
    p = jnp.where(pad_ok, p[..., :-1], 0.0)
    out = jnp.einsum("bhim,bhimc->bhic", p, vg)
    out = out + pb * blank_v[None, :, None, :]
    return to_token_major(out)


@pytest.mark.parametrize("n", [128, 196])  # 196: padded last cluster
def test_fused_forward_matches_xla(n):
    q, k, v, ncc, pos, w5, bh, bk, bv = make_inputs(n)
    with jax.default_matmul_precision("highest"):
        o_ref = xla_reference(q, k, v, ncc, pos, w5, bh, bk, bv, n)
        o_f = fused_cluster_attention(
            to_token_major(q), fuse_kv(k, v), ncc, pos, w5, bh, bk, bv,
            H, CS, R, 0,
        )
    np.testing.assert_allclose(
        np.asarray(o_f), np.asarray(o_ref), atol=2e-5, rtol=1e-4
    )


def test_fused_gradients_match_xla():
    n = 128
    q, k, v, ncc, pos, w5, bh, bk, bv = make_inputs(n, seed=1)
    q_tm, kv_tm = to_token_major(q), fuse_kv(k, v)

    def loss_fused(q_tm, kv_tm, w5, bh, bk, bv):
        o = fused_cluster_attention(
            q_tm, kv_tm, ncc, pos, w5, bh, bk, bv, H, CS, R, 0
        )
        return (o**2).sum()

    def loss_ref(q_tm, kv_tm, w5, bh, bk, bv):
        qh = q_tm.reshape(B, n, H, C_).transpose(0, 2, 1, 3)
        kvh = kv_tm.reshape(B, n, H, 2, C_)
        kh = kvh[..., 0, :].transpose(0, 2, 1, 3)
        vh = kvh[..., 1, :].transpose(0, 2, 1, 3)
        o = xla_reference(qh, kh, vh, ncc, pos, w5, bh, bk, bv, n)
        return (o**2).sum()

    with jax.default_matmul_precision("highest"):
        g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
            q_tm, kv_tm, w5, bh, bk, bv
        )
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
            q_tm, kv_tm, w5, bh, bk, bv
        )
    for a, b, name in zip(g1, g2, ["q", "kv", "w5", "bh", "blank_k", "blank_v"]):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-5,
            err_msg=f"grad mismatch for {name}",
        )


@pytest.mark.parametrize("n", [128, 196, 617])
def test_stacked_forward_matches_xla(monkeypatch, n):
    """Stacked dense path (MLAFF_STACK=1, small-token stages): image group
    folded into rows — vs the XLA oracle. n=196 covers row padding;
    n=617 (np_=624) covers the stage-2 width class the raised
    MLAFF_STACK_NMAX=800 default now routes here."""
    monkeypatch.setenv("MLAFF_STACK", "1")
    q, k, v, ncc, pos, w5, bh, bk, bv = make_inputs(n, seed=3)
    with jax.default_matmul_precision("highest"):
        o_ref = xla_reference(q, k, v, ncc, pos, w5, bh, bk, bv, n)
        o_f = fused_cluster_attention(
            to_token_major(q), fuse_kv(k, v), ncc, pos, w5, bh, bk, bv,
            H, CS, R, 0,
        )
    np.testing.assert_allclose(
        np.asarray(o_f), np.asarray(o_ref), atol=2e-5, rtol=1e-4
    )


def test_dense_padded_rows_matches_xla():
    """Unfactorable dense n (617 is prime -> no divisor tile) triggers
    query-row padding (_dense_pad_tile): fwd + all grads must match the
    XLA oracle. This is the MaskFiner shape class (n=1921=17*113) whose
    whole-row tile blew up the remote Mosaic compile (queue r3d-2)."""
    n = 617
    q, k, v, ncc, pos, w5, bh, bk, bv = make_inputs(n, seed=7)
    q_tm, kv_tm = to_token_major(q), fuse_kv(k, v)

    def loss_fused(q_tm, kv_tm, w5, bh, bk, bv):
        o = fused_cluster_attention(
            q_tm, kv_tm, ncc, pos, w5, bh, bk, bv, H, CS, R, 0
        )
        return (o**2).sum()

    def loss_ref(q_tm, kv_tm, w5, bh, bk, bv):
        qh = q_tm.reshape(B, n, H, C_).transpose(0, 2, 1, 3)
        kvh = kv_tm.reshape(B, n, H, 2, C_)
        kh = kvh[..., 0, :].transpose(0, 2, 1, 3)
        vh = kvh[..., 1, :].transpose(0, 2, 1, 3)
        o = xla_reference(qh, kh, vh, ncc, pos, w5, bh, bk, bv, n)
        return (o**2).sum()

    with jax.default_matmul_precision("highest"):
        o_f = fused_cluster_attention(
            q_tm, kv_tm, ncc, pos, w5, bh, bk, bv, H, CS, R, 0
        )
        o_ref = xla_reference(q, k, v, ncc, pos, w5, bh, bk, bv, n)
        np.testing.assert_allclose(
            np.asarray(o_f), np.asarray(o_ref), atol=2e-5, rtol=1e-4
        )
        g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
            q_tm, kv_tm, w5, bh, bk, bv
        )
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
            q_tm, kv_tm, w5, bh, bk, bv
        )
    for a, b_, name in zip(
        g1, g2, ["q", "kv", "w5", "bh", "blank_k", "blank_v"]
    ):
        scale = max(float(jnp.abs(b_).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b_) / scale, atol=5e-5,
            err_msg=f"grad mismatch for {name} (padded dense path)",
        )


def test_dense_kbands_matches_xla(monkeypatch):
    """Static K-band dense path (np_ > MLAFF_KBAND, see _kband_split):
    fwd + all grads vs the XLA oracle, with the Pallas bwd kernel forced
    under the interpreter. A shrunk cap exercises the banding logic at
    CI-sized shapes; the real trigger is the curriculum ratio-1.0 UD
    stage np_=4168 that faulted the TPU worker unbanded (queues
    r3g/r3h). n=617 is prime, so query-row padding composes with the
    K-bands exactly as at the chip shape (n=4161)."""
    monkeypatch.setenv("MLAFF_KBAND", "256")
    monkeypatch.setenv("MLAFF_PALLAS_BWD_INTERPRET", "1")
    n = 617
    q, k, v, ncc, pos, w5, bh, bk, bv = make_inputs(n, seed=9)
    q_tm, kv_tm = to_token_major(q), fuse_kv(k, v)

    def loss_fused(q_tm, kv_tm, w5, bh, bk, bv):
        o = fused_cluster_attention(
            q_tm, kv_tm, ncc, pos, w5, bh, bk, bv, H, CS, R, 0
        )
        return (o**2).sum()

    def loss_ref(q_tm, kv_tm, w5, bh, bk, bv):
        qh = q_tm.reshape(B, n, H, C_).transpose(0, 2, 1, 3)
        kvh = kv_tm.reshape(B, n, H, 2, C_)
        kh = kvh[..., 0, :].transpose(0, 2, 1, 3)
        vh = kvh[..., 1, :].transpose(0, 2, 1, 3)
        o = xla_reference(qh, kh, vh, ncc, pos, w5, bh, bk, bv, n)
        return (o**2).sum()

    with jax.default_matmul_precision("highest"):
        o_f = fused_cluster_attention(
            q_tm, kv_tm, ncc, pos, w5, bh, bk, bv, H, CS, R, 0
        )
        o_ref = xla_reference(q, k, v, ncc, pos, w5, bh, bk, bv, n)
        np.testing.assert_allclose(
            np.asarray(o_f), np.asarray(o_ref), atol=2e-5, rtol=1e-4
        )
        g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
            q_tm, kv_tm, w5, bh, bk, bv
        )
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
            q_tm, kv_tm, w5, bh, bk, bv
        )
    for a, b_, name in zip(
        g1, g2, ["q", "kv", "w5", "bh", "blank_k", "blank_v"]
    ):
        scale = max(float(jnp.abs(b_).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b_) / scale, atol=5e-5,
            err_msg=f"grad mismatch for {name} (K-banded dense path)",
        )


@pytest.mark.parametrize("n", [128, 196, 617])
def test_stacked_backward_matches_xla(monkeypatch, n):
    """Row-stacked BACKWARD kernel (_bwd_kernel_stacked, small-token
    stages) vs the XLA oracle: all six input/param grads. n=196 covers
    the padded-rows case (np_=200); n=617 (np_=624) covers the stage-2
    width class that the MLAFF_STACK_BWD_NMAX=800 default now routes
    here. Forced under the interpreter — without
    MLAFF_PALLAS_BWD_INTERPRET the oracle bwd would run and the kernel
    would have zero CPU coverage."""
    monkeypatch.setenv("MLAFF_PALLAS_BWD_INTERPRET", "1")
    monkeypatch.setenv("MLAFF_STACK_BWD", "1")
    q, k, v, ncc, pos, w5, bh, bk, bv = make_inputs(n, seed=21)
    q_tm, kv_tm = to_token_major(q), fuse_kv(k, v)

    def loss_fused(q_tm, kv_tm, w5, bh, bk, bv):
        o = fused_cluster_attention(
            q_tm, kv_tm, ncc, pos, w5, bh, bk, bv, H, CS, R, 0
        )
        return (o**2).sum()

    def loss_ref(q_tm, kv_tm, w5, bh, bk, bv):
        qh = q_tm.reshape(B, n, H, C_).transpose(0, 2, 1, 3)
        kvh = kv_tm.reshape(B, n, H, 2, C_)
        kh = kvh[..., 0, :].transpose(0, 2, 1, 3)
        vh = kvh[..., 1, :].transpose(0, 2, 1, 3)
        o = xla_reference(qh, kh, vh, ncc, pos, w5, bh, bk, bv, n)
        return (o**2).sum()

    with jax.default_matmul_precision("highest"):
        g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
            q_tm, kv_tm, w5, bh, bk, bv
        )
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
            q_tm, kv_tm, w5, bh, bk, bv
        )
    for a, b_, name in zip(
        g1, g2, ["q", "kv", "w5", "bh", "blank_k", "blank_v"]
    ):
        scale = max(float(jnp.abs(b_).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b_) / scale, atol=5e-5,
            err_msg=f"grad mismatch for {name} (stacked bwd)",
        )


def test_fused_attention_dropout(monkeypatch):
    """In-kernel attention-prob dropout (hash-mask, _drop_keep):
    rate=0 is byte-identical to the no-drop primitive; fixed seed is
    deterministic; seeds decorrelate; near-zero rate reduces to the
    identity; and custom_vjp gradients match directional finite
    differences — which only holds if the BACKWARD kernel regenerates
    the identical mask under its own (different) query tiling."""
    monkeypatch.setenv("MLAFF_PALLAS_BWD_INTERPRET", "1")
    n = 128
    q, k, v, ncc, pos, w5, bh, bk, bv = make_inputs(n, seed=13)
    q_tm, kv_tm = to_token_major(q), fuse_kv(k, v)

    def run(qa, kva, rate, s):
        return fused_cluster_attention(
            qa, kva, ncc, pos, w5, bh, bk, bv, H, CS, R, 0,
            drop_rate=rate, drop_seed=s,
        )

    with jax.default_matmul_precision("highest"):
        base = run(q_tm, kv_tm, 0.0, None)
        s1 = jnp.asarray([1234], jnp.int32)
        s2 = jnp.asarray([77], jnp.int32)
        d1 = run(q_tm, kv_tm, 0.3, s1)
        d1b = run(q_tm, kv_tm, 0.3, s1)
        d2 = run(q_tm, kv_tm, 0.3, s2)
        tiny = run(q_tm, kv_tm, 1e-7, s1)

    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d1b))
    assert np.abs(np.asarray(d1) - np.asarray(d2)).max() > 1e-3, (
        "different seeds must produce different masks"
    )
    assert np.abs(np.asarray(d1) - np.asarray(base)).max() > 1e-3, (
        "rate=0.3 must actually drop something"
    )
    np.testing.assert_allclose(
        np.asarray(tiny), np.asarray(base), atol=1e-5, rtol=1e-5,
        err_msg="rate->0 must reduce to the identity",
    )

    # directional finite-difference gradient check at fixed seed
    wN = jax.random.normal(jax.random.PRNGKey(5), base.shape)

    def loss(q_tm, kv_tm):
        return (run(q_tm, kv_tm, 0.3, s1) * wN).sum()

    dq_dir = jax.random.normal(jax.random.PRNGKey(6), q_tm.shape)
    dkv_dir = jax.random.normal(jax.random.PRNGKey(7), kv_tm.shape)
    with jax.default_matmul_precision("highest"):
        gq, gkv = jax.grad(loss, argnums=(0, 1))(q_tm, kv_tm)
        analytic = float((gq * dq_dir).sum() + (gkv * dkv_dir).sum())
        eps = 1e-3
        lp = loss(q_tm + eps * dq_dir, kv_tm + eps * dkv_dir)
        lm = loss(q_tm - eps * dq_dir, kv_tm - eps * dkv_dir)
        numeric = float(lp - lm) / (2 * eps)
    np.testing.assert_allclose(
        analytic, numeric, rtol=2e-2,
        err_msg="dropout custom_vjp disagrees with finite differences "
                "(fwd/bwd hash masks out of sync?)",
    )


@pytest.mark.parametrize("n", [128, 196])
def test_stacked_split_matches_plain(monkeypatch, n):
    """Phase-split stacked path (MLAFF_SSPLIT=1: all QK matmuls issued
    before the VPU softmax chains, AV matmuls last) is a pure reordering
    of the same ops — must match the interleaved stacked path exactly."""
    q, k, v, ncc, pos, w5, bh, bk, bv = make_inputs(n, seed=5)
    args = (to_token_major(q), fuse_kv(k, v), ncc, pos, w5, bh, bk, bv,
            H, CS, R, 0)
    monkeypatch.setenv("MLAFF_STACK", "1")
    with jax.default_matmul_precision("highest"):
        monkeypatch.setenv("MLAFF_SSPLIT", "1")
        o_split = fused_cluster_attention(*args)
        monkeypatch.delenv("MLAFF_SSPLIT")
        o_plain = fused_cluster_attention(*args)
    np.testing.assert_array_equal(np.asarray(o_split), np.asarray(o_plain))


def test_traced_window_forward_matches_xla(monkeypatch):
    """Traced-window dense path (MLAFF_TWIN=1, data-dependent stages):
    per-(image, tile) K/V bands from the traced ncc, with the in-graph
    span check choosing windowed vs dense dispatch."""
    monkeypatch.setenv("MLAFF_TWIN", "1")
    n = 512
    q, k, v, ncc, pos, w5, bh, bk, bv = make_inputs(n, seed=4)
    # spatially-local neighborhoods so the span check passes: token i's
    # clusters come from a narrow band around its own cluster
    k_ = n // CS
    own = jnp.arange(n) // CS
    ncc = (own[None, :, None]
           + jnp.asarray([[0, 1, 2]])[None]) % k_
    ncc = jnp.broadcast_to(ncc, (B, n, NNC)).astype(jnp.int32)
    with jax.default_matmul_precision("highest"):
        o_ref = xla_reference(q, k, v, ncc, pos, w5, bh, bk, bv, n)
        o_f = fused_cluster_attention(
            to_token_major(q), fuse_kv(k, v), ncc, pos, w5, bh, bk, bv,
            H, CS, R, 0,
        )
    np.testing.assert_allclose(
        np.asarray(o_f), np.asarray(o_ref), atol=2e-5, rtol=1e-4
    )
    # the random-ncc case overflows any band and must fall back (still
    # correct through the dense branch of the cond)
    q2, k2, v2, ncc2, pos2, *_ = make_inputs(n, seed=5)
    with jax.default_matmul_precision("highest"):
        o_ref2 = xla_reference(q2, k2, v2, ncc2, pos2, w5, bh, bk, bv, n)
        o_f2 = fused_cluster_attention(
            to_token_major(q2), fuse_kv(k2, v2), ncc2, pos2, w5, bh, bk, bv,
            H, CS, R, 0,
        )
    np.testing.assert_allclose(
        np.asarray(o_f2), np.asarray(o_ref2), atol=2e-5, rtol=1e-4
    )


def test_compact_union_forward_matches_xla(monkeypatch):
    """Compact-union K/V layout (MLAFF_COMPACT=1, on-grid contract:
    batch-invariant ncc/pos passed as host constants) vs the XLA oracle."""
    n = 512
    q, k, v, ncc, pos, w5, bh, bk, bv = make_inputs(n, seed=2)
    # on-grid contract: geometry identical across the batch
    ncc = jnp.broadcast_to(ncc[:1], ncc.shape)
    pos = jnp.broadcast_to(pos[:1], pos.shape)
    monkeypatch.setenv("MLAFF_COMPACT", "1")
    from ml_autofocusformermod_tpu.ops import clusten_pallas as cp

    tq, window = cp._choose_tiling(
        n, n, CS, cp._StaticNcc(np.asarray(ncc[0]), np.asarray(pos[0]))
    )
    assert window is not None and window[0] == "compact", (
        "compact candidate not selected — test setup no longer exercises it"
    )
    with jax.default_matmul_precision("highest"):
        o_ref = xla_reference(q, k, v, ncc, pos, w5, bh, bk, bv, n)
        o_f = fused_cluster_attention(
            to_token_major(q), fuse_kv(k, v), ncc, pos, w5, bh, bk, bv,
            H, CS, R, 0,
            static_ncc=np.asarray(ncc[0]), static_pos=np.asarray(pos[0]),
        )
    np.testing.assert_allclose(
        np.asarray(o_f), np.asarray(o_ref), atol=2e-5, rtol=1e-4
    )


def test_fused_model_path_matches_unfused():
    """Whole AFF forward: use_pallas (interpreted) vs XLA path."""
    from ml_autofocusformermod_tpu.models.aff import AutoFocusFormer

    common = dict(
        num_classes=10, embed_dim=(16, 32, 48, 64), cluster_size=4,
        nbhd_size=(8, 8, 4, 49), depths=(1, 1, 1, 1), num_heads=(2, 2, 4, 4),
        img_size=56, dtype=jnp.float32,
    )
    m1 = AutoFocusFormer(use_pallas=False, **common)
    m2 = AutoFocusFormer(use_pallas=True, **common)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 56, 56, 3))
    v = m1.init(jax.random.PRNGKey(0), x[:1], training=False)
    with jax.default_matmul_precision("highest"):
        o1 = m1.apply(v, x, training=False)
        o2 = m2.apply(v, x, training=False)
    np.testing.assert_allclose(
        np.asarray(o1), np.asarray(o2), atol=1e-5, rtol=1e-4
    )


def test_pallas_backward_kernel_interpret_parity(monkeypatch):
    """Run the PALLAS backward kernel itself under the interpreter (not
    the XLA-oracle fallback the other grad tests take) and pin every
    input gradient against the oracle. Added after the round-2 on-chip
    probe caught d_blank_v ≡ 0: the bwd kernel computed the blank-value
    gradient but never accumulated it into the output ref, and no CPU
    test executed that kernel."""
    monkeypatch.setenv("MLAFF_PALLAS_BWD_INTERPRET", "1")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "parity_probe",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "parity_probe.py"),
    )
    pp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pp)

    h_, w_, cs, nnc, heads, c_, b, R = 16, 16, 8, 3, 2, 16, 2, 55
    n = h_ * w_
    from ml_autofocusformermod_tpu.ops import clusten_pallas as cp
    from ml_autofocusformermod_tpu.ops.sfc import (
        grid_cluster, grid_nearest_clusters,
    )

    g_pos, *_ = grid_cluster(h_, w_, cs)
    ncc_np = grid_nearest_clusters(h_, w_, cs, nnc)
    pos = jnp.broadcast_to(jnp.asarray(g_pos, jnp.float32)[None], (b, n, 2))
    ncc = jnp.broadcast_to(
        jnp.asarray(ncc_np, jnp.int32)[None], (b,) + ncc_np.shape
    )
    ks = jax.random.split(jax.random.PRNGKey(3), 7)
    q = jax.random.normal(ks[0], (b, heads, n, c_), jnp.float32)
    k = jax.random.normal(ks[1], (b, heads, n, c_), jnp.float32)
    v = jax.random.normal(ks[2], (b, heads, n, c_), jnp.float32)
    pe_kernel = jax.random.normal(ks[3], (5, heads), jnp.float32) * 0.1
    pe_bias = jax.random.normal(ks[4], (heads,), jnp.float32) * 0.1
    blank_k = jax.random.normal(ks[5], (c_, heads), jnp.float32) * 0.5
    blank_v = jax.random.normal(ks[6], (heads, c_), jnp.float32) * 0.5
    q_tm = pp.to_token_major(q)
    kv_tm = pp.fuse_kv(k, v)

    def loss(fn):
        def inner(q_tm, kv_tm, pek, peb, bk, bv):
            o = fn(q_tm, kv_tm, pek, peb, bk, bv)
            return (o.astype(jnp.float32)
                    * jnp.sin(jnp.arange(o.size).reshape(o.shape))).sum()
        return inner

    def fused(q_tm, kv_tm, pek, peb, bk, bv):
        return cp.fused_cluster_attention(
            q_tm, kv_tm, ncc, pos, pek, peb, bk, bv,
            num_heads=heads, cs=cs, rel_width=R, static_ncc=ncc_np,
            static_pos=g_pos,
        )

    def oracle(q_tm, kv_tm, pek, peb, bk, bv):
        return pp.reference(q_tm, kv_tm, ncc, pos, pek, peb, bk, bv,
                            heads, cs, R)

    args = (q_tm, kv_tm, pe_kernel, pe_bias, blank_k, blank_v)
    gf = jax.grad(loss(fused), argnums=tuple(range(6)))(*args)
    gr = jax.grad(loss(oracle), argnums=tuple(range(6)))(*args)
    names = ["q", "kv", "pe_kernel", "pe_bias", "blank_k", "blank_v"]
    for name, a, r in zip(names, gf, gr):
        ra = np.asarray(r, np.float32)
        scale = max(np.abs(ra).max(), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a, np.float32) / scale, ra / scale,
            atol=2e-4, rtol=0,
            err_msg=f"Pallas bwd kernel grad {name} diverges from oracle",
        )
        assert np.abs(np.asarray(a, np.float32)).max() > 0, (
            f"grad {name} is identically zero"
        )


def test_xla_nmax_stage_routing_matches(monkeypatch):
    """MLAFF_XLA_NMAX routes small-n stages to the XLA attention path;
    outputs must match the all-Pallas forward (both sub-paths are pinned
    vs the torch oracle individually; this pins the router itself)."""
    from ml_autofocusformermod_tpu.models.aff import AutoFocusFormer

    common = dict(
        num_classes=10, embed_dim=(16, 32, 48, 64), cluster_size=4,
        nbhd_size=(8, 8, 4, 49), depths=(1, 1, 1, 1), num_heads=(2, 2, 4, 4),
        img_size=56, dtype=jnp.float32,
    )
    m = AutoFocusFormer(use_pallas=True, **common)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 56, 56, 3))
    v = m.init(jax.random.PRNGKey(0), x[:1], training=False)
    with jax.default_matmul_precision("highest"):
        monkeypatch.setenv("MLAFF_XLA_NMAX", "0")
        o_pallas = m.apply(v, x, training=False)
        # 56x56/16 = 196 tokens at stage 2 -> stages 2..4 take the XLA path,
        # stage 1 (784 tokens) stays on the kernel
        monkeypatch.setenv("MLAFF_XLA_NMAX", "200")
        o_routed = m.apply(v, x, training=False)
    np.testing.assert_allclose(
        np.asarray(o_routed), np.asarray(o_pallas), atol=1e-5, rtol=1e-4
    )


def test_dense_nmax_masked_dense_matches(monkeypatch):
    """MLAFF_DENSE_NMAX routes small-n local stages to masked-dense
    attention (one batched matmul over all n tokens, non-neighbors masked
    with -100). exp(-100) vanishes under the f32 softmax, so outputs must
    match the gathered-neighborhood formulation."""
    from ml_autofocusformermod_tpu.models.aff import AutoFocusFormer

    common = dict(
        num_classes=10, embed_dim=(16, 32, 48, 64), cluster_size=4,
        nbhd_size=(8, 8, 4, 49), depths=(1, 1, 1, 1), num_heads=(2, 2, 4, 4),
        img_size=56, dtype=jnp.float32,
    )
    m = AutoFocusFormer(use_pallas=False, **common)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 56, 56, 3))
    v = m.init(jax.random.PRNGKey(0), x[:1], training=False)
    with jax.default_matmul_precision("highest"):
        monkeypatch.setenv("MLAFF_DENSE_NMAX", "0")
        o_gather = m.apply(v, x, training=False)
        monkeypatch.setenv("MLAFF_DENSE_NMAX", "200")
        o_dense = m.apply(v, x, training=False)
    np.testing.assert_allclose(
        np.asarray(o_dense), np.asarray(o_gather), atol=1e-5, rtol=1e-4
    )


def test_wstack_windowed_interpret_parity(monkeypatch):
    """Row-stacked windowed forward (MLAFF_WSTACK=2, scratch-staged tall
    logit planes) vs the plain batch-invariant path, through the Pallas
    interpreter. The windowed path is normally chip-only (``_choose_tiling``
    skips ``_static_window`` under interpret), so the tiling choice is
    pinned here by hand; the on-chip probe (scripts/parity_probe.py,
    queue_r2u.log R2U-1) additionally pins the Mosaic-compiled numerics
    (windowed-vs-plain exactly 0.0 at fp32 and bf16)."""
    from ml_autofocusformermod_tpu.ops import clusten_pallas as cp
    from ml_autofocusformermod_tpu.ops.sfc import (
        grid_cluster, grid_nearest_clusters,
    )

    h_, w_, cs, nnc, heads, c_, b = 16, 16, 8, 3, 2, 16, 4
    n = h_ * w_
    tq = 64
    g_pos, *_ = grid_cluster(h_, w_, cs)
    ncc_np = grid_nearest_clusters(h_, w_, cs, nnc)
    pos = jnp.broadcast_to(jnp.asarray(g_pos, jnp.float32)[None], (b, n, 2))
    ncc = jnp.broadcast_to(
        jnp.asarray(ncc_np, jnp.int32)[None], (b,) + ncc_np.shape
    )
    ks = jax.random.split(jax.random.PRNGKey(11), 7)
    q_tm = jax.random.normal(ks[0], (b, n, heads * c_), jnp.float32)
    kv_tm = jax.random.normal(ks[1], (b, n, heads * 2 * c_), jnp.float32)
    pe_kernel = jax.random.normal(ks[2], (5, heads), jnp.float32) * 0.1
    pe_bias = jax.random.normal(ks[3], (heads,), jnp.float32) * 0.1
    blank_k = jax.random.normal(ks[4], (c_, heads), jnp.float32) * 0.5
    blank_v = jax.random.normal(ks[5], (heads, c_), jnp.float32) * 0.5

    def run():
        return fused_cluster_attention(
            q_tm, kv_tm, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
            num_heads=heads, cs=cs, rel_width=55, static_ncc=ncc_np,
            static_pos=g_pos,
        )

    plain = run()  # dense batch-invariant path (interpret default)

    monkeypatch.setenv("MLAFF_WFRAC", "1.0")  # always accept the window
    np_ = -(-n // cs) * cs
    win = cp._static_window(ncc_np, n, tq, cs, np_)
    assert win is not None and win[0] == 1

    orig = cp._choose_tiling

    def forced(n_, np__, cs_, sn):
        if sn is not None and n_ == n:
            return tq, win
        return orig(n_, np__, cs_, sn)

    monkeypatch.setattr(cp, "_choose_tiling", forced)
    monkeypatch.setenv("MLAFF_STACK", "0")  # keep the windowed dispatch
    windowed = run()  # windowed, wsg=1
    monkeypatch.setenv("MLAFF_WSTACK", "2")
    stacked = run()  # windowed, wsg=2 (scratch path)

    np.testing.assert_allclose(
        np.asarray(windowed), np.asarray(plain), atol=2e-5, rtol=1e-5,
        err_msg="windowed path diverges from the dense batch-invariant path",
    )
    np.testing.assert_allclose(
        np.asarray(stacked), np.asarray(windowed), atol=2e-5, rtol=1e-5,
        err_msg="WSTACK scratch path diverges from the windowed path",
    )

    # the DEFAULT (no env): shape-aware wsg (8 for c<=64, snapped to a
    # divisor of gb / the VMEM budget) — pins the round-3 default flip
    monkeypatch.delenv("MLAFF_WSTACK")
    default = run()
    np.testing.assert_allclose(
        np.asarray(default), np.asarray(windowed), atol=2e-5, rtol=1e-5,
        err_msg="default-wsg path diverges from the windowed path",
    )
