"""CLUSTEN op parity harness.

Mirrors the reference kernel-test design (``clusten/test_{qk,av,wf}_kernel.py``):
random tensors, forward + all gradients, compared against an independent
dense gather/einsum formulation written here in numpy/torch-free form.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_autofocusformermod_tpu.ops import clusten

# reference test sizes (scaled-down batch): test_qk_kernel.py:15-19
B, H, N, M, C = 8, 4, 196, 48, 32
N_, IC = 64, 4


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def dense_qk(q, k, idx):
    b, h, n, c = q.shape
    m = idx.shape[-1]
    kg = np.stack(
        [k[bi, :, idx[bi].reshape(-1)].transpose(1, 0, 2) for bi in range(b)]
    ).reshape(b, h, n, m, c)
    return (q[:, :, :, None] * kg).sum(-1)


def test_qk_forward_and_grads(rng):
    q = rng.standard_normal((B, H, N, C)).astype(np.float32)
    k = rng.standard_normal((B, H, N, C)).astype(np.float32)
    idx = rng.integers(0, N, (B, N, M))

    attn = clusten.clusten_qk(jnp.asarray(q), jnp.asarray(k), jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(attn), dense_qk(q, k, idx), atol=2e-4)

    # gradient check against independent formulation
    def f_ours(q_, k_):
        return clusten.clusten_qk(q_, k_, jnp.asarray(idx)).mean()

    def f_dense(q_, k_):
        kg = clusten.gather_neighbors(k_, jnp.asarray(idx))
        return (q_[:, :, :, None] * kg).sum(-1).mean()

    gq, gk = jax.grad(f_ours, argnums=(0, 1))(jnp.asarray(q), jnp.asarray(k))
    gq2, gk2 = jax.grad(f_dense, argnums=(0, 1))(jnp.asarray(q), jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gq2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk2), atol=1e-6)


def test_av_forward_and_grads(rng):
    attn = rng.standard_normal((B, H, N, M)).astype(np.float32)
    v = rng.standard_normal((B, H, N, C)).astype(np.float32)
    idx = rng.integers(0, N, (B, N, M))

    feat = clusten.clusten_av(jnp.asarray(attn), jnp.asarray(v), jnp.asarray(idx))
    vg = np.stack(
        [v[bi, :, idx[bi].reshape(-1)].transpose(1, 0, 2) for bi in range(B)]
    ).reshape(B, H, N, M, C)
    expect = (attn[..., None] * vg).sum(3)
    np.testing.assert_allclose(np.asarray(feat), expect, atol=2e-4)

    def f(a_, v_):
        return clusten.clusten_av(a_, v_, jnp.asarray(idx)).mean()

    ga, gv = jax.grad(f, argnums=(0, 1))(jnp.asarray(attn), jnp.asarray(v))
    # d_attn[b,h,i,j] = sum_c g * v[idx]; with mean loss g = 1/(B*H*N*C)
    scale = 1.0 / (B * H * N * C)
    np.testing.assert_allclose(np.asarray(ga), vg.sum(-1) * scale, atol=1e-6)
    # d_v is a scatter-add of attn over idx
    gv_expect = np.zeros_like(v)
    for bi in range(B):
        for i in range(N):
            for j in range(M):
                gv_expect[bi, :, idx[bi, i, j]] += attn[bi, :, i, j, None] * scale
    np.testing.assert_allclose(np.asarray(gv), gv_expect, atol=1e-6)


def test_wf_forward_and_grads(rng):
    w = rng.standard_normal((B, N_, M, IC)).astype(np.float32)
    f = rng.standard_normal((B, N, C)).astype(np.float32)
    idx = rng.integers(0, N, (B, N_, M))

    out = clusten.clusten_wf(jnp.asarray(w), jnp.asarray(f), jnp.asarray(idx))
    assert out.shape == (B, N_, IC, C)
    fg = np.stack([f[bi, idx[bi].reshape(-1)] for bi in range(B)]).reshape(
        B, N_, M, C
    )
    expect = np.einsum("bnmi,bnmc->bnic", w, fg)
    np.testing.assert_allclose(np.asarray(out), expect, atol=2e-4)

    def loss(w_, f_):
        return clusten.clusten_wf(w_, f_, jnp.asarray(idx)).mean()

    gw, gf = jax.grad(loss, argnums=(0, 1))(jnp.asarray(w), jnp.asarray(f))
    scale = 1.0 / (B * N_ * IC * C)
    gw_expect = np.broadcast_to(fg.sum(-1, keepdims=True) * scale, gw.shape)
    np.testing.assert_allclose(np.asarray(gw), gw_expect, atol=1e-6)
    gf_expect = np.zeros_like(f)
    for bi in range(B):
        for i in range(N_):
            for j in range(M):
                gf_expect[bi, idx[bi, i, j]] += w[bi, i, j].sum() * scale
    np.testing.assert_allclose(np.asarray(gf), gf_expect, atol=1e-6)


def test_dtype_unification():
    """Mixed dtypes are unified to the first arg's dtype (clusten/clusten.py:25-27)."""
    q = jnp.ones((1, 1, 4, 8), jnp.bfloat16)
    k = jnp.ones((1, 1, 4, 8), jnp.float32)
    idx = jnp.zeros((1, 4, 2), jnp.int32)
    assert clusten.clusten_qk(q, k, idx).dtype == jnp.bfloat16


@pytest.mark.parametrize("mode", ["ic", "einsum"])
def test_wf_contract_modes_match_default(rng, monkeypatch, mode):
    """All MLAFF_WF_MODE lowerings compute the same contraction (fwd+grads);
    the mode is read per call, so each lowering is exercised directly."""
    w = rng.standard_normal((B, N_, M, IC)).astype(np.float32)
    fg = rng.standard_normal((B, N_, M, C)).astype(np.float32)

    def run():
        out = clusten.wf_contract(jnp.asarray(w), jnp.asarray(fg))
        gw, gf = jax.grad(
            lambda a, b: (clusten.wf_contract(a, b) ** 2).mean(),
            argnums=(0, 1),
        )(jnp.asarray(w), jnp.asarray(fg))
        return np.asarray(out), np.asarray(gw), np.asarray(gf)

    monkeypatch.delenv("MLAFF_WF_MODE", raising=False)
    base = run()
    monkeypatch.setenv("MLAFF_WF_MODE", mode)
    got = run()
    for a, b in zip(base, got):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
