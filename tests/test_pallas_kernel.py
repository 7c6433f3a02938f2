"""Fused Pallas attention vs the XLA one-hot formulation.

Runs the kernel through the Pallas interpreter on CPU (the TPU-compiled
path is additionally cross-checked on hardware by scripts/validate_tpu.py
and the benchmark); exactness argument: the kernel's dense-masked softmax
must match gather-attention wherever neighborhoods are duplicate-free,
which kNN guarantees.
"""

import os

os.environ["MLAFF_PALLAS_INTERPRET"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_autofocusformermod_tpu.models.layers import rel_pos_features
from ml_autofocusformermod_tpu.ops.cluster_gather import gather_clusters_onehot
from ml_autofocusformermod_tpu.ops.clusten_pallas import fused_cluster_attention

B, H, CS, NNC, C_ = 2, 2, 8, 3, 16
R = 27


def make_inputs(n, seed=0):
    k_ = -(-n // CS)
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    q = jax.random.normal(ks[0], (B, H, n, C_), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, n, C_), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, n, C_), jnp.float32)
    ncc = jnp.argsort(jax.random.uniform(ks[3], (B, n, k_)), axis=-1)[
        :, :, :NNC
    ].astype(jnp.int32)
    pos = jax.random.randint(ks[4], (B, n, 2), 0, 28).astype(jnp.float32)
    w5 = jax.random.normal(ks[5], (5, H)) * 0.1
    bh = jax.random.normal(ks[6], (H,)) * 0.1
    blank = jax.random.normal(ks[7], (B, H, n, 1))
    return q, k, v, ncc, pos, w5, bh, blank


def xla_reference(q, k, v, ncc, pos, w5, bh, blank, n):
    kk = -(-n // CS)
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
    full = jnp.concatenate([attn, blank], -1)
    p = jax.nn.softmax(full, -1)
    pb = p[..., -1:]
    p = jnp.where(pad_ok, p[..., :-1], 0.0)
    out = jnp.einsum("bhim,bhimc->bhic", p, vg)
    return out, pb


@pytest.mark.parametrize("n", [128, 196])  # 196: padded last cluster
def test_fused_forward_matches_xla(n):
    args = make_inputs(n)
    with jax.default_matmul_precision("highest"):
        o_ref, pb_ref = xla_reference(*args, n)
        o_f, pb_f = fused_cluster_attention(*args, CS, R, 0)
    np.testing.assert_allclose(
        np.asarray(o_f), np.asarray(o_ref), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(pb_f), np.asarray(pb_ref), atol=1e-6
    )


def test_fused_gradients_match_xla():
    n = 128
    q, k, v, ncc, pos, w5, bh, blank = make_inputs(n, seed=1)

    def loss_fused(q, k, v, w5, bh, blank):
        o, pb = fused_cluster_attention(
            q, k, v, ncc, pos, w5, bh, blank, CS, R, 0
        )
        return (o**2).sum() + (pb**2).sum()

    def loss_ref(q, k, v, w5, bh, blank):
        o, pb = xla_reference(q, k, v, ncc, pos, w5, bh, blank, n)
        return (o**2).sum() + (pb**2).sum()

    with jax.default_matmul_precision("highest"):
        g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
            q, k, v, w5, bh, blank
        )
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
            q, k, v, w5, bh, blank
        )
    for a, b, name in zip(g1, g2, ["q", "k", "v", "w5", "bh", "blank"]):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-5,
            err_msg=f"grad mismatch for {name}",
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
