"""Parity of the fused Pallas cluster-merge kernel (ops/merge_pallas.py)
against the XLA reference chain (gather_clusters_onehot + wf_contract) —
forward and gradients, interpreter mode on CPU. Reference semantics:
``clusten/src/clustenwf_cuda_kernel.cu:18-53`` via ``test_wf_kernel.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_autofocusformermod_tpu.ops.cluster_gather import (
    gather_clusters_onehot,
)
from ml_autofocusformermod_tpu.ops.clusten import wf_contract
from ml_autofocusformermod_tpu.ops.merge_pallas import fused_cluster_merge


def _ref(weights, feat, ncc, cs):
    feat_g = gather_clusters_onehot(
        feat[:, None].astype(weights.dtype), ncc, cs
    )[:, 0]
    return wf_contract(weights, feat_g)


def _case(b, n, n_, c, cs, nnc, ic=4, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    k = -(-n // cs)
    weights = jnp.asarray(
        rng.standard_normal((b, n_, nnc * cs, ic)), dtype
    )
    feat = jnp.asarray(rng.standard_normal((b, n, c)), dtype)
    ncc = jnp.asarray(
        rng.integers(0, k, size=(b, n_, nnc)), jnp.int32
    )
    return weights, feat, ncc


# stage-1-like (aligned), odd n' (stage-2 merge 196 -> pads to 200),
# padded last cluster (cs does not divide n)
CASES = [
    (2, 64, 16, 32, 8, 3),
    (1, 48, 12, 16, 4, 2),
    (2, 52, 12, 8, 8, 3),  # 52 % 8 != 0: padded cluster reads zeros
]


@pytest.mark.parametrize("b,n,n_,c,cs,nnc", CASES)
def test_merge_forward_parity(b, n, n_, c, cs, nnc):
    weights, feat, ncc = _case(b, n, n_, c, cs, nnc)
    out = fused_cluster_merge(weights, feat, ncc, cs)
    ref = _ref(weights, feat, ncc, cs)
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_merge_forward_parity_bf16():
    weights, feat, ncc = _case(2, 64, 16, 32, 8, 3, dtype=jnp.bfloat16)
    out = fused_cluster_merge(weights, feat, ncc, 8)
    ref = _ref(weights, feat, ncc, 8)
    # the kernel multiplies w*feat in f32 before the f32 accumulation;
    # the XLA vpu path rounds the elementwise product to bf16 first — the
    # kernel is the *more* precise of the two, within bf16 product ulp
    # absolute tolerance = bf16 ulp at the output range (~24 -> 0.125);
    # relative comparison is meaningless at cancellation points
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.0, atol=0.125,
    )


def test_merge_grad_parity():
    weights, feat, ncc = _case(2, 64, 16, 32, 8, 3)

    def loss_fused(w, f):
        o = fused_cluster_merge(w, f, ncc, 8)
        return (o * jnp.cos(jnp.arange(o.size).reshape(o.shape))).sum()

    def loss_ref(w, f):
        o = _ref(w, f, ncc, 8)
        return (o * jnp.cos(jnp.arange(o.size).reshape(o.shape))).sum()

    gw, gf = jax.grad(loss_fused, argnums=(0, 1))(weights, feat)
    rw, rf = jax.grad(loss_ref, argnums=(0, 1))(weights, feat)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(rf), atol=1e-5,
                               rtol=1e-5)


def test_model_end_to_end_with_pallas_merge(monkeypatch):
    """AFF forward agrees between MLAFF_MERGE=pallas and =xla."""
    from ml_autofocusformermod_tpu.models.aff import AutoFocusFormer

    model = AutoFocusFormer(
        num_classes=10, embed_dim=(16, 32, 48, 64), depths=(1, 1, 1, 1),
        num_heads=(2, 2, 4, 4), img_size=56, drop_path_rate=0.0,
        dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    variables = model.init(jax.random.PRNGKey(0), x, training=False)

    monkeypatch.setenv("MLAFF_MERGE", "xla")
    ref = model.apply(variables, x, training=False)
    monkeypatch.setenv("MLAFF_MERGE", "pallas")
    out = model.apply(variables, x, training=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4
    )


def test_merge_sbatch_matches_default(monkeypatch):
    """s-batched (v4) kernel bodies vs the v3 cs-loop, fwd + grads.

    MLAFF_MERGE_SBATCH=1 replaces the per-slot 24/32-lane matmuls with a
    few full-width lane-assembled ones (see _sbatch_* in merge_pallas).
    The fwd is bit-identical by construction (same f32 products, same
    accumulation order); the bwd rounds products to bf16 exactly where
    v3 does, so fp32 grads match tightly."""
    weights, feat, ncc = _case(2, 64, 16, 32, 8, 3)

    def run(w, f):
        return fused_cluster_merge(w, f, ncc, 8)

    def loss(w, f):
        o = run(w, f)
        return (o * jnp.cos(jnp.arange(o.size).reshape(o.shape))).sum()

    base = run(weights, feat)
    gw0, gf0 = jax.grad(loss, argnums=(0, 1))(weights, feat)
    monkeypatch.setenv("MLAFF_MERGE_SBATCH", "1")
    out = run(weights, feat)
    gw1, gf1 = jax.grad(loss, argnums=(0, 1))(weights, feat)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gf1), np.asarray(gf0),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("acc", ["reg", "ref"])
@pytest.mark.parametrize("gtile", ["auto", "mm", "cat"])
def test_merge_v5_knob_lattice(monkeypatch, acc, gtile):
    """v5 accumulate/replication lattice vs the XLA reference chain.

    MLAFF_MERGE_BWD_ACC=reg (default) carries d_feat and the cs
    d_weights slabs through the fori loop and writes each ref once;
    =ref restores the v3 read-modify-write layout. MLAFF_MERGE_GTILE
    routes the ic-fold lane replication (one-hot MXU matmul vs lane
    concat). Every combination must match the XLA chain's grads exactly
    at fp32 (the matmul replication is an exact copy by construction)."""
    monkeypatch.setenv("MLAFF_MERGE_BWD_ACC", acc)
    monkeypatch.setenv("MLAFF_MERGE_GTILE", gtile)
    weights, feat, ncc = _case(2, 52, 12, 8, 8, 3)  # padded last cluster

    def loss_fused(w, f):
        o = fused_cluster_merge(w, f, ncc, 8)
        return (o * jnp.cos(jnp.arange(o.size).reshape(o.shape))).sum()

    def loss_ref(w, f):
        o = _ref(w, f, ncc, 8)
        return (o * jnp.cos(jnp.arange(o.size).reshape(o.shape))).sum()

    gw, gf = jax.grad(loss_fused, argnums=(0, 1))(weights, feat)
    rw, rf = jax.grad(loss_ref, argnums=(0, 1))(weights, feat)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(rf), atol=1e-5,
                               rtol=1e-5)
