"""Systematic sweep of the attention-kernel dispatch lattice.

VERDICT r4 #3: round 4 shipped a NaN-capable route overlap (commit
9432a70 — the ``MLAFF_STACK_NMAX`` 256->800 flip let K-banded shapes
dispatch into stacked kernels that carry no band planes) because the
routing predicates were hand-duplicated between ``_attention_fwd_impl``
and ``_attention_bwd_impl``. The dispatch now lives in ONE function
(``clusten_pallas._route``); this module (a) pins its invariants over
the knob x shape lattice directly and (b) runs fwd + bwd parity vs the
XLA one-hot oracle on every reachable route class under the Pallas
interpreter, so a commit-9432a70-class divergence fails here by
construction instead of by luck.

Reference semantics being checked: CLUSTEN QK/AV with rel-pos bias,
blank token and padding mask (``aff_transformer.py:120-155``); CLUSTEN
itself has no shape carve-outs (``clustenqk_cuda_kernel.cu:18-49``), so
every route must agree with the single oracle.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_autofocusformermod_tpu.ops import clusten_pallas as cp
from ml_autofocusformermod_tpu.ops.clusten_pallas import (
    fused_cluster_attention,
)

from test_pallas_kernel import (
    B, H, CS, C_, fuse_kv, make_inputs, to_token_major, xla_reference,
)


# ---------------------------------------------------------------------------
# (a) _route invariants over the knob x shape lattice (no kernels run)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kband", [0, 256, 2048])
@pytest.mark.parametrize("stack_nmax", [256, 800, 10**6])
@pytest.mark.parametrize("n", [49, 128, 196, 617, 784, 3136, 4161])
def test_route_stacked_never_banded(monkeypatch, kband, stack_nmax, n):
    """The r4 NaN class: a stacked route must never carry K-bands, for ANY
    combination of the banding/stacking knobs — including a shrunken
    MLAFF_KBAND that puts banded shapes under the stack bound."""
    monkeypatch.setenv("MLAFF_KBAND", str(kband))
    monkeypatch.setenv("MLAFF_STACK_NMAX", str(stack_nmax))
    np_ = -(-n // CS) * CS
    for bwd in (False, True):
        r = cp._route(n, np_, CS, None, None, bwd=bwd)
        if r.stacked:
            assert r.nb == 0, (
                f"stacked route with K-bands (n={n}, kband={kband}, "
                f"nmax={stack_nmax}, bwd={bwd})"
            )
        if kband and np_ > kband:
            assert r.nb > 0 and not r.stacked


@pytest.mark.parametrize("n", [49, 128, 196, 617, 784, 3136])
def test_route_fwd_bwd_same_path_kind(monkeypatch, n):
    """Forward and backward must select the same path class for the same
    shape under default knobs (the bwd may differ only via its own
    MLAFF_STACK_BWD* opt-outs, which default to the fwd's values)."""
    np_ = -(-n // CS) * CS
    rf = cp._route(n, np_, CS, None, None, bwd=False)
    rb = cp._route(n, np_, CS, None, None, bwd=True)
    assert rf.stacked == rb.stacked
    assert rf.twin == rb.twin
    assert (rf.window is None) == (rb.window is None)
    assert rf.nb == rb.nb
    # banding geometry must agree exactly (same planes, same padding)
    assert (rf.wb, rf.np_) == (rb.wb, rb.np_)

    # bwd-only opt-out narrows, never widens, the stacked route
    monkeypatch.setenv("MLAFF_STACK_BWD", "0")
    rb0 = cp._route(n, np_, CS, None, None, bwd=True)
    assert not rb0.stacked


def test_route_dropout_excludes_fast_paths(monkeypatch):
    """Dropout routes must stay on the plain dense path (the stacked /
    banded / windowed kernels carry no dropout planes — TUNING.md)."""
    drop = (0.1, jnp.zeros((1,), jnp.int32))
    for n in (128, 617):
        np_ = -(-n // CS) * CS
        for bwd in (False, True):
            r = cp._route(n, np_, CS, None, drop, bwd=bwd)
            assert not r.stacked and not r.twin and not r.wsg_ok
    monkeypatch.setenv("MLAFF_TWIN", "1")
    r = cp._route(617, 624, CS, None, drop, bwd=True)
    assert not r.twin, "twin bwd must not engage under dropout"


# ---------------------------------------------------------------------------
# (b) fwd + bwd oracle parity on every reachable route class
# ---------------------------------------------------------------------------

def _loss_fused(q_tm, kv_tm, w5, bh, bk, bv, ncc, pos):
    o = fused_cluster_attention(
        q_tm, kv_tm, ncc, pos, w5, bh, bk, bv, H, CS, 27, 0
    )
    return (o**2).sum()


def _loss_ref(q_tm, kv_tm, w5, bh, bk, bv, ncc, pos, n):
    qh = q_tm.reshape(B, n, H, C_).transpose(0, 2, 1, 3)
    kvh = kv_tm.reshape(B, n, H, 2, C_)
    kh = kvh[..., 0, :].transpose(0, 2, 1, 3)
    vh = kvh[..., 1, :].transpose(0, 2, 1, 3)
    o = xla_reference(qh, kh, vh, ncc, pos, w5, bh, bk, bv, n)
    return (o**2).sum()


# Each lattice point: (id, env overrides, n, expected-route predicate).
# The predicate asserts the sweep actually exercises the intended path —
# an env-knob rename or gate change that silently reroutes fails loudly.
LATTICE = [
    ("plain", {"MLAFF_STACK": "0"}, 128,
     lambda r: not r.stacked and r.nb == 0 and r.window is None),
    ("stacked", {"MLAFF_STACK": "1"}, 128,
     lambda r: r.stacked),
    ("stacked-nosplit", {"MLAFF_STACK": "1", "MLAFF_SSPLIT": "0"}, 128,
     lambda r: r.stacked),
    ("stacked-padded", {"MLAFF_STACK": "1"}, 196,  # padded last cluster
     lambda r: r.stacked),
    ("kband", {"MLAFF_KBAND": "256"}, 617,
     lambda r: r.nb > 0 and not r.stacked),
    # THE commit-9432a70 overlap: banded shape under a huge stack bound
    ("kband-under-stack-bound",
     {"MLAFF_KBAND": "256", "MLAFF_STACK": "1",
      "MLAFF_STACK_NMAX": "1000000"}, 617,
     lambda r: r.nb > 0 and not r.stacked),
    ("padded-prime-n", {"MLAFF_STACK": "0"}, 617,
     lambda r: not r.stacked and r.nb == 0 and r.window is None),
    # saved-residual stacked backward (MLAFF_BWD_SAVED) at a padded
    # shape: exercises the (mx=+big, denom=1) padded-row stats fix.
    # NMIN=0 forces the saved path below its default 256 size floor so
    # these small shapes still cover it.
    ("stacked-saved", {"MLAFF_STACK": "1", "MLAFF_BWD_SAVED": "1",
                       "MLAFF_BWD_SAVED_NMIN": "0"}, 196,
     lambda r: r.stacked),
    ("stacked-saved-128", {"MLAFF_STACK": "1", "MLAFF_BWD_SAVED": "1",
                           "MLAFF_BWD_SAVED_NMIN": "0"},
     128, lambda r: r.stacked),
]


@pytest.mark.parametrize("name,env,n,expect", LATTICE,
                         ids=[p[0] for p in LATTICE])
def test_lattice_fwd_bwd_parity(monkeypatch, name, env, n, expect):
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    monkeypatch.setenv("MLAFF_PALLAS_BWD_INTERPRET", "1")

    np_ = -(-n // CS) * CS
    for bwd in (False, True):
        r = cp._route(n, np_, CS, None, None, bwd=bwd)
        assert expect(r), f"{name}: unexpected route {r} (bwd={bwd})"

    q, k, v, ncc, pos, w5, bh, bk, bv = make_inputs(n, seed=3)
    q_tm, kv_tm = to_token_major(q), fuse_kv(k, v)
    with jax.default_matmul_precision("highest"):
        o_f = fused_cluster_attention(
            q_tm, kv_tm, ncc, pos, w5, bh, bk, bv, H, CS, 27, 0
        )
        o_ref = xla_reference(q, k, v, ncc, pos, w5, bh, bk, bv, n)
        gf = jax.grad(_loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
            q_tm, kv_tm, w5, bh, bk, bv, ncc, pos
        )
        gr = jax.grad(_loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
            q_tm, kv_tm, w5, bh, bk, bv, ncc, pos, n
        )
    np.testing.assert_allclose(
        np.asarray(o_f), np.asarray(o_ref), atol=2e-5, rtol=1e-4,
        err_msg=f"{name}: forward diverges from the oracle",
    )
    for a, b, gname in zip(gf, gr, ["q", "kv", "w5", "bh", "bk", "bv"]):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-4,
            err_msg=f"{name}: grad({gname}) diverges from the oracle",
        )


def test_lattice_wstack_fwd_bwd(monkeypatch):
    """Windowed + row-stacked route (fwd AND bwd) vs the oracle. The
    windowed path is chip-only under ``_choose_tiling`` (it needs the
    host-constant geometry), so the tiling is pinned by hand exactly as
    scripts/parity_probe.py does on hardware."""
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
    ks = jax.random.split(jax.random.PRNGKey(7), 6)
    q_tm = jax.random.normal(ks[0], (b, n, heads * c_), jnp.float32)
    kv_tm = jax.random.normal(ks[1], (b, n, heads * 2 * c_), jnp.float32)
    w5 = jax.random.normal(ks[2], (5, heads), jnp.float32) * 0.1
    bh = jax.random.normal(ks[3], (heads,), jnp.float32) * 0.1
    bk = jax.random.normal(ks[4], (c_, heads), jnp.float32) * 0.5
    bv = jax.random.normal(ks[5], (heads, c_), jnp.float32) * 0.5

    monkeypatch.setenv("MLAFF_WFRAC", "1.0")
    monkeypatch.setenv("MLAFF_STACK", "0")
    monkeypatch.setenv("MLAFF_WSTACK", "2")
    monkeypatch.setenv("MLAFF_WSTACK_BWD", "2")
    monkeypatch.setenv("MLAFF_PALLAS_BWD_INTERPRET", "1")
    np_ = -(-n // cs) * cs
    win = cp._static_window(ncc_np, n, tq, cs, np_)
    assert win is not None
    orig = cp._choose_tiling

    def forced(n_, np__, cs_, sn):
        if sn is not None and n_ == n:
            return tq, win
        return orig(n_, np__, cs_, sn)

    monkeypatch.setattr(cp, "_choose_tiling", forced)
    r = cp._route(n, np_, cs, cp._StaticNcc(ncc_np, g_pos), None, bwd=True)
    assert r.window is not None and r.wsg_ok

    def loss(fn, q_, kv_):
        return (fn(q_, kv_) ** 2).sum()

    def run_windowed(q_, kv_):
        return fused_cluster_attention(
            q_, kv_, ncc, pos, w5, bh, bk, bv, num_heads=heads, cs=cs,
            rel_width=55, static_ncc=ncc_np, static_pos=g_pos,
        )

    def run_plain(q_, kv_):
        return fused_cluster_attention(
            q_, kv_, ncc, pos, w5, bh, bk, bv, num_heads=heads, cs=cs,
            rel_width=55,
        )

    with jax.default_matmul_precision("highest"):
        o_w = run_windowed(q_tm, kv_tm)
        o_p = run_plain(q_tm, kv_tm)
        gw = jax.grad(lambda a, b_: loss(run_windowed, a, b_),
                      argnums=(0, 1))(q_tm, kv_tm)
        gp = jax.grad(lambda a, b_: loss(run_plain, a, b_),
                      argnums=(0, 1))(q_tm, kv_tm)
    np.testing.assert_allclose(np.asarray(o_w), np.asarray(o_p),
                               atol=2e-5, rtol=1e-5)
    for a, b_, gname in zip(gw, gp, ["q", "kv"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-5, rtol=1e-4,
            err_msg=f"wstack bwd grad({gname}) diverges",
        )


def test_lattice_dropout_route(monkeypatch):
    """Dropout route (plain dense only): keep-mask statistics + the
    fwd/bwd mask agreement are pinned by test_fused_attention_dropout;
    here we only assert the dropout call takes the plain route and runs
    through both directions without NaNs at a padded shape."""
    monkeypatch.setenv("MLAFF_PALLAS_BWD_INTERPRET", "1")
    n = 196
    q, k, v, ncc, pos, w5, bh, bk, bv = make_inputs(n, seed=5)
    q_tm, kv_tm = to_token_major(q), fuse_kv(k, v)
    seed = jnp.asarray([123], jnp.int32)

    def loss(q_, kv_):
        o = fused_cluster_attention(
            q_, kv_, ncc, pos, w5, bh, bk, bv, H, CS, 27, 0,
            drop_rate=0.25, drop_seed=seed,
        )
        return (o**2).sum()

    val, grads = jax.value_and_grad(loss, argnums=(0, 1))(q_tm, kv_tm)
    assert np.isfinite(float(val))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("heads,expect_fused", [(2, True), (4, False)])
def test_layer_dropout_head_width_fallback(monkeypatch, heads, expect_fused):
    """ClusterAttention's dropout carve-out (layers.py): with attn_drop on
    in training, heads whose per-head width is not sublane-aligned
    (c_ % 8 != 0) must fall back to the XLA path — the Pallas backward
    (mandatory under dropout) needs c_ % 8 == 0. Documented in
    docs/TUNING.md; every shipped preset has c_ = 32 so the cliff is
    latent, but an exotic-head config must degrade gracefully, not crash
    or silently drop the dropout mask."""
    from ml_autofocusformermod_tpu.models.layers import ClusterAttention

    calls = []
    real = cp.fused_cluster_attention

    def spy(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(cp, "fused_cluster_attention", spy)

    c = 48  # c_ = 24 for h=2 (fused ok), c_ = 12 for h=4 (must fall back)
    n, cs, nnc = 64, 8, 3
    layer = ClusterAttention(
        dim=c, num_heads=heads, attn_drop=0.25, use_pallas=True,
        rel_pos_width=7,
    )
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    feat = jax.random.normal(ks[0], (B, n, c), jnp.float32)
    k_ = -(-n // cs)
    ncc = jnp.argsort(jax.random.uniform(ks[1], (B, n, k_)), axis=-1)[
        :, :, :nnc
    ].astype(jnp.int32)
    pos = jax.random.randint(ks[2], (B, n, 2), 0, 8).astype(jnp.float32)
    pe_feat = cp._rel_feat(pos, ncc, cs, 7, 0)  # XLA-fallback bias input
    mask = cp._pad_mask(ncc, cs, n, nnc).astype(jnp.float32)
    kwargs = dict(
        member_idx=None, cluster_mask=mask, global_attn=False,
        pe_feat=pe_feat, deterministic=False, nearest_cluster=ncc,
        cluster_size=cs, pos=pos,
    )
    variables = layer.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        feat, **kwargs,
    )
    calls.clear()
    out = layer.apply(
        variables, feat, **kwargs, rngs={"dropout": jax.random.PRNGKey(3)},
    )
    assert np.isfinite(np.asarray(out)).all()
    assert (len(calls) > 0) == expect_fused, (
        f"h={heads}: fused path {'not taken' if expect_fused else 'taken'}"
        " under dropout"
    )


def test_wstack_saved_bwd_matches_recompute(monkeypatch):
    """MLAFF_BWD_SAVED: the fwd-saved (max, denom, out) backward vs the
    flash-style recompute backward on the windowed batch-invariant
    route. The stats are bitwise the fwd's own values, so ps/pinv match
    exactly; the delta-trick s (rowsum(go*out) over c_ instead of the
    dp*p reduce over W) differs only by fp reassociation."""
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
    ks = jax.random.split(jax.random.PRNGKey(9), 6)
    q = jax.random.normal(ks[0], (b, n, heads * c_), jnp.float32)
    kv = jax.random.normal(ks[1], (b, n, heads * 2 * c_), jnp.float32)
    w5 = jax.random.normal(ks[2], (5, heads), jnp.float32) * 0.1
    bh = jax.random.normal(ks[3], (heads,), jnp.float32) * 0.1
    bk = jax.random.normal(ks[4], (c_, heads), jnp.float32) * 0.5
    bv = jax.random.normal(ks[5], (heads, c_), jnp.float32) * 0.5

    monkeypatch.setenv("MLAFF_PALLAS_BWD_INTERPRET", "1")
    monkeypatch.setenv("MLAFF_WFRAC", "1.0")
    monkeypatch.setenv("MLAFF_STACK", "0")
    np_ = -(-n // cs) * cs
    win = cp._static_window(ncc_np, n, tq, cs, np_)
    orig = cp._choose_tiling

    def forced(n_, np__, cs_, sn):
        if sn is not None and n_ == n:
            return tq, win
        return orig(n_, np__, cs_, sn)

    monkeypatch.setattr(cp, "_choose_tiling", forced)

    def loss(q_, kv_):
        o = fused_cluster_attention(
            q_, kv_, ncc, pos, w5, bh, bk, bv, num_heads=heads, cs=cs,
            rel_width=55, static_ncc=ncc_np, static_pos=g_pos,
        )
        return (o**2).sum()

    grads = {}
    # both wsg group sizes: >1 exercises the tall-scratch branch, =1 the
    # per-image branch's saved block
    for wsg_env in ("2", "0"):
        monkeypatch.setenv("MLAFF_WSTACK_BWD", wsg_env)
        for flag in ("1", "0"):
            monkeypatch.setenv("MLAFF_BWD_SAVED", flag)
            grads[(wsg_env, flag)] = jax.grad(
                loss, argnums=(0, 1))(q, kv)
        for a, b_, name in zip(grads[(wsg_env, "1")],
                               grads[(wsg_env, "0")], ["q", "kv"]):
            scale = max(float(jnp.abs(b_).max()), 1.0)
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b_) / scale, atol=5e-6,
                err_msg=f"saved-bwd grad({name}) diverges (wsg={wsg_env})",
            )


def test_wstack_dkv_batched_matches(monkeypatch):
    """MLAFF_BWD_DKV_OB: block-diagonal-batched dkw/dvw matmuls vs the
    per-image ones on the windowed wsg route (r5a decomposition: the dkv
    leg is ~6 ms of issue overhead at stage-1)."""
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
    ks = jax.random.split(jax.random.PRNGKey(13), 6)
    q = jax.random.normal(ks[0], (b, n, heads * c_), jnp.float32)
    kv = jax.random.normal(ks[1], (b, n, heads * 2 * c_), jnp.float32)
    w5 = jax.random.normal(ks[2], (5, heads), jnp.float32) * 0.1
    bh = jax.random.normal(ks[3], (heads,), jnp.float32) * 0.1
    bk = jax.random.normal(ks[4], (c_, heads), jnp.float32) * 0.5
    bv = jax.random.normal(ks[5], (heads, c_), jnp.float32) * 0.5

    monkeypatch.setenv("MLAFF_PALLAS_BWD_INTERPRET", "1")
    monkeypatch.setenv("MLAFF_WFRAC", "1.0")
    monkeypatch.setenv("MLAFF_STACK", "0")
    monkeypatch.setenv("MLAFF_WSTACK_BWD", "2")
    np_ = -(-n // cs) * cs
    win = cp._static_window(ncc_np, n, tq, cs, np_)
    orig = cp._choose_tiling

    def forced(n_, np__, cs_, sn):
        if sn is not None and n_ == n:
            return tq, win
        return orig(n_, np__, cs_, sn)

    monkeypatch.setattr(cp, "_choose_tiling", forced)

    def loss(q_, kv_):
        o = fused_cluster_attention(
            q_, kv_, ncc, pos, w5, bh, bk, bv, num_heads=heads, cs=cs,
            rel_width=55, static_ncc=ncc_np, static_pos=g_pos,
        )
        return (o**2).sum()

    base = jax.grad(loss, argnums=(0, 1))(q, kv)
    monkeypatch.setenv("MLAFF_BWD_DKV_OB", "2")
    batched = jax.grad(loss, argnums=(0, 1))(q, kv)
    for a, b_, name in zip(batched, base, ["q", "kv"]):
        scale = max(float(jnp.abs(b_).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b_) / scale, atol=5e-6,
            err_msg=f"dkv-batched grad({name}) diverges",
        )
