"""TPU parity probe: fused Pallas cluster attention vs the XLA one-hot
reference, stage-1 shapes (n=3136, cs=8, nnc=6), fp32 and bf16.

Expect maxdiff 0.0 at fp32 for windowed-vs-plain; small bf16 deviation.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ml_autofocusformermod_tpu.ops import clusten_pallas as cp
from ml_autofocusformermod_tpu.ops.cluster_gather import gather_clusters_onehot
from ml_autofocusformermod_tpu.ops.sfc import grid_cluster, grid_nearest_clusters


def reference(q, k, v, ncc, pos, pe_kernel, pe_bias, blank_logit, cs, R):
    n = q.shape[2]
    feat5 = cp._rel_feat(pos, ncc, cs, R, 0)
    bias = (
        jnp.einsum("bnmf,fh->bhnm", feat5, pe_kernel.astype(jnp.float32))
        + pe_bias.astype(jnp.float32)[None, :, None, None]
    )
    pad_ok = cp._pad_mask(ncc, cs, n, ncc.shape[-1])[:, None]
    kg = gather_clusters_onehot(k, ncc, cs)
    vg = gather_clusters_onehot(v, ncc, cs)
    logits = jnp.einsum(
        "bhic,bhimc->bhim", q.astype(jnp.float32), kg.astype(jnp.float32)
    ) + bias
    logits = jnp.where(pad_ok, logits, cp.NEG_INF)
    blank = blank_logit.astype(jnp.float32)
    mx = jnp.maximum(logits.max(-1, keepdims=True), blank)
    p = jnp.where(pad_ok, jnp.exp(logits - mx), 0.0)
    pb = jnp.exp(blank - mx)
    denom = p.sum(-1, keepdims=True) + pb
    out = jnp.einsum(
        "bhim,bhimc->bhic", p / denom, vg.astype(jnp.float32)
    )
    return out.astype(q.dtype), pb / denom


def main():
    h_, w_ = 56, 56
    cs, nnc, heads, c_, b = 8, 6, 2, 16, 4
    n = h_ * w_
    R = 55
    g_pos, *_ = grid_cluster(h_, w_, cs)
    ncc_np = grid_nearest_clusters(h_, w_, cs, nnc)
    pos = jnp.broadcast_to(jnp.asarray(g_pos, jnp.float32)[None], (b, n, 2))
    ncc = jnp.broadcast_to(
        jnp.asarray(ncc_np, jnp.int32)[None], (b,) + ncc_np.shape
    )
    key = jax.random.PRNGKey(0)
    for dtype, tol in ((jnp.float32, 0.0), (jnp.bfloat16, 0.15)):
        ks = jax.random.split(key, 6)
        q = jax.random.normal(ks[0], (b, heads, n, c_), dtype)
        k = jax.random.normal(ks[1], (b, heads, n, c_), dtype)
        v = jax.random.normal(ks[2], (b, heads, n, c_), dtype)
        pe_kernel = jax.random.normal(ks[3], (5, heads), jnp.float32) * 0.1
        pe_bias = jax.random.normal(ks[4], (heads,), jnp.float32) * 0.1
        blank = jax.random.normal(ks[5], (b, heads, n, 1), jnp.float32)

        fused = jax.jit(
            lambda *a: cp.fused_cluster_attention(
                *a, cs=cs, rel_width=R, static_ncc=ncc_np
            )
        )
        plain = jax.jit(
            lambda *a: cp.fused_cluster_attention(*a, cs=cs, rel_width=R)
        )
        ref = jax.jit(
            lambda *a: reference(*a, cs=cs, R=R)
        )
        args = (q, k, v, ncc, pos, pe_kernel, pe_bias, blank)
        of, bf = fused(*args)
        op, bp = plain(*args)
        orf, brf = ref(*args)
        d_wp = float(
            jnp.abs(of.astype(jnp.float32) - op.astype(jnp.float32)).max()
        )
        d_wr = float(
            jnp.abs(of.astype(jnp.float32) - orf.astype(jnp.float32)).max()
        )
        print(f"{dtype.__name__}: windowed-vs-plain maxdiff {d_wp:.3e}, "
              f"windowed-vs-xla-ref maxdiff {d_wr:.3e}")

        # gradient parity (Pallas bwd vs XLA one-hot bwd)
        def loss_fused(q, k, v, pek, peb, bl):
            o, pb_ = cp.fused_cluster_attention(
                q, k, v, ncc, pos, pek, peb, bl, cs=cs, rel_width=R,
                static_ncc=ncc_np,
            )
            return (o.astype(jnp.float32).sum() + pb_.sum())

        def loss_ref(q, k, v, pek, peb, bl):
            o, pb_ = reference(q, k, v, ncc, pos, pek, peb, bl, cs, R)
            return (o.astype(jnp.float32).sum() + pb_.sum())

        gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5)))
        gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5)))
        gfs = gf(q, k, v, pe_kernel, pe_bias, blank)
        grs = gr(q, k, v, pe_kernel, pe_bias, blank)
        for name, a, r in zip("q k v pek peb blank".split(), gfs, grs):
            d = float(
                jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)).max()
            )
            m = float(jnp.abs(r.astype(jnp.float32)).max())
            print(f"  grad {name}: maxdiff {d:.3e} (ref scale {m:.2e})")


if __name__ == "__main__":
    main()
