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


def to_token_major(x):
    b, h, n, c_ = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * c_)


def fuse_kv(k, v):
    b, h, n, c_ = k.shape
    kv = jnp.stack([k, v], axis=3)
    return kv.transpose(0, 2, 1, 3, 4).reshape(b, n, h * 2 * c_)


def reference(q_tm, kv_tm, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
              h, cs, R):
    b, n, c = q_tm.shape
    c_ = c // h
    q = q_tm.reshape(b, n, h, c_).transpose(0, 2, 1, 3).astype(jnp.float32)
    kvh = kv_tm.reshape(b, n, h, 2, c_)
    k = kvh[..., 0, :].transpose(0, 2, 1, 3)
    v = kvh[..., 1, :].transpose(0, 2, 1, 3)
    feat5 = cp._rel_feat(pos, ncc, cs, R, 0)
    bias = (
        jnp.einsum("bnmf,fh->bhnm", feat5, pe_kernel.astype(jnp.float32))
        + pe_bias.astype(jnp.float32)[None, :, None, None]
    )
    pad_ok = cp._pad_mask(ncc, cs, n, ncc.shape[-1])[:, None]
    kg = gather_clusters_onehot(k, ncc, cs)
    vg = gather_clusters_onehot(v, ncc, cs)
    logits = jnp.einsum(
        "bhic,bhimc->bhim", q, kg.astype(jnp.float32)
    ) + bias
    logits = jnp.where(pad_ok, logits, cp.NEG_INF)
    bk32 = blank_k.astype(jnp.float32)
    bv32 = blank_v.astype(jnp.float32)
    blank = jnp.einsum("bhic,ch->bhi", q, bk32)[..., None]
    mx = jnp.maximum(logits.max(-1, keepdims=True), blank)
    p = jnp.where(pad_ok, jnp.exp(logits - mx), 0.0)
    pb = jnp.exp(blank - mx)
    denom = p.sum(-1, keepdims=True) + pb
    out = jnp.einsum(
        "bhim,bhimc->bhic", p / denom, vg.astype(jnp.float32)
    )
    out = out + (pb / denom) * bv32[None, :, None, :]
    return to_token_major(out).astype(q_tm.dtype)


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
        ks = jax.random.split(key, 7)
        q = jax.random.normal(ks[0], (b, heads, n, c_), dtype)
        k = jax.random.normal(ks[1], (b, heads, n, c_), dtype)
        v = jax.random.normal(ks[2], (b, heads, n, c_), dtype)
        pe_kernel = jax.random.normal(ks[3], (5, heads), jnp.float32) * 0.1
        pe_bias = jax.random.normal(ks[4], (heads,), jnp.float32) * 0.1
        blank_k = (jax.random.normal(ks[5], (c_, heads), jnp.float32) * 0.5
                   ).astype(dtype)
        blank_v = (jax.random.normal(ks[6], (heads, c_), jnp.float32) * 0.5
                   ).astype(dtype)
        q_tm, kv_tm = to_token_major(q), fuse_kv(k, v)

        fused = jax.jit(
            lambda *a: cp.fused_cluster_attention(
                *a, num_heads=heads, cs=cs, rel_width=R, static_ncc=ncc_np,
                static_pos=g_pos,
            )
        )
        plain = jax.jit(
            lambda *a: cp.fused_cluster_attention(
                *a, num_heads=heads, cs=cs, rel_width=R
            )
        )
        ref = jax.jit(
            lambda *a: reference(*a, h=heads, cs=cs, R=R)
        )
        args = (q_tm, kv_tm, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v)
        of = fused(*args)
        op = plain(*args)
        orf = ref(*args)
        d_wp = float(
            jnp.abs(of.astype(jnp.float32) - op.astype(jnp.float32)).max()
        )
        d_wr = float(
            jnp.abs(of.astype(jnp.float32) - orf.astype(jnp.float32)).max()
        )
        print(f"{dtype.__name__}: windowed-vs-plain maxdiff {d_wp:.3e}, "
              f"windowed-vs-xla-ref maxdiff {d_wr:.3e}")

        # gradient parity (Pallas bwd vs XLA one-hot bwd)
        def loss_fused(q_tm, kv_tm, pek, peb, bk, bv):
            o = cp.fused_cluster_attention(
                q_tm, kv_tm, ncc, pos, pek, peb, bk, bv,
                num_heads=heads, cs=cs, rel_width=R, static_ncc=ncc_np,
                static_pos=g_pos,
            )
            return o.astype(jnp.float32).sum()

        def loss_ref(q_tm, kv_tm, pek, peb, bk, bv):
            o = reference(q_tm, kv_tm, ncc, pos, pek, peb, bk, bv,
                          heads, cs, R)
            return o.astype(jnp.float32).sum()

        gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5)))
        gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5)))
        gfs = gf(q_tm, kv_tm, pe_kernel, pe_bias, blank_k, blank_v)
        grs = gr(q_tm, kv_tm, pe_kernel, pe_bias, blank_k, blank_v)
        for name, a, r in zip("q kv pek peb blank_k blank_v".split(),
                              gfs, grs):
            d = float(
                jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)).max()
            )
            m = float(jnp.abs(r.astype(jnp.float32)).max())
            print(f"  grad {name}: maxdiff {d:.3e} (ref scale {m:.2e})")


if __name__ == "__main__":
    main()
