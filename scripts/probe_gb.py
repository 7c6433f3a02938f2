"""Spot-probe: dense (non-windowed) kernel path with large image groups
(gb=16) vs the XLA reference — stage-3-like shapes (n=196, b=32)."""

import os

import jax
import jax.numpy as jnp

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from parity_probe import fuse_kv, reference, to_token_major  # noqa: E402

from ml_autofocusformermod_tpu.ops import clusten_pallas as cp  # noqa: E402


def main():
    b, n, cs, nnc, heads, c_ = 32, 196, 8, 6, 4, 32
    k_ = -(-n // cs)
    R = 55
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    pos = jax.random.randint(ks[0], (b, n, 2), 0, 112).astype(jnp.float32)
    ncc = jnp.argsort(jax.random.uniform(ks[1], (b, n, k_)), axis=-1)[
        :, :, :nnc
    ].astype(jnp.int32)
    q = jax.random.normal(ks[2], (b, heads, n, c_), jnp.float32)
    k = jax.random.normal(ks[3], (b, heads, n, c_), jnp.float32)
    v = jax.random.normal(ks[4], (b, heads, n, c_), jnp.float32)
    pe_kernel = jax.random.normal(ks[5], (5, heads), jnp.float32) * 0.1
    pe_bias = jnp.zeros((heads,), jnp.float32)
    blank_k = jnp.ones((c_, heads), jnp.float32) * 0.1
    blank_v = jnp.ones((heads, c_), jnp.float32) * 0.2
    q_tm, kv_tm = to_token_major(q), fuse_kv(k, v)
    args = (q_tm, kv_tm, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v)
    of = jax.jit(
        lambda *a: cp.fused_cluster_attention(
            *a, num_heads=heads, cs=cs, rel_width=R
        )
    )(*args)
    with jax.default_matmul_precision("highest"):
        orf = jax.jit(lambda *a: reference(*a, h=heads, cs=cs, R=R))(*args)
    d = float(jnp.abs(of - orf).max())
    print(f"dense gb-path fwd maxdiff {d:.3e}")

    def loss(q_tm, kv_tm):
        o = cp.fused_cluster_attention(
            q_tm, kv_tm, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
            num_heads=heads, cs=cs, rel_width=R,
        )
        return o.sum()

    def loss_ref(q_tm, kv_tm):
        return reference(q_tm, kv_tm, ncc, pos, pe_kernel, pe_bias,
                         blank_k, blank_v, heads, cs, R).sum()

    gf = jax.jit(jax.grad(loss, argnums=(0, 1)))(q_tm, kv_tm)
    with jax.default_matmul_precision("highest"):
        gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(q_tm, kv_tm)
    for name, a, r in zip(("q", "kv"), gf, gr):
        d = float(jnp.abs(a - r).max())
        m = float(jnp.abs(r).max())
        print(f"dense gb-path grad {name} maxdiff {d:.3e} (scale {m:.2e})")


if __name__ == "__main__":
    main()
