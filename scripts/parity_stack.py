"""TPU parity probe for the stacked dense path (MLAFF_STACK): fused
attention with stacking on vs off at stage-3-like shapes (n=196 covers
row padding, data-dependent per-image geometry). Expect ~0 (both paths
compute the same f32 math; bf16 operands)."""

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


def main():
    rng = np.random.default_rng(0)
    for n, h, c_ in ((196, 12, 32), (49, 24, 32)):
        cs, nnc, b = 8, 6, 16
        k = -(-n // cs)
        R = 55
        pos = jnp.asarray(
            rng.uniform(0, 2 * R, size=(b, n, 2)).astype(np.float32))
        ncc = jnp.asarray(rng.integers(0, k, size=(b, n, nnc)).astype(np.int32))
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        q = jax.random.normal(ks[0], (b, n, h * c_), jnp.bfloat16)
        kv = jax.random.normal(ks[1], (b, n, h * 2 * c_), jnp.bfloat16)
        pe_kernel = jax.random.normal(ks[2], (5, h), jnp.float32) * 0.1
        pe_bias = jnp.zeros((h,), jnp.float32)
        blank_k = jax.random.normal(ks[3], (c_, h), jnp.float32) * 0.1
        blank_v = jnp.ones((h, c_), jnp.float32) * 0.2

        def run():
            f = jax.jit(lambda q, kv: cp.fused_cluster_attention(
                q, kv, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
                num_heads=h, cs=cs, rel_width=R))
            return np.asarray(f(q, kv), np.float32)

        os.environ["MLAFF_STACK"] = "0"
        o_plain = run()
        os.environ["MLAFF_STACK"] = "1"
        o_stack = run()
        d = np.abs(o_plain - o_stack).max()
        print(f"n={n} h={h}: stacked-vs-plain maxdiff {d:.3e}")
        assert d < 1e-2, "stacked path diverges from the default kernel"
    print("parity_stack: ok")


if __name__ == "__main__":
    main()
