"""TPU parity probe for the traced-window path (MLAFF_TWIN): fused
attention + gradients with the flag on vs off at a stage-2-like shape
with spatially-local neighborhoods (windowed dispatch taken) and with
random neighborhoods (span check must fall back to dense)."""

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


def run_case(n, h, c_, ncc, pos, b):
    cs, R = 8, 55
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, n, h * c_), jnp.bfloat16)
    kv = jax.random.normal(ks[1], (b, n, h * 2 * c_), jnp.bfloat16)
    pe_kernel = jax.random.normal(ks[2], (5, h), jnp.float32) * 0.1
    pe_bias = jnp.zeros((h,), jnp.float32)
    blank_k = jax.random.normal(ks[3], (c_, h), jnp.float32) * 0.1
    blank_v = jnp.ones((h, c_), jnp.float32) * 0.2

    def loss(q, kv):
        o = cp.fused_cluster_attention(
            q, kv, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
            num_heads=h, cs=cs, rel_width=R)
        return o.astype(jnp.float32).sum(), o

    g = jax.jit(jax.grad(lambda q, kv: loss(q, kv)[0], argnums=(0, 1)))
    f = jax.jit(lambda q, kv: loss(q, kv)[1])
    return (np.asarray(f(q, kv), np.float32),
            [np.asarray(x, np.float32) for x in g(q, kv)])


def main():
    rng = np.random.default_rng(0)
    n, h, c_, b = 768, 6, 32, 16
    cs, nnc = 8, 6
    k = n // cs
    R = 55
    pos = jnp.asarray(rng.uniform(0, 2 * R, size=(b, n, 2)).astype(np.float32))
    own = np.arange(n) // cs
    local = ((own[None, :, None] + np.arange(nnc)[None, None, :]) % k)
    ncc_local = jnp.asarray(
        np.broadcast_to(local, (b, n, nnc)).astype(np.int32))
    ncc_rand = jnp.asarray(rng.integers(0, k, size=(b, n, nnc)).astype(np.int32))

    for label, ncc in (("local(windowed)", ncc_local), ("random(fallback)",
                                                        ncc_rand)):
        os.environ["MLAFF_TWIN"] = "0"
        o0, g0 = run_case(n, h, c_, ncc, pos, b)
        os.environ["MLAFF_TWIN"] = "1"
        o1, g1 = run_case(n, h, c_, ncc, pos, b)
        d = np.abs(o0 - o1).max()
        dg = max(np.abs(a - b_).max() for a, b_ in zip(g0, g1))
        print(f"{label}: fwd maxdiff {d:.3e}, grad maxdiff {dg:.3e}")
        assert d < 1e-2 and dg < 1e-1, f"twin path diverges ({label})"
    print("parity_twin: ok")


if __name__ == "__main__":
    main()
