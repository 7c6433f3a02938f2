"""Microbench: fused attention fwd+bwd at an arbitrary DENSE-path stage
shape (stacked small-token stages) — bwd twin of scripts/bench_stage.py.

Usage: python scripts/bench_stage_bwd.py <n> <heads> <head_dim> [batch]
AFF-Mini dense stages at 224^2 (cs=8, nnc=6): s2 n=784 h=4 c_=32,
s3 n=196 h=8 c_=32. Env: MLAFF_BWD_SAVED=1 A/Bs the saved-residual bwd.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CHUNK = 20


def main() -> None:
    from ml_autofocusformermod_tpu.ops import clusten_pallas as cp

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 196
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    c_ = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    b = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    cs, nnc, R = 8, 6, 55
    k = -(-n // cs)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, 2 * R, (b, n, 2)).astype(np.float32))
    ncc = jnp.asarray(rng.integers(0, k, (b, n, nnc)), jnp.int32)
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
            num_heads=h, cs=cs, rel_width=R,
        )
        return o.astype(jnp.float32).sum()

    @jax.jit
    def fwd_chain(q, kv):
        acc = 0.0
        for i in range(CHUNK):
            acc = acc + loss(q + jnp.bfloat16(i * 1e-3), kv)
        return acc

    @jax.jit
    def grad_chain(q, kv):
        acc = 0.0
        for i in range(CHUNK):
            v, (dq, dkv) = jax.value_and_grad(loss, argnums=(0, 1))(
                q + jnp.bfloat16(i * 1e-3), kv
            )
            acc = (acc + v + dq.astype(jnp.float32).sum()
                   + dkv.astype(jnp.float32).sum())
        return acc

    def timed(fn):
        float(fn(q, kv))
        float(fn(q, kv))
        t1 = time.time()
        reps = 3
        for _ in range(reps):
            float(fn(q, kv))
        return (time.time() - t1) / (reps * CHUNK) * 1000.0

    fwd_ms = timed(fwd_chain)
    tot_ms = timed(grad_chain)
    print(json.dumps({
        "metric": "stage_attention_bwd_ms_n%d_h%d_c%d_b%d" % (n, h, c_, b),
        "fwd_ms": round(fwd_ms, 3),
        "fwdbwd_ms": round(tot_ms, 3),
        "bwd_ms": round(tot_ms - fwd_ms, 3),
        "unit": "ms",
        "saved_env": os.environ.get("MLAFF_BWD_SAVED"),
    }))


if __name__ == "__main__":
    main()
