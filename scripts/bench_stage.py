"""Microbench: the fused cluster-attention kernel at an arbitrary stage
shape, exercising the dense (non-windowed, data-dependent geometry) path
that stages >= 2 use.

Usage: python scripts/bench_stage.py <n> <heads> <head_dim> [cs] [nnc] [batch]

AFF-Small stage shapes at 224^2 (cs=8, nnc=6):
    stage2: n=784  heads=6  c_=32
    stage3: n=196  heads=12 c_=32
    stage4: n=49   heads=24 c_=32
Env experiments: MLAFF_GBH=<m> raises/lowers the gb*h unroll bound,
MLAFF_GB_CAP=<g> hard-caps images per instance, MLAFF_TQ=<t> forces the
query tile.
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

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 784
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    c_ = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    cs = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    nnc = int(sys.argv[5]) if len(sys.argv) > 5 else 6
    b = int(sys.argv[6]) if len(sys.argv) > 6 else 128
    R = 55
    k = n // cs

    rng = np.random.default_rng(0)
    # off-grid positions + per-image random nearest clusters: the dense
    # path never inspects geometry at trace time, so random ints suffice
    pos = jnp.asarray(
        rng.uniform(0, 2 * R, size=(b, n, 2)).astype(np.float32)
    )
    ncc = jnp.asarray(
        rng.integers(0, k, size=(b, n, nnc)).astype(np.int32)
    )

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, n, h * c_), jnp.bfloat16)
    kv = jax.random.normal(ks[1], (b, n, h * 2 * c_), jnp.bfloat16)
    pe_kernel = (jax.random.normal(ks[2], (5, h), jnp.float32) * 0.1)
    pe_bias = jnp.zeros((h,), jnp.float32)
    blank_k = jax.random.normal(ks[3], (c_, h), jnp.float32) * 0.1
    blank_v = jnp.ones((h, c_), jnp.float32) * 0.2

    fca = lambda q, kv, ncc, pos: cp.fused_cluster_attention(  # noqa: E731
        q, kv, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
        num_heads=h, cs=cs, rel_width=R, static_ncc=None,
    )

    @jax.jit
    def chain(q, kv, ncc, pos):
        acc = 0.0
        for i in range(CHUNK):
            out = fca(q + jnp.bfloat16(i) * jnp.bfloat16(1e-3), kv, ncc, pos)
            acc = acc + out.astype(jnp.float32).sum()
        return acc

    float(chain(q, kv, ncc, pos))  # compile
    float(chain(q, kv, ncc, pos))  # warm
    t1 = time.time()
    reps = 3
    for _ in range(reps):
        float(chain(q, kv, ncc, pos))
    t2 = time.time()
    ms = (t2 - t1) / (reps * CHUNK) * 1000.0
    print(json.dumps({
        "metric": "stage_dense_attention_ms_n%d_h%d_c%d_b%d" % (n, h, c_, b),
        "value": round(ms, 3), "unit": "ms",
        "gbh_env": os.environ.get("MLAFF_GBH"),
        "gb_env": os.environ.get("MLAFF_GB_CAP"),
        "tq_env": os.environ.get("MLAFF_TQ"),
    }))


if __name__ == "__main__":
    main()
