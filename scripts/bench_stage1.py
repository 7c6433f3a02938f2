"""Microbench: the fused cluster-attention kernel alone at AFF-Mini stage-1
shapes (b=128, n=3136, cs=8, nnc=6, h=2, c_=32, on-grid host-constant
geometry -> windowed + batch-invariant path).

Usage: python scripts/bench_stage1.py [batch] [heads] [head_dim]
(heads/head_dim default 2/32; AFF-Small stage-1 is heads=3 head_dim=32.)
Env experiments: MLAFF_TQ=<t> forces the query tile, MLAFF_KAPPA=<k> tunes
the tiling cost model, MLAFF_GB_CAP=<g> caps images per kernel instance.
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
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from ml_autofocusformermod_tpu.ops import clusten_pallas as cp
    from ml_autofocusformermod_tpu.ops import sfc

    n, cs, nnc = 3136, 8, 6
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    c_ = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    R = 55
    pos_np, _, _, _, _ = [np.asarray(x) for x in sfc.grid_cluster(56, 56, cs)]
    ncc_np = np.asarray(sfc.grid_nearest_clusters(56, 56, cs, nnc))
    pos = jnp.broadcast_to(jnp.asarray(pos_np, jnp.float32), (b, n, 2))
    ncc = jnp.broadcast_to(jnp.asarray(ncc_np, jnp.int32), (b, n, nnc))

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, n, h * c_), jnp.bfloat16)
    kv = jax.random.normal(ks[1], (b, n, h * 2 * c_), jnp.bfloat16)
    pe_kernel = (jax.random.normal(ks[2], (5, h), jnp.float32) * 0.1)
    pe_bias = jnp.zeros((h,), jnp.float32)
    blank_k = jax.random.normal(ks[3], (c_, h), jnp.float32) * 0.1
    blank_v = jnp.ones((h, c_), jnp.float32) * 0.2

    fca = lambda q, kv: cp.fused_cluster_attention(  # noqa: E731
        q, kv, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
        num_heads=h, cs=cs, rel_width=R, static_ncc=ncc_np,
        static_pos=pos_np,
    )

    @jax.jit
    def chain(q, kv):
        acc = 0.0
        for i in range(CHUNK):
            out = fca(q + jnp.bfloat16(i) * jnp.bfloat16(1e-3), kv)
            acc = acc + out.astype(jnp.float32).sum()
        return acc

    float(chain(q, kv))  # compile
    float(chain(q, kv))  # warm
    t1 = time.time()
    reps = 3
    for _ in range(reps):
        float(chain(q, kv))
    t2 = time.time()
    ms = (t2 - t1) / (reps * CHUNK) * 1000.0
    print(json.dumps({
        "metric": "stage1_fused_attention_ms_b%d_h%d_c%d" % (b, h, c_),
        "value": round(ms, 3), "unit": "ms",
        "tq_env": os.environ.get("MLAFF_TQ"),
        "kappa_env": os.environ.get("MLAFF_KAPPA"),
        "gb_env": os.environ.get("MLAFF_GB_CAP"),
    }))


if __name__ == "__main__":
    main()
