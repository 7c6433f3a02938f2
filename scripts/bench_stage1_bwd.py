"""Microbench: the fused cluster-attention BACKWARD at AFF stage-1 shapes.

Times the fwd-only chain and the value_and_grad chain at the windowed
batch-invariant shapes (b=128, n=3136, cs=8, nnc=6), and reports the
backward-only estimate (grad_chain - fwd_chain). This isolates the
round-5 perf target (PERF.md r4i-7: stage-1 attention bwd 27.2 ms/step
= 2 blocks) from the full train step.

Usage: python scripts/bench_stage1_bwd.py [batch] [heads] [head_dim]
Env experiments: MLAFF_WSTACK_BWD=<k> forces the bwd row-stack group,
MLAFF_BPROBE=<phases> runs the numerics-breaking decomposition probes
(see clusten_pallas._bwd_kernel), MLAFF_GB_CAP / MLAFF_TQ as usual.
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

    def fca(q, kv):
        return cp.fused_cluster_attention(
            q, kv, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v,
            num_heads=h, cs=cs, rel_width=R, static_ncc=ncc_np,
            static_pos=pos_np,
        )

    def loss(q, kv):
        return fca(q, kv).astype(jnp.float32).sum()

    @jax.jit
    def fwd_chain(q, kv):
        acc = 0.0
        for i in range(CHUNK):
            acc = acc + loss(q + jnp.bfloat16(i) * jnp.bfloat16(1e-3), kv)
        return acc

    @jax.jit
    def grad_chain(q, kv):
        acc = 0.0
        for i in range(CHUNK):
            v, (dq, dkv) = jax.value_and_grad(loss, argnums=(0, 1))(
                q + jnp.bfloat16(i) * jnp.bfloat16(1e-3), kv
            )
            acc = (acc + v + dq.astype(jnp.float32).sum()
                   + dkv.astype(jnp.float32).sum())
        return acc

    def timed(fn):
        t0 = time.time()
        float(fn(q, kv))  # compile
        compile_s = time.time() - t0
        float(fn(q, kv))  # warm
        t1 = time.time()
        reps = 3
        for _ in range(reps):
            float(fn(q, kv))
        t2 = time.time()
        return (t2 - t1) / (reps * CHUNK) * 1000.0, compile_s

    fwd_ms, fwd_c = timed(fwd_chain)
    tot_ms, tot_c = timed(grad_chain)
    print(json.dumps({
        "metric": "stage1_attention_bwd_ms_b%d_h%d_c%d" % (b, h, c_),
        "fwd_ms": round(fwd_ms, 3),
        "fwdbwd_ms": round(tot_ms, 3),
        "bwd_ms": round(tot_ms - fwd_ms, 3),
        "unit": "ms",
        "compile_s": [round(fwd_c, 1), round(tot_c, 1)],
        "wstack_bwd_env": os.environ.get("MLAFF_WSTACK_BWD"),
        "bprobe_env": os.environ.get("MLAFF_BPROBE"),
    }))


if __name__ == "__main__":
    main()
