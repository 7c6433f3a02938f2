"""Microbench: fused cluster-merge fwd + bwd at the AFF merge shapes.

PERF.md r4i-7: merge BWD kernels cost 10.5 ms/step (3 stages, b128) and
have not been touched since the v3 kernel landed. This times the merge
alone per stage — fwd chain and value_and_grad chain — so bwd-side
changes can be A/B'd without a full train-step run.

Usage: python scripts/bench_merge.py [batch] [stage|all]
Env: MLAFF_MERGE_BWD=xla times the XLA reference-chain VJP instead.
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

# (name, n, n', c, cs, nnc) — AFF-Mini merge stages at 224x224
STAGES = {
    "s1": ("mini-s1", 3136, 784, 32, 8, 6),
    "s2": ("mini-s2", 784, 196, 128, 8, 6),
    "s3": ("mini-s3", 196, 49, 256, 8, 6),
}


def bench_stage(key, b):
    from ml_autofocusformermod_tpu.ops.merge_pallas import fused_cluster_merge

    name, n, n_, c, cs, nnc = STAGES[key]
    rng = np.random.default_rng(0)
    k = -(-n // cs)
    w = jnp.asarray(rng.standard_normal((b, n_, nnc * cs, 4)), jnp.bfloat16)
    f = jnp.asarray(rng.standard_normal((b, n, c)), jnp.bfloat16)
    ncc = jnp.asarray(rng.integers(0, k, (b, n_, nnc)), jnp.int32)

    def loss(w, f):
        return fused_cluster_merge(w, f, ncc, cs).astype(jnp.float32).sum()

    @jax.jit
    def fwd_chain(w, f):
        acc = 0.0
        for i in range(CHUNK):
            acc = acc + loss(w + jnp.bfloat16(i * 1e-3), f)
        return acc

    @jax.jit
    def grad_chain(w, f):
        acc = 0.0
        for i in range(CHUNK):
            v, (dw, df) = jax.value_and_grad(loss, argnums=(0, 1))(
                w + jnp.bfloat16(i * 1e-3), f
            )
            acc = (acc + v + dw.astype(jnp.float32).sum()
                   + df.astype(jnp.float32).sum())
        return acc

    def timed(fn):
        float(fn(w, f))
        float(fn(w, f))
        t1 = time.time()
        reps = 3
        for _ in range(reps):
            float(fn(w, f))
        return (time.time() - t1) / (reps * CHUNK) * 1000.0

    fwd_ms = timed(fwd_chain)
    tot_ms = timed(grad_chain)
    print(json.dumps({
        "metric": f"merge_{name}_ms_b{b}",
        "fwd_ms": round(fwd_ms, 3),
        "fwdbwd_ms": round(tot_ms, 3),
        "bwd_ms": round(tot_ms - fwd_ms, 3),
        "unit": "ms",
        "merge_bwd_env": os.environ.get("MLAFF_MERGE_BWD"),
    }))


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    keys = list(STAGES) if which == "all" else [which]
    for key in keys:
        bench_stage(key, b)


if __name__ == "__main__":
    main()
