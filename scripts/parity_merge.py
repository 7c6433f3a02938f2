"""On-chip parity probe for the fused Pallas cluster-merge kernel
(ops/merge_pallas.py) vs the XLA reference chain, at the real AFF merge
shapes — Mosaic-compiled numerics, not the CPU interpreter.

Run on the TPU: python scripts/parity_merge.py
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ml_autofocusformermod_tpu.ops.cluster_gather import (  # noqa: E402
    gather_clusters_onehot,
)
from ml_autofocusformermod_tpu.ops.clusten import wf_contract  # noqa: E402
from ml_autofocusformermod_tpu.ops.merge_pallas import (  # noqa: E402
    fused_cluster_merge,
)

# (name, b, n, n', c, cs, nnc) — AFF-Mini merge stages at 224x224, plus a
# padded-cluster case (196 % 8 != 0 -> zero-padded last cluster)
CASES = [
    ("mini-s1", 16, 3136, 784, 32, 8, 6),
    ("mini-s2", 16, 784, 196, 128, 8, 6),
    ("mini-s3", 16, 196, 49, 256, 8, 6),
    ("small-s1", 8, 3136, 784, 96, 8, 6),
]


def ref(w, f, ncc, cs):
    fg = gather_clusters_onehot(f[:, None].astype(w.dtype), ncc, cs)[:, 0]
    return wf_contract(w, fg)


def run(name, b, n, n_, c, cs, nnc, dtype):
    rng = np.random.default_rng(0)
    k = -(-n // cs)
    w = jnp.asarray(rng.standard_normal((b, n_, nnc * cs, 4)), dtype)
    f = jnp.asarray(rng.standard_normal((b, n, c)), dtype)
    ncc = jnp.asarray(rng.integers(0, k, (b, n_, nnc)), jnp.int32)

    t0 = time.time()
    out = np.asarray(
        jax.jit(lambda w, f: fused_cluster_merge(w, f, ncc, cs))(w, f),
        np.float32,
    )
    r = np.asarray(jax.jit(lambda w, f: ref(w, f, ncc, cs))(w, f), np.float32)
    d = np.abs(out - r)
    scale = np.abs(r).max()
    print(f"[{name} {dtype.__name__}] fwd max_abs {d.max():.3e} "
          f"(out scale {scale:.1f})  {time.time()-t0:.1f}s")

    def loss_f(w, f):
        o = fused_cluster_merge(w, f, ncc, cs)
        return (o.astype(jnp.float32) * jnp.cos(
            jnp.arange(o.size, dtype=jnp.float32).reshape(o.shape))).sum()

    def loss_r(w, f):
        o = ref(w, f, ncc, cs)
        return (o.astype(jnp.float32) * jnp.cos(
            jnp.arange(o.size, dtype=jnp.float32).reshape(o.shape))).sum()

    gw, gf = jax.jit(jax.grad(loss_f, (0, 1)))(w, f)
    rw, rf = jax.jit(jax.grad(loss_r, (0, 1)))(w, f)
    for nm, a, bb in (("d_w", gw, rw), ("d_f", gf, rf)):
        a = np.asarray(a, np.float32)
        bb = np.asarray(bb, np.float32)
        dd = np.abs(a - bb)
        rel = dd.max() / max(np.abs(bb).max(), 1e-9)
        print(f"[{name} {dtype.__name__}] {nm} max_abs {dd.max():.3e} "
              f"rel-of-max {rel:.3e}")


def main():
    for case in CASES:
        run(*case, dtype=jnp.float32)
        run(*case, dtype=jnp.bfloat16)
    print("parity_merge done")


if __name__ == "__main__":
    main()
