"""CPU-interpreter probe of the padded dense kernels at the curriculum
ratio-1.0 shape class (n ~ 4161, the r3g-1 TPU-worker crash): fwd + full
grads vs the XLA oracle at the exact (n, c, h, cs, nnc, gb) the chip ran.

Usage: python scripts/probe_pad_cpu.py [n] [b]
"""

import os
import sys

os.environ["MLAFF_PALLAS_INTERPRET"] = "1"
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax
import jax.numpy as jnp
import numpy as np

from test_pallas_kernel import (  # noqa: E402
    fuse_kv, make_inputs, to_token_major, xla_reference, H, CS, R, C_, B,
)
from ml_autofocusformermod_tpu.ops.clusten_pallas import (  # noqa: E402
    fused_cluster_attention,
)


def main(n, b):
    import test_pallas_kernel as tpk
    tpk.B = b  # match the chip's gb grouping as closely as CPU allows

    q, k, v, ncc, pos, w5, bh, bk, bv = make_inputs(n, seed=11)
    q_tm, kv_tm = to_token_major(q), fuse_kv(k, v)

    def loss_fused(q_tm, kv_tm):
        o = fused_cluster_attention(
            q_tm, kv_tm, ncc, pos, w5, bh, bk, bv, H, CS, R, 0
        )
        return (o**2).sum()

    with jax.default_matmul_precision("highest"):
        o_f = fused_cluster_attention(
            q_tm, kv_tm, ncc, pos, w5, bh, bk, bv, H, CS, R, 0
        )
        o_ref = xla_reference(q, k, v, ncc, pos, w5, bh, bk, bv, n)
        d = float(jnp.abs(o_f - o_ref).max())
        print(f"fwd max_abs {d:.3e} (scale {float(jnp.abs(o_ref).max()):.1f})")
        assert d < 5e-4, "forward mismatch"
        g = jax.grad(loss_fused, argnums=(0, 1))(q_tm, kv_tm)
        for name, arr in zip(["dq", "dkv"], g):
            assert bool(jnp.isfinite(arr).all()), f"non-finite {name}"
        print("grads finite; PROBE OK")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4161
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    main(n, b)
