"""Cross-lower the fused attention kernel to TPU from a CPU host.

Mosaic block-mapping/shape errors fire at *lowering* time (inside the
pallas_call lowering rule), so `jit(f).trace(...).lower(
lowering_platforms=("tpu",))` catches them without a chip lease — the
compact-union path shipped with a block shape Mosaic rejects and only the
on-chip parity probe found it. Run:

    JAX_PLATFORMS=cpu python scripts/lower_check.py

Lowers fwd and bwd for every kernel path (default, MLAFF_COMPACT,
MLAFF_STACK, MLAFF_TWIN) at an on-grid stage-1 geometry and at traced
n=196 (stacked-eligible) / n=784 (twin-eligible) shapes. Exits non-zero
on any lowering failure. Note this validates lowering only — Mosaic's
*compile* step still runs remotely on first chip use.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main() -> int:
    import jax

    # the ambient sitecustomize's plugin registration outranks the env
    # var; force the platform through jax.config too
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from ml_autofocusformermod_tpu.ops.clusten_pallas import (
        fused_cluster_attention,
    )
    from ml_autofocusformermod_tpu.ops.sfc import (
        grid_cluster,
        grid_nearest_clusters,
    )

    failures = []

    def check(name, fn, *args):
        try:
            jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))
            print(f"OK   {name}", flush=True)
        except Exception as e:  # noqa: BLE001 - report every path
            msg = str(e).splitlines()[0][:200]
            print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
            failures.append(name)

    b, cs, nnc = 8, 8, 6
    h, c_ = 2, 32
    c = h * c_

    # on-grid stage-1 geometry at a reduced 56x56 grid (same code path as
    # 224^2 stage 1; smaller so host precompute stays quick)
    hw = 56
    n = hw * hw
    pos_np, _, _, _, _ = grid_cluster(hw, hw, cs)
    g_ncc = grid_nearest_clusters(hw, hw, cs, nnc)
    pos = jnp.broadcast_to(jnp.asarray(pos_np)[None], (b, n, 2))
    ncc = jnp.broadcast_to(jnp.asarray(g_ncc)[None], (b, n, nnc))

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, n, c)), jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((b, n, 2 * c)), jnp.bfloat16)
    wpe = jnp.asarray(rng.standard_normal((5, h)), jnp.float32)
    bpe = jnp.asarray(rng.standard_normal((h,)), jnp.float32)
    bk = jnp.asarray(rng.standard_normal((c_, h)), jnp.bfloat16)
    bv = jnp.asarray(rng.standard_normal((h, c_)), jnp.float32)
    rel_width = 2 * hw - 1

    def fwd(q, kv, ncc, pos, st, sp):
        return fused_cluster_attention(
            q, kv, ncc, pos, wpe, bpe, bk, bv, h, cs, rel_width,
            static_ncc=st, static_pos=sp,
        )

    def loss(q, kv, ncc, pos, st, sp):
        return fwd(q, kv, ncc, pos, st, sp).astype(jnp.float32).sum()

    for label, env in [("default", {}), ("MLAFF_COMPACT", {"MLAFF_COMPACT": "1"}),
                       ("MLAFF_STACK", {"MLAFF_STACK": "1"}),
                       ("MLAFF_TWIN", {"MLAFF_TWIN": "1"})]:
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            check(f"{label:13s} fwd ongrid",
                  lambda a, b2: fwd(a, b2, ncc, pos, g_ncc, pos_np), q, kv)
            check(f"{label:13s} bwd ongrid",
                  lambda a, b2: jax.grad(
                      lambda x, y: loss(x, y, ncc, pos, g_ncc, pos_np)
                  )(a, b2), q, kv)
            for n2 in (196, 784):
                k2 = -(-n2 // cs)
                q2 = jnp.asarray(rng.standard_normal((b, n2, c)), jnp.bfloat16)
                kv2 = jnp.asarray(
                    rng.standard_normal((b, n2, 2 * c)), jnp.bfloat16)
                ncc2 = jnp.asarray(
                    rng.integers(0, k2, (b, n2, nnc)), jnp.int32)
                pos2 = jnp.asarray(
                    rng.integers(0, 64, (b, n2, 2)).astype(np.float32))
                check(f"{label:13s} fwd traced n={n2}",
                      lambda a, b2, c2, d2: fwd(a, b2, c2, d2, None, None),
                      q2, kv2, ncc2, pos2)
                check(f"{label:13s} bwd traced n={n2}",
                      lambda a, b2, c2, d2: jax.grad(
                          lambda x, y: loss(x, y, c2, d2, None, None)
                      )(a, b2), q2, kv2, ncc2, pos2)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    print(f"{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
