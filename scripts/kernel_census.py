"""Count distinct Pallas kernel instantiations per model (VERDICT r2 #5).

Each distinct (kernel fn, grid, block shapes) tuple is one Mosaic compile;
the cold-compile wall clock is roughly their sum plus the XLA glue. This
traces fwd (and optionally the train step) abstractly on CPU and prints
the census, so shape-splintering regressions (gb/tq choices multiplying
variants) are visible without a chip.

Usage: python scripts/kernel_census.py [preset ...]
"""

import os
import sys
from collections import Counter

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from jax.experimental import pallas as pl  # noqa: E402


def census(fn, *args):
    counts = Counter()
    real_pallas_call = pl.pallas_call

    def counting_pallas_call(kernel, *a, **kw):
        grid = kw.get("grid")
        out_shape = kw.get("out_shape")

        def shape_of(x):
            if isinstance(x, (list, tuple)):
                return tuple(shape_of(e) for e in x)
            return tuple(getattr(x, "shape", ())) + (
                str(getattr(x, "dtype", "")),
            )

        name = getattr(kernel, "func", kernel)
        name = getattr(name, "__name__", str(name))
        kws = getattr(kernel, "keywords", {})
        static = tuple(sorted((k, v) for k, v in kws.items()
                              if isinstance(v, (int, bool, str))))
        counts[(name, grid, shape_of(out_shape), static)] += 1
        return real_pallas_call(kernel, *a, **kw)

    pl.pallas_call = counting_pallas_call
    try:
        jax.eval_shape(fn, *args)
    finally:
        pl.pallas_call = real_pallas_call
    return counts


def main(presets):
    # force the TPU kernel path even though we trace on CPU
    from ml_autofocusformermod_tpu.config import load_config
    from ml_autofocusformermod_tpu.models.build import build_model

    for preset in presets:
        cfg = load_config(os.path.join(
            REPO, "ml_autofocusformermod_tpu", "configs", f"{preset}.yaml"
        ))
        cfg.defrost()
        cfg.TPU.COMPUTE_DTYPE = "bfloat16"
        cfg.freeze()
        # build_model gates use_pallas on the backend, and ClusterMerging
        # resolves its default merge path at TRACE time — spoof the
        # backend for the whole census so the CPU trace counts the full
        # TPU kernel set (eval_shape never executes, so the interpret
        # flag the spoof also affects is moot)
        orig_backend = jax.default_backend
        jax.default_backend = lambda: "tpu"
        model = build_model(cfg)
        b = 128 if cfg.MODEL.TYPE == "aff" else 64
        x = jnp.zeros((b, cfg.DATA.IMG_SIZE, cfg.DATA.IMG_SIZE, 3),
                      jnp.float32)
        rngs = {"params": jax.random.PRNGKey(0),
                "upsample": jax.random.PRNGKey(7)}
        variables = jax.eval_shape(
            lambda x: model.init(rngs, x, training=False), x
        )

        def fwd(v, x):
            out = model.apply(v, x, training=False,
                              rngs={"upsample": jax.random.PRNGKey(7)})
            return out[-1] if isinstance(out, (list, tuple)) else out

        fcounts = census(fwd, variables, x)

        def loss(v, x):
            return fwd(v, x).astype(jnp.float32).sum()

        gcounts = census(jax.grad(lambda v, x: loss(v, x)), variables, x)
        jax.default_backend = orig_backend

        print(f"== {preset} (b{b}) ==")
        print(f" fwd: {sum(fcounts.values())} pallas calls, "
              f"{len(fcounts)} distinct Mosaic programs")
        for key, cnt in sorted(fcounts.items(), key=repr):
            print(f"   {cnt:3d}x {key[0]} grid={key[1]} static={key[3]}")
        print(f" fwd+bwd: {sum(gcounts.values())} calls, "
              f"{len(gcounts)} distinct")
        for key, cnt in sorted(gcounts.items(), key=repr):
            if key not in fcounts:
                print(f"   {cnt:3d}x {key[0]} grid={key[1]} static={key[3]}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["aff_mini", "aff_small"])
