"""Diagnose MaskFiner-UD on the real chip: time each phase separately
(build / init-on-cpu? / trace / compile / run) with a single forward."""

import os
import time

import jax
import jax.numpy as jnp

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


def main():
    batch = 8

    from ml_autofocusformermod_tpu.config import load_config
    from ml_autofocusformermod_tpu.models.build import build_model

    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ml_autofocusformermod_tpu", "configs", "maskfiner_up_down_mini.yaml",
    )
    config = load_config(cfg_path)
    config.defrost()
    config.TPU.COMPUTE_DTYPE = "bfloat16"
    config.freeze()
    model = build_model(config)
    mark("model built")

    images = jax.random.normal(
        jax.random.PRNGKey(1), (batch, 224, 224, 3), jnp.float32
    )
    mark("images ready")
    variables = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "upsample": jax.random.PRNGKey(7)},
            images[:1], training=False,
        )
    )
    mark(f"init eval_shape done ({len(jax.tree_util.tree_leaves(variables))} leaves)")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "upsample": jax.random.PRNGKey(7)},
        images[:1], training=False,
    )
    mark("init done (device)")

    fwd = jax.jit(
        lambda v, x: model.apply(
            v, x, training=False, rngs={"upsample": jax.random.PRNGKey(7)}
        )
    )
    traced = fwd.trace(variables, images)
    mark("traced")
    lowered = traced.lower()
    mark("lowered")
    compiled = lowered.compile()
    mark("compiled")
    out = compiled(variables, images)
    logits = out[-1] if isinstance(out, (list, tuple)) else out
    mark(f"ran: logits sum {float(logits.astype(jnp.float32).sum()):.3f}")


if __name__ == "__main__":
    main()
