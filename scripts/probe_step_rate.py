"""Per-step dispatch overhead: sequential single-dispatch train steps.

The epoch loop sustained 67 img/s while loader (305 img/s), H2D
(2290 img/s bound) and the chained bare step (1060 img/s) are all much
faster — the remaining leg is the per-step DISPATCH round trip through
the axon tunnel (bench.py chains 20 steps inside one jit precisely to
amortize it; main.py dispatches per step like the reference hot loop,
``/root/reference/main.py:237-276``). This measures exactly that: N
back-to-back single dispatches of the jitted train step on pre-staged
device batches (no loader, no H2D in the loop).

Usage: python scripts/probe_step_rate.py [batch] [steps]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 60

    from ml_autofocusformermod_tpu.config import load_config
    from ml_autofocusformermod_tpu.models.build import build_model
    from ml_autofocusformermod_tpu.train import trainer

    config = load_config(os.path.join(
        REPO, "ml_autofocusformermod_tpu", "configs", "aff_mini.yaml"))
    config.defrost()
    config.TPU.COMPUTE_DTYPE = "bfloat16"
    config.AUG.MIXUP = 0.0
    config.AUG.CUTMIX = 0.0
    config.freeze()
    size = config.DATA.IMG_SIZE

    model = build_model(config)
    state, tx, schedule = trainer.create_train_state(
        config, model, jax.random.PRNGKey(0),
        jnp.zeros((1, size, size, 3), jnp.float32), n_steps_per_epoch=100,
    )
    step_fn = jax.jit(
        trainer.make_train_step(config, model, tx, schedule),
        donate_argnums=(0,),
    )
    key = jax.random.PRNGKey(0)
    batches = [
        {
            "image": jax.device_put(jax.random.normal(
                jax.random.fold_in(key, i), (batch, size, size, 3),
                jnp.float32)),
            "label": jax.device_put(jnp.zeros((batch,), jnp.int32)),
        }
        for i in range(4)
    ]
    # compile + warm
    state, m = step_fn(state, batches[0], key)
    float(m["loss"])
    t0 = time.time()
    last = None
    for i in range(steps):
        state, m = step_fn(state, batches[i % 4], key)
        last = m["loss"]
    float(last)  # drain the pipeline once at the end (async dispatch)
    dt_async = time.time() - t0
    t0 = time.time()
    for i in range(steps):
        state, m = step_fn(state, batches[i % 4], key)
        float(m["loss"])  # per-step sync, like a naive meter loop
    dt_sync = time.time() - t0
    print(json.dumps({
        "metric": "per_step_dispatch_rate",
        "async_img_per_s": round(steps * batch / dt_async, 1),
        "sync_img_per_s": round(steps * batch / dt_sync, 1),
        "async_ms_per_step": round(dt_async / steps * 1000, 1),
        "sync_ms_per_step": round(dt_sync / steps * 1000, 1),
        "batch": batch, "steps": steps,
    }))


if __name__ == "__main__":
    main()
