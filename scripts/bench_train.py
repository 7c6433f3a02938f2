"""Secondary benchmarks on one chip: AFF-Mini train step, AFF-Small forward.

Usage: python scripts/bench_train.py {mini_train,small_fwd}

Same chained-jit protocol as bench.py (per-dispatch tunnel latency excluded):
CHUNK steps inside one jit, inputs perturbed per iteration so XLA cannot CSE,
completion forced by a scalar host readback. Baselines are the reference's
published single-V100 numbers (README.md:46-51, measured via main.py:387-414).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 128
CHUNK = 10


def _model(name: str):
    from ml_autofocusformermod_tpu.models.aff import AutoFocusFormer

    if name == "mini":
        return AutoFocusFormer(
            num_classes=1000, embed_dim=(32, 128, 256, 384), cluster_size=8,
            nbhd_size=(48, 48, 48, 49), depths=(2, 2, 6, 2),
            num_heads=(2, 4, 8, 16), mlp_ratio=2.0, img_size=224,
            use_pallas=True, dtype=jnp.bfloat16,
        )
    # AFF-Small (configs/aff_small.yaml)
    return AutoFocusFormer(
        num_classes=1000, embed_dim=(96, 192, 384, 768), cluster_size=8,
        nbhd_size=(48, 48, 48, 49), depths=(2, 2, 18, 2),
        num_heads=(3, 6, 12, 24), mlp_ratio=3.0, img_size=224,
        use_pallas=True, dtype=jnp.bfloat16,
    )


def _timed(fn, *args) -> float:
    """Seconds per chained call (compile + warm first)."""
    float(fn(*args))
    float(fn(*args))
    t1 = time.time()
    reps = 3
    for _ in range(reps):
        float(fn(*args))
    t2 = time.time()
    return (t2 - t1) / reps


def small_fwd() -> None:
    model = _model("small")
    images = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 224, 224, 3))
    variables = model.init(jax.random.PRNGKey(0), images[:1], training=False)

    @jax.jit
    def chain(variables, images):
        acc = 0.0
        for i in range(CHUNK):
            logits = model.apply(
                variables, images + jnp.float32(i) * 1e-6, training=False
            )
            acc = acc + logits.astype(jnp.float32).sum()
        return acc

    sec = _timed(chain, variables, images)
    fps = CHUNK * BATCH / sec
    print(json.dumps({
        "metric": "aff_small_224_fwd_images_per_sec",
        "value": round(fps, 1), "unit": "img/s",
        "vs_baseline": round(fps / 321.0, 3),  # README.md:50, V100
    }))


def mini_train() -> None:
    """Full train step (mixup + fwd + bwd + clip + AdamW + EMA) on AFF-Mini."""
    from ml_autofocusformermod_tpu.config import load_config
    from ml_autofocusformermod_tpu.train import trainer

    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ml_autofocusformermod_tpu", "configs", "aff_mini.yaml",
    )
    cfg = load_config(cfg_path)
    model = _model("mini")
    images = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 224, 224, 3))
    labels = jnp.arange(BATCH) % 1000
    state, tx, schedule = trainer.create_train_state(
        cfg, model, jax.random.PRNGKey(0), images[:1], n_steps_per_epoch=1000
    )
    step = trainer.make_train_step(cfg, model, tx, schedule)

    @jax.jit
    def chain(state, images, labels):
        loss = 0.0
        for i in range(CHUNK):
            batch = {"image": images + jnp.float32(i) * 1e-6, "label": labels}
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            loss = loss + metrics["loss"]
        return state, loss

    def run(state):
        new_state, loss = chain(state, images, labels)
        float(loss)
        return new_state

    state = run(state)  # compile
    state = run(state)  # warm
    t1 = time.time()
    reps = 3
    for _ in range(reps):
        state = run(state)
    t2 = time.time()
    fps = reps * CHUNK * BATCH / (t2 - t1)
    print(json.dumps({
        "metric": "aff_mini_224_train_images_per_sec",
        "value": round(fps, 1), "unit": "img/s", "vs_baseline": None,
    }))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "mini_train"
    {"mini_train": mini_train, "small_fwd": small_fwd}[mode]()
