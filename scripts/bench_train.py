"""Secondary benchmarks on one chip: AFF forward for every 1K preset, plus
the AFF-Mini full train step.

Usage:
    python scripts/bench_train.py fwd <preset>   # mini, mini_1_5th, tiny,
                                                 # tiny_1_5th, small, small_1_5th
    python scripts/bench_train.py mini_train
    python scripts/bench_train.py small_fwd      # alias for: fwd small

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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = int(os.environ.get("MLAFF_BATCH", "128"))
CHUNK = 10

# Reference's published single-V100 FPS (README.md:46-51). The base 22kto1k
# models have no published FPS (README.md:59 lists only acc/params/FLOPs).
V100_FPS = {
    "mini": 1337.0,
    "mini_1_5th": 1678.0,
    "tiny": 528.0,
    "tiny_1_5th": 682.0,
    "small": 321.0,
    "small_1_5th": 424.0,
    "base_22kto1k": None,
    "base_22kto1k_384": None,
}

# Forward-bench batch per preset (BATCH for everything but the big 384 model).
FWD_BATCH = {"base_22kto1k_384": 32}


def _build(preset: str):
    from ml_autofocusformermod_tpu.config import load_config
    from ml_autofocusformermod_tpu.models.build import build_model

    cfg_path = os.path.join(
        REPO, "ml_autofocusformermod_tpu", "configs", f"aff_{preset}.yaml"
    )
    config = load_config(cfg_path)
    config.defrost()
    config.TPU.COMPUTE_DTYPE = "bfloat16"
    # ad-hoc A/B overrides without touching the preset yamls, e.g.
    #   MLAFF_BENCH_OPTS="TPU.REMAT blocks" python scripts/bench_train.py ...
    opts = os.environ.get("MLAFF_BENCH_OPTS", "").split()
    if opts:
        config.merge_from_list(opts)
    config.freeze()
    return config, build_model(config)


def fwd(preset: str) -> None:
    config, model = _build(preset)
    batch = FWD_BATCH.get(preset, BATCH)
    size = config.DATA.IMG_SIZE
    images = jax.random.normal(jax.random.PRNGKey(1), (batch, size, size, 3))
    from bench_common import host_init

    variables = host_init(
        model, jax.random.PRNGKey(0), images[:1], training=False
    )

    if os.environ.get("MLAFF_CHAIN", "fori") == "fori":

        @jax.jit
        def chain(variables, images):
            def body(i, acc):
                logits = model.apply(
                    variables, images + i.astype(jnp.float32) * 1e-6,
                    training=False,
                )
                return acc + logits.astype(jnp.float32).sum()

            return jax.lax.fori_loop(0, CHUNK, body, jnp.float32(0.0))

    else:

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
    fps = CHUNK * batch / sec
    baseline = V100_FPS[preset]
    print(json.dumps({
        "metric": f"aff_{preset}_{size}_fwd_images_per_sec",
        "value": round(fps, 1), "unit": "img/s",
        "vs_baseline": None if baseline is None else round(fps / baseline, 3),
    }))


def _timed(fn, *args) -> float:
    """Seconds per chained call (compile + warm first).

    Timed reps are dispatched asynchronously and synced ONCE at the end
    (single-device executions run in dispatch order), so only one tunnel
    round-trip lands inside the timed window — a per-rep float() sync put
    ~3 RTTs in it and showed up as ±5% VM-to-VM swings on identical code.
    """
    float(fn(*args))
    float(fn(*args))
    t1 = time.time()
    reps = 3
    outs = [fn(*args) for _ in range(reps)]
    float(outs[-1])
    t2 = time.time()
    return (t2 - t1) / reps


def mini_train(preset: str = "mini") -> None:
    """Full train step (mixup + fwd + bwd + clip + AdamW + EMA)."""
    from ml_autofocusformermod_tpu.train import trainer

    cfg, model = _build(preset)
    images = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 224, 224, 3))
    labels = jnp.arange(BATCH) % 1000
    from bench_common import host_init

    variables = host_init(
        model, jax.random.PRNGKey(0), images[:1], training=False
    )
    state, tx, schedule = trainer.create_train_state(
        cfg, model, jax.random.PRNGKey(0), images[:1],
        n_steps_per_epoch=1000, variables=variables,
    )
    step = trainer.make_train_step(cfg, model, tx, schedule)

    if os.environ.get("MLAFF_CHAIN", "fori") == "fori":

        def chain_fn(state, images, labels):
            def body(i, carry):
                state, loss = carry
                batch = {
                    "image": images + i.astype(jnp.float32) * 1e-6,
                    "label": labels,
                }
                state, metrics = step(
                    state, batch, jax.random.fold_in(jax.random.PRNGKey(0), i)
                )
                return (state, loss + metrics["loss"].astype(jnp.float32))

            return jax.lax.fori_loop(
                0, CHUNK, body, (state, jnp.float32(0.0))
            )

    else:

        def chain_fn(state, images, labels):
            loss = 0.0
            for i in range(CHUNK):
                batch = {
                    "image": images + jnp.float32(i) * 1e-6, "label": labels,
                }
                state, metrics = step(state, batch, jax.random.PRNGKey(i))
                loss = loss + metrics["loss"]
            return state, loss

    t0 = time.time()
    # donate the state like the real trainer does — without it the chain
    # holds a second copy of params+opt-state and the temp-bytes report
    # (the REMAT A/B's subject) is inflated
    chain = (
        jax.jit(chain_fn, donate_argnums=(0,))
        .lower(state, images, labels).compile()
    )
    print(
        f"# compile {time.time() - t0:.1f}s "
        f"chain={os.environ.get('MLAFF_CHAIN', 'fori')}",
        file=sys.stderr,
    )
    # compiled temp (activation/workspace) memory — the number TPU.REMAT
    # trades FLOPs against; /CHUNK since the chain holds CHUNK steps
    temp = getattr(chain.memory_analysis(), "temp_size_in_bytes", None)
    if isinstance(temp, (int, float)):
        print(json.dumps({
            "metric": f"aff_{preset}_224_train_temp_bytes",
            "value": int(temp), "unit": "bytes", "vs_baseline": None,
        }))

    def run(state):
        new_state, loss = chain(state, images, labels)
        float(loss)
        return new_state

    state = run(state)  # warm
    # async-dispatch the timed reps, sync once on the last loss (ordered
    # execution on one device) — keeps a single tunnel RTT in the window
    t1 = time.time()
    reps = 3
    losses = []
    for _ in range(reps):
        state, loss = chain(state, images, labels)
        losses.append(loss)
    float(losses[-1])
    t2 = time.time()
    fps = reps * CHUNK * BATCH / (t2 - t1)
    print(json.dumps({
        "metric": f"aff_{preset}_224_train_images_per_sec",
        "value": round(fps, 1), "unit": "img/s", "vs_baseline": None,
    }))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "mini_train"
    if mode == "fwd":
        fwd(sys.argv[2])
    elif mode == "small_fwd":
        fwd("small")
    elif mode == "train":
        mini_train(sys.argv[2])
    else:
        mini_train()
