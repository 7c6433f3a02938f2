"""MaskFiner-UD (mini preset) forward / train-step throughput on one chip.

The fork's own research path (``maskfinerUD``) has no published reference
numbers (SURVEY.md §6) — this records our TPU number so regressions are
visible. Same chained-jit protocol as bench.py.

Usage: python scripts/bench_maskfiner.py [batch] [mode]
  mode: fwd (default) | train

Env: the chain compiles as a fori_loop by default (one 7-backbone body
compile instead of CHUNK inlined copies — the unrolled chain at CHUNK=4
pushed the remote compile past 50 min); MLAFF_CHAIN=unroll restores the
inlined chain; MLAFF_BENCH_OPTS merges
ad-hoc config KVs (e.g. "TPU.REMAT blocks").
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

CHUNK = 2  # 7-backbone model: keep the unrolled chain compile-sized
           # (CHUNK=4 pushed the remote compile past 50 min)

FORI = os.environ.get("MLAFF_CHAIN", "fori") == "fori"


def _load_config():
    from ml_autofocusformermod_tpu.config import load_config

    cfg_name = os.environ.get("MLAFF_BENCH_CFG", "maskfiner_up_down_mini.yaml")
    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ml_autofocusformermod_tpu", "configs", cfg_name,
    )
    config = load_config(cfg_path)
    config.defrost()
    config.TPU.COMPUTE_DTYPE = "bfloat16"
    opts = os.environ.get("MLAFF_BENCH_OPTS", "").split()
    if opts:
        config.merge_from_list(opts)
    config.freeze()
    return config


def _slug() -> str:
    """Metric-name slug from the benched config (env-overridable)."""
    name = os.environ.get("MLAFF_BENCH_CFG", "maskfiner_up_down_mini.yaml")
    return (name.rsplit(".", 1)[0]
            .replace("maskfiner_up_down", "maskfiner_ud")
            .replace("maskfiner_oracle_teacher", "maskfiner_ot"))


def _emit(metric: str, fps: float) -> None:
    print(json.dumps({
        "metric": metric, "value": round(fps, 1),
        "unit": "img/s", "vs_baseline": None,
    }))


def fwd(batch: int) -> None:
    from ml_autofocusformermod_tpu.models.build import build_model

    config = _load_config()
    model = build_model(config)

    size = config.DATA.IMG_SIZE
    images = jax.random.normal(
        jax.random.PRNGKey(1), (batch, size, size, 3), jnp.float32
    )
    # abstract init + host-built leaves: a device model.init would
    # remote-compile the whole 7-backbone init graph (~9.5 min measured,
    # see PERF.md); parameter values don't affect throughput timing
    from bench_common import host_init

    t0 = time.time()
    variables = host_init(
        model,
        {"params": jax.random.PRNGKey(0), "upsample": jax.random.PRNGKey(7)},
        images[:1], training=False,
    )
    print(f"[init {time.time() - t0:.1f}s host-side]", file=sys.stderr)

    def one(variables, images, i_f32):
        out = model.apply(
            variables, images + i_f32 * 1e-6, training=False,
            rngs={"upsample": jax.random.PRNGKey(7)},
        )
        logits = out[-1] if isinstance(out, (list, tuple)) else out
        return logits.astype(jnp.float32).sum()

    if FORI:

        @jax.jit
        def fwd_chain(variables, images):
            def body(i, acc):
                return acc + one(variables, images, i.astype(jnp.float32))

            return jax.lax.fori_loop(0, CHUNK, body, jnp.float32(0.0))

    else:

        @jax.jit
        def fwd_chain(variables, images):
            acc = 0.0
            for i in range(CHUNK):
                acc = acc + one(variables, images, jnp.float32(i))
            return acc

    t0 = time.time()
    float(fwd_chain(variables, images))  # compile
    print(
        f"# compile {time.time() - t0:.1f}s chain="
        f"{'fori' if FORI else 'unroll'}", file=sys.stderr,
    )
    float(fwd_chain(variables, images))  # warm
    t1 = time.time()
    reps = 3
    for _ in range(reps):
        float(fwd_chain(variables, images))
    t2 = time.time()
    _emit(
        f"{_slug()}_{size}_fwd_images_per_sec",
        reps * CHUNK * batch / (t2 - t1),
    )


def train(batch: int) -> None:
    """Full train step (mixup + fwd + bwd + clip + AdamW + EMA + aux heads)
    on MaskFiner-UD mini."""
    from ml_autofocusformermod_tpu.models.build import build_model
    from ml_autofocusformermod_tpu.train import trainer

    config = _load_config()
    model = build_model(config)
    size = config.DATA.IMG_SIZE
    images = jax.random.normal(
        jax.random.PRNGKey(1), (batch, size, size, 3), jnp.float32
    )
    labels = jnp.arange(batch) % config.MODEL.NUM_CLASSES
    from bench_common import host_init

    t0 = time.time()
    variables = host_init(
        model,
        {"params": jax.random.PRNGKey(0), "upsample": jax.random.PRNGKey(7)},
        images[:1], training=False,
    )
    print(f"[init {time.time() - t0:.1f}s host-side]", file=sys.stderr)
    state, tx, schedule = trainer.create_train_state(
        config, model, jax.random.PRNGKey(0), images[:1],
        n_steps_per_epoch=1000, variables=variables,
    )
    step = trainer.make_train_step(config, model, tx, schedule)

    if FORI:

        def chain_fn(state, images, labels):
            def body(i, carry):
                state, loss = carry
                batch_d = {
                    "image": images + i.astype(jnp.float32) * 1e-6,
                    "label": labels,
                }
                state, metrics = step(
                    state, batch_d,
                    jax.random.fold_in(jax.random.PRNGKey(0), i),
                )
                return (state, loss + metrics["loss"].astype(jnp.float32))

            return jax.lax.fori_loop(0, CHUNK, body, (state, jnp.float32(0.0)))

    else:

        def chain_fn(state, images, labels):
            loss = 0.0
            for i in range(CHUNK):
                batch_d = {
                    "image": images + jnp.float32(i) * 1e-6, "label": labels,
                }
                state, metrics = step(state, batch_d, jax.random.PRNGKey(i))
                loss = loss + metrics["loss"]
            return state, loss

    t0 = time.time()
    # donate the state like the real trainer does (see bench_train.py)
    chain = (
        jax.jit(chain_fn, donate_argnums=(0,))
        .lower(state, images, labels).compile()
    )
    print(
        f"# compile {time.time() - t0:.1f}s chain="
        f"{'fori' if FORI else 'unroll'}", file=sys.stderr,
    )
    temp = getattr(chain.memory_analysis(), "temp_size_in_bytes", None)
    if isinstance(temp, (int, float)):
        print(json.dumps({
            "metric": f"{_slug()}_{size}_train_temp_bytes",
            "value": int(temp), "unit": "bytes", "vs_baseline": None,
        }))

    def run(state):
        new_state, loss = chain(state, images, labels)
        float(loss)
        return new_state

    state = run(state)  # warm
    t1 = time.time()
    reps = 3
    for _ in range(reps):
        state = run(state)
    t2 = time.time()
    _emit(
        f"{_slug()}_{size}_train_images_per_sec",
        reps * CHUNK * batch / (t2 - t1),
    )


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    mode = sys.argv[2] if len(sys.argv) > 2 else "fwd"
    if mode == "train":
        train(batch)
    else:
        fwd(batch)
