"""Curriculum recompile cost for MaskFiner-UD (VERDICT r2 item 7).

The upsampling-ratio curriculum rebuilds the model + train step whenever
the quantized ratio tuple changes (main.py:302-322); each distinct tuple
is one XLA program. This measures the per-tuple train-step compile time
on the chip and projects the total compile budget of a 300-epoch run
(tests/test_curriculum_quantize.py pins the tuple count; the persistent
compile cache makes every later epoch at a seen tuple free).

Usage: python scripts/bench_curriculum.py [batch] [n_tuples]
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

EPOCHS = 300


def main(batch: int, n_tuples: int) -> None:
    from bench_common import host_init

    from ml_autofocusformermod_tpu.config import load_config
    from ml_autofocusformermod_tpu.models.build import build_model
    from ml_autofocusformermod_tpu.train import curriculum, trainer

    cfg_name = os.environ.get("MLAFF_BENCH_CFG", "maskfiner_up_down_mini.yaml")
    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ml_autofocusformermod_tpu", "configs", cfg_name,
    )
    config = load_config(cfg_path)
    config.defrost()
    config.TPU.COMPUTE_DTYPE = "bfloat16"
    config.freeze()

    finals = list(config.MODEL.MR.UPSCALE_RATIO)
    seen, schedule_tuples = set(), []
    for e in range(EPOCHS):
        t = tuple(curriculum.epoch_upsample_ratios(finals, EPOCHS, e))
        if t not in seen:
            seen.add(t)
            schedule_tuples.append(t)
    print(
        f"# {len(schedule_tuples)} distinct ratio tuples over {EPOCHS} epochs",
        file=sys.stderr,
    )

    size = config.DATA.IMG_SIZE
    images = jax.random.normal(
        jax.random.PRNGKey(1), (batch, size, size, 3), jnp.float32
    )
    labels = jnp.arange(batch) % config.MODEL.NUM_CLASSES

    times = []
    for i, ratios in enumerate(schedule_tuples[:n_tuples]):
        model = build_model(config, upscale_ratios=list(ratios))
        variables = host_init(
            model,
            {"params": jax.random.PRNGKey(0), "upsample": jax.random.PRNGKey(7)},
            images[:1], training=False,
        )
        state, tx, sched = trainer.create_train_state(
            config, model, jax.random.PRNGKey(0), images[:1],
            n_steps_per_epoch=1000, variables=variables,
        )
        step = trainer.make_train_step(config, model, tx, sched)

        def one_step(state, images, labels):
            return step(
                state, {"image": images, "label": labels}, jax.random.PRNGKey(0)
            )

        t0 = time.time()
        compiled = (
            jax.jit(one_step, donate_argnums=(0,))
            .lower(state, images, labels).compile()
        )
        dt = time.time() - t0
        times.append(dt)
        print(json.dumps({
            "metric": f"maskfiner_ud_curriculum_compile_s_tuple{i}",
            "value": round(dt, 1), "unit": "s", "vs_baseline": None,
            "ratios": list(ratios),
        }))
        # one real step so the executable is exercised, then free it
        new_state, metrics = compiled(state, images, labels)
        print(f"# tuple{i} loss={float(metrics['loss']):.4f}", file=sys.stderr)
        del compiled, new_state, state

    if times:
        # first tuple pays any shared Mosaic/kernel compiles; later tuples
        # measure the marginal per-ratio cost
        marginal = times[1:] or times
        total = times[0] + sum(marginal) / len(marginal) * (
            len(schedule_tuples) - 1
        )
        print(json.dumps({
            "metric": "maskfiner_ud_curriculum_total_compile_s_projected",
            "value": round(total, 1), "unit": "s", "vs_baseline": None,
            "n_tuples": len(schedule_tuples),
        }))


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_tuples = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    main(batch, n_tuples)
