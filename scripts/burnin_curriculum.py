"""Curriculum-boundary burn-in for MaskFiner-UD (VERDICT r3 item 5).

Trains the UD-mini model on synthetic data across a REAL quantized-ratio
recompile boundary, exactly the way the trainer does it (main.py:302-322):
run N steps at the epoch-e ratio tuple, rebuild the model + train step at
the first later epoch whose tuple differs, carry the optimizer state over
(parameter shapes are ratio-independent), and run N more steps. Asserts
every step's grads are finite and the loss is continuous across the
boundary (post-boundary head <= pre-boundary tail + margin), and reports
both programs' compile times (cache-hit on rerun).

Usage: python scripts/burnin_curriculum.py [batch] [steps_per_side]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_SYN_CLASSES = 16
EPOCHS = 300


def main(batch: int, steps: int) -> None:
    from ml_autofocusformermod_tpu.config import load_config
    from ml_autofocusformermod_tpu.models.build import build_model
    from ml_autofocusformermod_tpu.train import curriculum, trainer

    cfg_path = os.path.join(
        REPO, "ml_autofocusformermod_tpu", "configs",
        os.environ.get("MLAFF_BENCH_CFG", "maskfiner_up_down_mini.yaml"),
    )
    config = load_config(cfg_path)
    config.defrost()
    config.TPU.COMPUTE_DTYPE = "bfloat16"
    config.AUG.MIXUP = 0.0
    config.AUG.CUTMIX = 0.0
    config.TRAIN.WARMUP_EPOCHS = 0
    config.DATA.IMG_SIZE = int(
        os.environ.get("MLAFF_BURNIN_SIZE", config.DATA.IMG_SIZE)
    )
    config.freeze()
    size = config.DATA.IMG_SIZE

    # find the first ratio-tuple boundary of the 300-epoch schedule
    model0 = build_model(config)
    finals = list(model0.final_upsampling_ratios)
    t0_tuple = tuple(curriculum.epoch_upsample_ratios(finals, EPOCHS, 0))
    e_boundary, t1_tuple = None, None
    for e in range(1, EPOCHS):
        t = tuple(curriculum.epoch_upsample_ratios(finals, EPOCHS, e))
        if t != t0_tuple:
            e_boundary, t1_tuple = e, t
            break
    assert e_boundary is not None, "schedule has no ratio boundary"
    print(f"# tuple0={t0_tuple} -> tuple1={t1_tuple} at epoch {e_boundary}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    templates = jax.device_put(jnp.asarray(rng.normal(
        size=(N_SYN_CLASSES, size, size, 3)).astype(np.float32)))

    @jax.jit
    def make_batch(key):
        k1, k2 = jax.random.split(key)
        labels = jax.random.randint(k1, (batch,), 0, N_SYN_CLASSES)
        noise = 0.3 * jax.random.normal(k2, (batch, size, size, 3))
        return {"image": templates[labels] + noise, "label": labels}

    model = build_model(config, upscale_ratios=list(t0_tuple))
    state, tx, schedule = trainer.create_train_state(
        config, model, jax.random.PRNGKey(0),
        jnp.zeros((1, size, size, 3), jnp.float32),
        n_steps_per_epoch=max(steps, 1),
    )

    def run_side(state, ratios, start_i, tag):
        model = build_model(config, upscale_ratios=list(ratios))
        step_fn = jax.jit(
            trainer.make_train_step(config, model, tx, schedule),
            donate_argnums=(0,),
        )
        tc = time.time()
        losses, finite = [], []
        for i in range(steps):
            key = jax.random.fold_in(jax.random.PRNGKey(7), start_i + i)
            state, metrics = step_fn(state, make_batch(key), key)
            losses.append(metrics["loss"])
            finite.append(metrics["grads_finite"])
            if i == 0:
                print(f"# {tag}: compile+step0 {time.time() - tc:.1f}s",
                      file=sys.stderr)
        losses = [float(x) for x in losses]
        finite = [bool(x) for x in finite]
        print(f"# {tag}: loss {losses[0]:.4f} .. {losses[-1]:.4f} "
              f"finite={all(finite)}", file=sys.stderr)
        return state, losses, all(finite)

    state, l0, f0 = run_side(state, t0_tuple, 0, "tuple0")
    state, l1, f1 = run_side(state, t1_tuple, steps, "tuple1")

    k = max(3, steps // 4)
    pre_tail = float(np.mean(l0[-k:]))
    post_head = float(np.mean(l1[:k]))
    # continuity: the recompiled program must keep training the same
    # weights — no loss reset/explosion across the boundary
    ok = f0 and f1 and post_head < pre_tail + 0.75 and np.isfinite(l1).all()
    print(json.dumps({
        "metric": "ud_curriculum_boundary_burnin",
        "value": [round(pre_tail, 4), round(post_head, 4)],
        "unit": "ce_loss_pre_tail_post_head",
        "boundary_epoch": e_boundary,
        "grads_finite": bool(f0 and f1),
        "ok": bool(ok),
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    main(b, s)
