"""Full-scale training burn-in on synthetic data (VERDICT r2 item 6).

Runs a few hundred real AFF-Mini train steps (b128, 224^2, bf16, the
exact make_train_step the trainer uses — mixup off, AdamW + clip + EMA on)
on a synthetic learnable task: each label's images share a fixed random
template plus noise. Asserts the smoothed loss decreases and every step's
grads are finite, then emits the measured steady-state train img/s.

Usage: python scripts/burnin.py [batch] [steps] [preset]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_SYN_CLASSES = 32  # distinct synthetic templates (mapped to labels 0..31)


def main(batch: int, steps: int, preset: str) -> None:
    from ml_autofocusformermod_tpu.config import load_config
    from ml_autofocusformermod_tpu.models.build import build_model
    from ml_autofocusformermod_tpu.train import trainer

    # 'ot' runs the MaskFiner OracleTeacher cascade (VERDICT r4 #4: AFF
    # and UD have burn-ins; OT needs the same training-signal evidence —
    # reference trains it, maskfiner_oracle_teacher_model.py:123-145)
    cfg_name = (
        "maskfiner_oracle_teacher.yaml" if preset == "ot"
        else f"aff_{preset}.yaml"
    )
    cfg_path = os.path.join(
        REPO, "ml_autofocusformermod_tpu", "configs", cfg_name
    )
    config = load_config(cfg_path)
    config.defrost()
    config.TPU.COMPUTE_DTYPE = "bfloat16"
    config.AUG.MIXUP = 0.0  # hard labels: loss floor ~0 so the decrease is visible
    config.AUG.CUTMIX = 0.0
    config.TRAIN.WARMUP_EPOCHS = 0
    # MLAFF_BURNIN_SIZE shrinks the image for CPU smoke runs only
    config.DATA.IMG_SIZE = int(
        os.environ.get("MLAFF_BURNIN_SIZE", config.DATA.IMG_SIZE)
    )
    config.freeze()

    model = build_model(config)
    size = config.DATA.IMG_SIZE

    rng = np.random.default_rng(0)
    templates = rng.normal(size=(N_SYN_CLASSES, size, size, 3)).astype(
        np.float32
    )

    # real model.init (trunc-normal etc.) — burn-in needs faithful init
    # dynamics, not the benches' host-side dummy leaves
    state, tx, schedule = trainer.create_train_state(
        config, model, jax.random.PRNGKey(0),
        jnp.zeros((1, size, size, 3), jnp.float32),
        n_steps_per_epoch=max(steps, 1),
    )
    step_fn = jax.jit(
        trainer.make_train_step(config, model, tx, schedule),
        donate_argnums=(0,),
    )

    templates_d = jax.device_put(jnp.asarray(templates))

    @jax.jit
    def make_batch(key):
        k1, k2 = jax.random.split(key)
        labels = jax.random.randint(k1, (batch,), 0, N_SYN_CLASSES)
        noise = 0.3 * jax.random.normal(k2, (batch, size, size, 3))
        images = templates_d[labels] + noise
        return {"image": images, "label": labels}

    t0 = time.time()
    losses, finite = [], []
    pending = []
    t_steady = None
    for i in range(steps):
        key = jax.random.fold_in(jax.random.PRNGKey(42), i)
        state, metrics = step_fn(state, make_batch(key), key)
        pending.append((metrics["loss"], metrics["grads_finite"]))
        if i == 0:
            print(f"# compile+step0 {time.time() - t0:.1f}s", file=sys.stderr)
        if i == min(19, steps - 1):
            # drain the pipeline, then time the steady-state tail
            for pl_, pf in pending:
                losses.append(float(pl_))
                finite.append(bool(pf))
            pending.clear()
            t_steady = time.time()
        if (i + 1) % 100 == 0:
            for pl_, pf in pending:
                losses.append(float(pl_))
                finite.append(bool(pf))
            pending.clear()
            print(
                f"# step {i + 1}: loss(avg last 50)="
                f"{np.mean(losses[-50:]):.4f}", file=sys.stderr,
            )
    for pl_, pf in pending:
        losses.append(float(pl_))
        finite.append(bool(pf))
    t_end = time.time()

    losses = np.asarray(losses)
    n_steady = steps - min(19, steps - 1) - 1
    fps = n_steady * batch / (t_end - t_steady) if n_steady > 0 else 0.0

    head = losses[:50].mean()
    tail = losses[-50:].mean()
    ok_finite = all(finite)
    ok_decrease = tail < head - 0.2
    print(json.dumps({
        "metric": f"aff_{preset}_burnin_loss_head50_tail50",
        "value": [round(float(head), 4), round(float(tail), 4)],
        "unit": "ce_loss", "vs_baseline": None,
        "steps": steps, "batch": batch,
        "grads_finite_all": ok_finite,
    }))
    print(json.dumps({
        "metric": f"aff_{preset}_burnin_train_images_per_sec",
        "value": round(fps, 1), "unit": "img/s", "vs_baseline": None,
    }))
    assert ok_finite, "non-finite grads during burn-in"
    if steps >= 200:  # short smoke runs only check finiteness
        assert ok_decrease, (
            f"loss did not decrease: head {head:.4f} tail {tail:.4f}"
        )
    print("BURNIN OK", file=sys.stderr)


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    preset = sys.argv[3] if len(sys.argv) > 3 else "mini"
    main(batch, steps, preset)
