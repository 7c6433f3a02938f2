"""Train/eval/throughput engine over a device mesh.

TPU re-design of the reference trainer (``main.py:200-414``):

* one jitted train step: mixup -> forward (bf16) -> soft-CE -> grad ->
  clip(5.0) -> AdamW -> EMA, with XLA inserting the data-axis gradient
  all-reduce (replaces DDP hooks + GradScaler; bf16 needs no loss scaling)
* the reference's per-step host-side NaN/Inf gradient audit
  (``main.py:270-276``) becomes an in-graph ``grads_finite`` flag
* eval step returns (loss_sum, top1, top5, count) partial sums; cross-chip
  averaging is a ``jnp`` reduction instead of explicit NCCL all-reduce
  (``utils.py:127-131``)
* throughput mode = 50 warmup + 30 timed forwards, the reference's own FPS
  metric (``main.py:387-414``)
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from .losses import cross_entropy, mixup_cutmix, soft_target_cross_entropy
from .optim import build_optimizer
from .schedulers import build_scheduler


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None  # None when EMA disabled
    # timm ModelEmaV2 shadows the full state_dict — buffers (BN running
    # stats) included (reference main.py:155-163) — so the shadow carries
    # its own batch_stats tree too.
    ema_batch_stats: Any = None


def create_train_state(
    config, model, rng: jax.Array, sample_input: jax.Array,
    n_steps_per_epoch: int = 1000, variables: Optional[Any] = None,
) -> Tuple[TrainState, optax.GradientTransformation, Callable]:
    """``variables`` lets callers supply a pre-built tree (checkpoint
    import, or host-side abstract init in the benches) instead of running
    ``model.init`` on the device."""
    if variables is None:
        variables = model.init(rng, sample_input, training=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    schedule = build_scheduler(config, n_steps_per_epoch)
    tx = build_optimizer(config, schedule)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        # distinct buffers, not aliases of params: aliased leaves break
        # buffer donation (donate_argnums on the train step) with
        # "attempt to donate the same buffer twice"
        ema_params=(
            jax.tree_util.tree_map(jnp.copy, params)
            if config.TRAIN.USE_EMA
            else None
        ),
        ema_batch_stats=(
            jax.tree_util.tree_map(jnp.copy, batch_stats)
            if config.TRAIN.USE_EMA
            else None
        ),
    )
    return state, tx, schedule


def make_train_step(
    config, model, tx: optax.GradientTransformation, schedule: Callable
) -> Callable:
    """Build the jitted train step: (state, batch, rng) -> (state, metrics)."""
    num_classes = config.MODEL.NUM_CLASSES
    smoothing = config.MODEL.LABEL_SMOOTHING
    mixup_on = config.AUG.MIXUP > 0 or config.AUG.CUTMIX > 0
    use_ema = config.TRAIN.USE_EMA
    ema_decay = config.TRAIN.EMA_DECAY
    accum = max(config.TRAIN.ACCUMULATION_STEPS, 1)

    def loss_fn(params, batch_stats, images, target, rng):
        rng_drop, rng_up = jax.random.split(rng)
        outputs, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            training=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng_drop, "upsample": rng_up},
        )
        if isinstance(outputs, (list, tuple)):
            # aux-head models return a list; average the losses (main.py:248-257)
            losses = [soft_target_cross_entropy(o, target) for o in outputs]
            loss = sum(losses) / len(losses)
        else:
            loss = soft_target_cross_entropy(outputs, target)
        return loss, updates.get("batch_stats", batch_stats)

    def train_step(state: TrainState, batch, rng):
        images, labels = batch["image"], batch["label"]
        rng_mix, rng_drop = jax.random.split(jax.random.fold_in(rng, state.step))
        if mixup_on:
            images, target = mixup_cutmix(
                rng_mix, images, labels, num_classes,
                mixup_alpha=config.AUG.MIXUP,
                cutmix_alpha=config.AUG.CUTMIX,
                prob=config.AUG.MIXUP_PROB,
                switch_prob=config.AUG.MIXUP_SWITCH_PROB,
                smoothing=smoothing,
            )
        else:
            from .losses import smooth_one_hot

            target = smooth_one_hot(labels, num_classes, smoothing)

        (loss, new_batch_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, images, target, rng_drop)

        grad_norm = optax.global_norm(grads)
        grads_finite = jnp.isfinite(grad_norm)

        updates, new_opt_state = tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)

        # Skip the optimizer step on non-finite grads (the reference's AMP
        # GradScaler does the same, main.py:270-276); bf16 overflow on one
        # bad batch must not poison the params/moments.
        keep = lambda n, o: jnp.where(grads_finite, n, o)
        new_params = jax.tree_util.tree_map(keep, new_params, state.params)
        new_opt_state = jax.tree_util.tree_map(
            keep, new_opt_state, state.opt_state
        )

        if use_ema:
            # timm ModelEmaV2 semantics (reference main.py:155-163,265-269):
            # the shadow updates once per OPTIMIZER update — under gradient
            # accumulation that is the accum-th micro-step (when
            # optax.MultiSteps emits the real update), NOT every micro-step
            # (decay per micro-step would compound to decay^accum) — and it
            # covers the full state_dict, BN running stats included.
            boundary = (state.step + 1) % accum == 0

            def ema_update(e, p):
                new = e * ema_decay + p.astype(e.dtype) * (1.0 - ema_decay)
                return jnp.where(boundary, new, e)

            new_ema = jax.tree_util.tree_map(
                ema_update, state.ema_params, new_params
            )
            new_ema_bs = jax.tree_util.tree_map(
                ema_update, state.ema_batch_stats, new_batch_stats
            )
        else:
            new_ema = None
            new_ema_bs = None

        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
            ema_params=new_ema,
            ema_batch_stats=new_ema_bs,
        )
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "grads_finite": grads_finite,
            # the schedule is indexed in optimizer steps (schedulers.py
            # divides epoch lengths by accum); state.step counts micro-steps
            "lr": schedule(state.step // accum),
        }
        return new_state, metrics

    return train_step


def make_eval_step(config, model) -> Callable:
    """(variables, batch) -> dict of partial sums for accuracy/loss meters."""
    smoothing = 0.0  # validation uses plain CE (main.py:328)

    def eval_step(params, batch_stats, batch):
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"],
            training=False,
        )
        if isinstance(logits, (list, tuple)):
            logits = logits[-1]  # main.py:347-357: last output scores
        labels = batch["label"]
        valid = batch.get("valid")
        if valid is None:
            valid = jnp.ones_like(labels, jnp.bool_)
        target = jax.nn.one_hot(labels, logits.shape[-1])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        per_sample = -(target * logp).sum(-1)
        top = jnp.argsort(-logits, axis=-1)[:, :5]
        correct1 = ((top[:, 0] == labels) & valid).sum()
        correct5 = ((top == labels[:, None]).any(-1) & valid).sum()
        return {
            "loss_sum": (per_sample * valid).sum(),
            "top1": correct1,
            "top5": correct5,
            "count": valid.sum(),
        }

    return eval_step


def pad_batch_to_size(batch: dict, rows: int) -> dict:
    """Pad a partial batch to a FIXED ``rows`` count with a validity mask so
    metrics ignore the padding. Padding every batch to one fixed shape keeps
    eval at a single XLA executable per run — padding the tail batch only to
    the mesh multiple gives it its own shape and a second compile."""
    n = batch["label"].shape[0]
    import numpy as np

    valid = batch.get("valid")
    if valid is None:
        valid = np.ones((n,), bool)
    if n == rows:
        return {**batch, "valid": valid}
    assert n < rows, f"batch rows {n} > pad target {rows}"
    pad = rows - n
    out = {}
    for k, v in {**batch, "valid": valid}.items():
        reps = np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
        if k == "valid":
            reps[n:] = False
        out[k] = reps
    return out


def pad_batch_to_multiple(batch: dict, multiple: int) -> dict:
    """Pad a partial batch up to the next ``multiple`` of rows (mesh
    divisibility). Prefer :func:`pad_batch_to_size` with a fixed target in
    eval loops (one executable per run)."""
    n = batch["label"].shape[0]
    rows = -(-n // multiple) * multiple
    return pad_batch_to_size(batch, rows)


def throughput(
    model, variables, images, warmup: int = 50, iters: int = 30
) -> float:
    """Images/sec, reference benchmark semantics (``main.py:387-414``)."""
    fwd = jax.jit(lambda v, x: model.apply(v, x, training=False))
    for _ in range(warmup):
        jax.block_until_ready(fwd(variables, images))  # list when aux heads on
    t1 = time.time()
    for _ in range(iters):
        out = fwd(variables, images)
    jax.block_until_ready(out)
    t2 = time.time()
    return iters * images.shape[0] / (t2 - t1)
