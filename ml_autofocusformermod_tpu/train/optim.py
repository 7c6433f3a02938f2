"""Optimizer factory: AdamW / SGD with automatic no-weight-decay grouping.

Port of reference ``optimizer.py:11-58``: parameters with <= 1 dimension
(biases, norm scales, blank tokens, layer-scale gammas) get weight decay 0
— exactly the reference's ``len(param.shape) == 1 or name.endswith('.bias')``
rule expressed structurally. Gradient clipping by global norm (reference
``utils.py:183-186``, clip 5.0) is folded into the chain.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax

__all__ = ["build_optimizer", "no_weight_decay_mask"]


def no_weight_decay_mask(params) -> dict:
    """True where weight decay applies (rank >= 2 kernels only)."""
    return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)


def build_optimizer(
    config, schedule: Callable, params_example=None
) -> optax.GradientTransformation:
    """Build the optax chain from ``config.TRAIN.OPTIMIZER`` + clip + accum."""
    name = config.TRAIN.OPTIMIZER.NAME.lower()
    wd = config.TRAIN.WEIGHT_DECAY
    clip = config.TRAIN.CLIP_GRAD

    if name == "adamw":
        opt = optax.adamw(
            learning_rate=schedule,
            b1=config.TRAIN.OPTIMIZER.BETAS[0],
            b2=config.TRAIN.OPTIMIZER.BETAS[1],
            eps=config.TRAIN.OPTIMIZER.EPS,
            weight_decay=wd,
            mask=no_weight_decay_mask,
        )
    elif name == "sgd":
        opt = optax.chain(
            optax.add_decayed_weights(wd, mask=no_weight_decay_mask),
            optax.sgd(
                learning_rate=schedule,
                momentum=config.TRAIN.OPTIMIZER.MOMENTUM,
                nesterov=True,
            ),
        )
    else:
        raise NotImplementedError(f"Unknown optimizer: {name}")

    chain = [optax.clip_by_global_norm(clip)] if clip and clip > 0 else []
    chain.append(opt)
    tx = optax.chain(*chain)

    accum = config.TRAIN.ACCUMULATION_STEPS
    if accum and accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def scale_base_lr(config, world_batch: int) -> None:
    """Linear LR scaling rule (reference ``main.py:437-449``): lr * total_batch/512,
    with accumulation folded into the effective batch. Mutates a defrosted config."""
    accum = max(config.TRAIN.ACCUMULATION_STEPS, 1)
    factor = world_batch * accum / 512.0
    config.TRAIN.BASE_LR = config.TRAIN.BASE_LR * factor
    config.TRAIN.WARMUP_LR = config.TRAIN.WARMUP_LR * factor
    config.TRAIN.MIN_LR = config.TRAIN.MIN_LR * factor
