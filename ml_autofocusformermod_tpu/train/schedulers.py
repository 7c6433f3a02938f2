"""LR schedules: step-wise cosine / linear / step with warmup.

Faithful ports of the reference's timm-based setup (``lr_scheduler.py:15-114``)
as optax-style ``step -> lr`` callables. Notably timm's ``CosineLRScheduler``
with ``warmup_prefix=False`` (the default the reference uses) runs the cosine
over the *total* step count, warmup steps included.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp

__all__ = ["build_scheduler", "cosine_schedule", "linear_schedule", "step_schedule"]


def cosine_schedule(
    base_lr: float,
    min_lr: float,
    warmup_lr: float,
    warmup_steps: int,
    total_steps: int,
) -> Callable:
    """timm CosineLRScheduler(t_in_epochs=False, cycle_limit=1) semantics."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr + step * (
            (base_lr - warmup_lr) / max(warmup_steps, 1)
        )
        # warmup_prefix=False: cosine over t in [0, total), including warmup
        cos = min_lr + 0.5 * (base_lr - min_lr) * (
            1 + jnp.cos(jnp.pi * step / total_steps)
        )
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def linear_schedule(
    base_lr: float,
    min_lr: float,
    warmup_lr: float,
    warmup_steps: int,
    total_steps: int,
) -> Callable:
    """Reference ``LinearLRScheduler`` (``lr_scheduler.py:65-114``)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr + step * ((base_lr - warmup_lr) / max(warmup_steps, 1))
        t = step - warmup_steps
        total_t = total_steps - warmup_steps
        lin = base_lr - (base_lr - min_lr) * (t / total_t)
        return jnp.where(step < warmup_steps, warm, lin)

    return schedule


def step_schedule(
    base_lr: float,
    warmup_lr: float,
    warmup_steps: int,
    decay_steps: int,
    decay_rate: float,
) -> Callable:
    """timm StepLRScheduler semantics (``lr_scheduler.py:52-60``)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr + step * ((base_lr - warmup_lr) / max(warmup_steps, 1))
        dec = base_lr * decay_rate ** jnp.floor(step / decay_steps)
        return jnp.where(step < warmup_steps, warm, dec)

    return schedule


def build_scheduler(config, n_steps_per_epoch: int) -> Callable:
    """Reference ``build_scheduler`` (``lr_scheduler.py:15-62``): epoch counts
    are converted to optimizer-step counts, divided by accumulation."""
    accum = max(config.TRAIN.ACCUMULATION_STEPS, 1)
    steps = n_steps_per_epoch // accum if accum > 1 else n_steps_per_epoch
    total = config.TRAIN.EPOCHS * steps
    warmup = config.TRAIN.WARMUP_EPOCHS * steps
    name = config.TRAIN.LR_SCHEDULER.NAME
    if name == "cosine":
        return cosine_schedule(
            config.TRAIN.BASE_LR, config.TRAIN.MIN_LR, config.TRAIN.WARMUP_LR,
            warmup, total,
        )
    if name == "linear":
        return linear_schedule(
            config.TRAIN.BASE_LR, config.TRAIN.MIN_LR, config.TRAIN.WARMUP_LR,
            warmup, total,
        )
    if name == "step":
        return step_schedule(
            config.TRAIN.BASE_LR, config.TRAIN.WARMUP_LR, warmup,
            config.TRAIN.LR_SCHEDULER.DECAY_EPOCHS * steps,
            config.TRAIN.LR_SCHEDULER.DECAY_RATE,
        )
    raise NotImplementedError(f"Unknown scheduler: {name}")
