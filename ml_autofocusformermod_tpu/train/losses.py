"""Classification losses + on-device mixup/cutmix.

Replaces timm's ``SoftTargetCrossEntropy`` / ``LabelSmoothingCrossEntropy``
(reference ``main.py:127-131``) and timm ``Mixup`` (``data/build.py:58-64``)
with pure-JAX equivalents that run on device inside the jitted train step —
no host-side augmentation pass.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "cross_entropy",
    "soft_target_cross_entropy",
    "smooth_one_hot",
    "mixup_cutmix",
]


def smooth_one_hot(labels: jax.Array, num_classes: int, smoothing: float):
    """timm ``mixup_target`` smoothing: on = 1-s+s/C, off = s/C."""
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def cross_entropy(
    logits: jax.Array, labels: jax.Array, smoothing: float = 0.0
) -> jax.Array:
    """Label-smoothing CE over integer labels (mean over batch)."""
    target = smooth_one_hot(labels, logits.shape[-1], smoothing)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -(target * logp).sum(-1).mean()


def soft_target_cross_entropy(logits: jax.Array, target: jax.Array) -> jax.Array:
    """CE against soft targets (timm SoftTargetCrossEntropy)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -(target.astype(jnp.float32) * logp).sum(-1).mean()


def _rand_bbox(rng, h: int, w: int, lam):
    """timm cutmix box: cut ratio sqrt(1-lam), clipped to the image."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    rng_y, rng_x = jax.random.split(rng)
    cy = jax.random.randint(rng_y, (), 0, h)
    cx = jax.random.randint(rng_x, (), 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    return y1, y2, x1, x2


def mixup_cutmix(
    rng: jax.Array,
    images: jax.Array,  # b x h x w x c
    labels: jax.Array,  # b (int)
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    prob: float = 1.0,
    switch_prob: float = 0.5,
    smoothing: float = 0.1,
) -> Tuple[jax.Array, jax.Array]:
    """Batch-mode mixup/cutmix (timm ``Mixup(mode='batch')`` semantics).

    Mixes each image with its batch-flip partner using one lambda per batch;
    when both alphas are on, flips a coin between mixup and cutmix. Returns
    mixed images and soft targets (already label-smoothed).
    """
    b, h, w, _ = images.shape
    use_mix = mixup_alpha > 0.0
    use_cut = cutmix_alpha > 0.0
    if not use_mix and not use_cut:
        return images, smooth_one_hot(labels, num_classes, smoothing)

    r_apply, r_switch, r_lam, r_box = jax.random.split(rng, 4)
    apply = jax.random.bernoulli(r_apply, prob)
    if use_mix and use_cut:
        do_cut = jax.random.bernoulli(r_switch, switch_prob)
    else:
        do_cut = jnp.asarray(use_cut)

    alpha_mix = mixup_alpha if use_mix else 1.0
    alpha_cut = cutmix_alpha if use_cut else 1.0
    lam_mix = jax.random.beta(r_lam, alpha_mix, alpha_mix)
    lam_cut = jax.random.beta(r_lam, alpha_cut, alpha_cut)

    flipped = images[::-1]

    # mixup branch
    lam_m = jnp.where(apply, lam_mix, 1.0)
    mixed_mix = images * lam_m + flipped * (1.0 - lam_m)

    # cutmix branch: paste flipped box, lambda = 1 - box_area/area
    y1, y2, x1, x2 = _rand_bbox(r_box, h, w, jnp.where(apply, lam_cut, 1.0))
    yy = jnp.arange(h)[None, :, None, None]
    xx = jnp.arange(w)[None, None, :, None]
    in_box = (yy >= y1) & (yy < y2) & (xx >= x1) & (xx < x2)
    in_box = in_box & apply
    mixed_cut = jnp.where(in_box, flipped, images)
    lam_c = 1.0 - ((y2 - y1) * (x2 - x1) / (h * w)).astype(jnp.float32)

    mixed = jnp.where(do_cut, mixed_cut, mixed_mix)
    lam = jnp.where(do_cut, lam_c, lam_m).astype(jnp.float32)

    t1 = smooth_one_hot(labels, num_classes, smoothing)
    t2 = t1[::-1]
    target = t1 * lam + t2 * (1.0 - lam)
    return mixed.astype(images.dtype), target
