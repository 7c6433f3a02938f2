"""Upsampling-ratio curriculum for the MaskFiner family.

The reference anneals every backbone's ``upscale_ratio`` from 1.0 to its
configured final value linearly over training, mutating module attributes
each epoch (``main.py:231-235,472-476``) — and crashes for ``aff`` models,
which have no such attribute (SURVEY.md L5 caveat). Here:

* the curriculum only applies to models exposing
  ``final_upsampling_ratios`` (the MaskFiner wrappers),
* ratios are quantized so the number of distinct compiled programs is
  bounded (each ratio changes static token counts => one XLA program per
  quantized value; the reference recompiles nothing but pays dynamic-shape
  costs everywhere instead).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

__all__ = ["get_upsample_ratio", "epoch_upsample_ratios", "applies_to"]


def get_upsample_ratio(
    final_ratio: float, n_epochs: int, curr_epoch: int
) -> float:
    """Linear 1.0 -> final anneal (reference ``main.py:472-476``)."""
    start = 1.0
    progress = curr_epoch / n_epochs
    return start + (final_ratio - start) * progress


def quantize(ratio: float, levels: int) -> float:
    """Snap a ratio to a 1/levels lattice to bound recompiles."""
    if levels <= 0:
        return ratio
    return round(ratio * levels) / levels


def epoch_upsample_ratios(
    final_ratios: Sequence[float],
    n_epochs: int,
    epoch: int,
    quantize_levels: int = 20,
) -> List[float]:
    """Per-backbone annealed (and quantized) ratios for this epoch."""
    out = []
    for r in final_ratios:
        if r == 0.0:
            out.append(0.0)  # non-upsampling levels stay off
            continue
        out.append(quantize(get_upsample_ratio(r, n_epochs, epoch), quantize_levels))
    return out


def applies_to(model) -> bool:
    """True for models with an upsampling curriculum (MaskFiner wrappers).
    The reference unconditionally dereferences ``final_upsampling_ratios``
    and crashes for AFF (``main.py:231``); this guard is the fix."""
    return hasattr(model, "final_upsampling_ratios")
