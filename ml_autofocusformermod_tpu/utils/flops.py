"""Model complexity reporting: XLA cost analysis instead of ptflops.

The reference prints MACs via ptflops on a deep-copied model at startup
(``main.py:108-111``). Here the *compiled* forward's own cost analysis is
the source of truth — it reflects the program that actually runs, including
the clustering/top-k machinery ptflops cannot see.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["count_params", "model_complexity"]


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def model_complexity(
    model, variables, img_size: int, batch: int = 1
) -> Dict[str, float]:
    """Compile the forward pass and return XLA's cost analysis.

    Returns a dict with ``flops`` (per image), ``bytes_accessed`` (per
    image), and ``params``.
    """
    x = jnp.zeros((batch, img_size, img_size, 3))
    lowered = jax.jit(
        lambda v, x: model.apply(v, x, training=False)
    ).lower(variables, x)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", float("nan"))) / batch
    bytes_accessed = float(cost.get("bytes accessed", float("nan"))) / batch
    # peak device memory of the compiled program (the reference has no
    # equivalent; torch reports allocator highwater at runtime instead)
    peak_bytes = float("nan")
    try:
        mem = compiled.memory_analysis()
        sizes = [
            getattr(mem, k, None)
            for k in (
                "temp_size_in_bytes",
                "argument_size_in_bytes",
                "output_size_in_bytes",
            )
        ]
        # stay NaN unless the backend really reports the numbers (some
        # PJRT backends return None / a stub object instead of raising)
        if all(isinstance(s, (int, float)) for s in sizes):
            alias = getattr(mem, "alias_size_in_bytes", 0) or 0
            peak_bytes = float(sum(sizes) - alias)
    except Exception:  # noqa: BLE001 — backend-optional API
        pass
    return {
        "flops": flops,
        "bytes_accessed": bytes_accessed,
        "peak_bytes": peak_bytes,
        "params": count_params(variables.get("params", variables)),
    }
