"""Shared bench helpers.

``host_init`` builds a model variable tree WITHOUT running the model on
the device: a device ``model.init`` eagerly executes the whole forward
through the tunneled chip (and with a fresh MLAFF_* flag combination it
remote-compiles the graph again — ~9.5 min for MaskFiner-UD, minutes for
the AFF presets), while parameter *values* are irrelevant to throughput
timing. ``jax.eval_shape`` gives the tree abstractly; leaves are filled
host-side (abs-normal so BatchNorm variances stay positive / logits stay
finite) and shipped with one ``device_put``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def host_init(model, rngs, *sample_args, **sample_kwargs):
    """Variable tree for ``model.init(rngs, *args, **kwargs)`` built on host."""
    # kwargs (e.g. ``training``) stay static — eval_shape would trace them
    shapes = jax.eval_shape(
        lambda r, *a: model.init(r, *a, **sample_kwargs),
        rngs, *sample_args,
    )
    rng = np.random.default_rng(0)

    def leaf(s):
        if jnp.issubdtype(s.dtype, jnp.floating):
            arr = np.abs(rng.standard_normal(s.shape)) * 0.02
            return jnp.asarray(arr.astype(jax.dtypes.canonicalize_dtype(s.dtype)))
        return jnp.zeros(s.shape, s.dtype)

    return jax.device_put(jax.tree_util.tree_map(leaf, shapes))
