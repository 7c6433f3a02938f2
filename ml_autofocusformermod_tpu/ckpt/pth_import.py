"""Import reference torch ``.pth`` checkpoints into our Flax variable tree.

The module tree deliberately mirrors the reference's torch module names
(see :mod:`..models.layers`), so the mapping is mechanical:

======================  =========================================
ours (flax path)        reference (torch state_dict key)
======================  =========================================
``layers_{i}``           ``layers.{i}``
``blocks_{j}``           ``blocks.{j}``
``weight_net_fc``        ``weight_net.0`` (Dense)
``weight_net_norm``      ``weight_net.1`` (LayerNorm)
``X/kernel`` (2-D)       ``X.weight`` transposed (out,in)->(in,out)
``X/kernel`` (4-D conv)  ``X.weight`` OIHW -> HWIO
``X/scale`` (LN/BN)      ``X.weight``
``batch_stats .../mean`` ``....running_mean`` (ditto var)
======================  =========================================

Loading is ``strict=False`` like the reference (``utils.py:31``): published
Apple checkpoints load into variant configs; missing/unexpected keys are
reported, not fatal.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import numpy as np

__all__ = ["load_pth_state_dict", "import_torch_state_dict"]


def load_pth_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file to numpy arrays (CPU, no grad state).

    Accepts both a bare ``state_dict`` and the reference trainer's wrapper
    ``{'model': state_dict, ...}`` (``utils.py:58-69``).  ``https://`` URLs
    are downloaded to a local cache first, mirroring the reference's
    ``torch.hub.load_state_dict_from_url`` path (``utils.py:21-23``) —
    that is how the published Apple checkpoints are referenced in configs.
    """
    import torch

    if path.startswith(("http://", "https://")):
        import os
        import urllib.request

        cache = os.path.join(
            os.path.expanduser("~"), ".cache", "mlaff_checkpoints"
        )
        os.makedirs(cache, exist_ok=True)
        local = os.path.join(cache, os.path.basename(path.split("?")[0]))
        if not os.path.exists(local):
            urllib.request.urlretrieve(path, local)
        path = local

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    return {k: v.detach().numpy() for k, v in ckpt.items()}


_SEG_MAP = {
    "weight_net_fc": "weight_net.0",
    "weight_net_norm": "weight_net.1",
}

# flax module names that flatten a nested torch container
_SEG_REGEX = [
    # MixResViT: TransformerLayer wrapper 'layers' holding 'blocks' list
    (r"layers_blocks_(\d+)", r"layers.blocks.\1"),
]


import re


def _torch_key(path: Tuple[str, ...]) -> str:
    """Translate a flax variable path to the reference torch key."""
    import re

    segs: List[str] = []
    for seg in path[:-1]:
        if seg in _SEG_MAP:
            segs.append(_SEG_MAP[seg])
            continue
        matched = False
        for pat, repl in _SEG_REGEX:
            m = re.fullmatch(pat, seg)
            if m:
                segs.append(m.expand(repl))
                matched = True
                break
        if matched:
            continue
        # list-module segments: layers_3 -> layers.3, backbones_0 ->
        # backbones.0, conv_layers_1 -> conv_layers.1, heads_2 -> heads.2 ...
        # (scalar names like norm1/fc2 have no underscore before the digit)
        m = re.fullmatch(r"(.+)_(\d+)", seg)
        if m:
            segs.append(f"{m.group(1)}.{m.group(2)}")
        else:
            segs.append(seg)
    leaf = path[-1]
    leaf_map = {
        "kernel": "weight",
        "scale": "weight",
        "bias": "bias",
        "mean": "running_mean",
        "var": "running_var",
    }
    segs.append(leaf_map.get(leaf, leaf))
    return ".".join(segs)


def import_torch_state_dict(
    variables: Dict[str, Any],
    state_dict: Dict[str, np.ndarray],
) -> Tuple[Dict[str, Any], List[str], List[str]]:
    """Fill our variable tree from a reference state_dict (strict=False).

    Args:
        variables: flax variables ``{'params': ..., 'batch_stats': ...}``
            from ``model.init`` (shapes/dtypes define the target).
        state_dict: torch name -> numpy array.

    Returns:
        ``(new_variables, missing_keys, unexpected_keys)`` — missing = ours
        without a torch match; unexpected = torch keys never consumed.
    """
    consumed = set()

    def fill(path, leaf):
        # drop the collection name ('params' / 'batch_stats') from the path
        segs = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )[1:]
        key = _torch_key(segs)
        if key not in state_dict:
            missing.append("/".join(segs))
            return leaf
        consumed.add(key)
        src = np.asarray(state_dict[key])
        if segs[-1] == "kernel":
            if src.ndim == 4:  # conv OIHW -> HWIO
                src = src.transpose(2, 3, 1, 0)
            elif src.ndim == 2:  # linear (out,in) -> (in,out)
                src = src.T
        if src.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for {key}: torch {src.shape} vs ours {leaf.shape}"
            )
        return src.astype(np.asarray(leaf).dtype)

    missing: List[str] = []
    new_vars = jax.tree_util.tree_map_with_path(fill, variables)
    unexpected = [
        k
        for k in state_dict
        if k not in consumed and not k.endswith("num_batches_tracked")
    ]
    return new_vars, missing, unexpected
