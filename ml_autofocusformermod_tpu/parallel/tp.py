"""Tensor-parallel parameter partitioning over the mesh ``model`` axis.

The reference scales with data parallelism only (SURVEY §2.5; DDP at
``main.py:102``).  On TPU the mesh carries a ``model`` axis from day one
(``parallel/mesh.py``), and this module populates it: a rule-based,
Megatron-style partitioner that maps parameter key-paths to
``PartitionSpec``s and lets XLA's SPMD partitioner propagate the layout
through the network, inserting the collectives over ICI.

The channel layouts make head-sharding exact:

* ``ClusterAttention`` projects token-major ``q (c,c)`` / fused
  ``kv (c,2c)`` whose columns decompose head-major — ``q`` as
  ``(head, c_)`` and ``kv`` as ``(head, 2, c_)`` (``models/layers.py``,
  the ``reshape(b, n, h, [2,] c_)`` views).  Column-sharding either kernel
  over ``model`` therefore assigns *whole heads* to shards when
  ``tp | h``, with no resharding inside the attention body.
* the per-head rel-pos bias ``pos_embed (5,h)``, its bias ``(h,)``, and
  the blank-token vectors ``blank_k/blank_v (c,)`` shard on the same head
  axis, so the bias add, blank-slot logits, and softmax all stay local.
* ``proj`` and ``mlp.fc2`` are row-parallel (input-sharded): their matmul
  contracts the sharded axis and XLA emits one all-reduce per residual
  branch — the Megatron f/g pattern.
* ``mlp.fc1`` is column-parallel; the depthwise conv inside MixResViT's
  ``FeedForward`` is per-channel and shards with it.

Anything without a matching rule (norms, patch embeds, merging nets,
heads, BatchNorm stats, optimizer scalars) is replicated.  A rule is
dropped per-leaf when the sharded dimension is not divisible by the
``model`` axis size, so odd configs degrade to replication instead of
failing.

Optimizer / EMA state shards for free: optax and EMA trees mirror the
param tree, so the same key-path suffixes match (``.../mu/.../q/kernel``),
giving ZeRO-like partitioning of the moments along the tensor-parallel
axis without extra bookkeeping.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

__all__ = [
    "spec_for_path",
    "tree_specs",
    "tree_shardings",
    "shard_tree",
]

# (key-path suffix regex, PartitionSpec). First match wins. Paths are
# normalized to "a/b/c" with flax collection prefixes kept, e.g.
# "params/layers_0/blocks_0/attn/q/kernel".
_RULES = (
    # attention projections: column-parallel = whole heads per shard
    (re.compile(r"attn/(q|kv|qkv)/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r"attn/(q|kv|qkv)/bias$"), P(MODEL_AXIS)),
    # per-head rel-pos bias head and blank token (head-major layout)
    (re.compile(r"attn/pos_embed/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r"attn/pos_embed/bias$"), P(MODEL_AXIS)),
    (re.compile(r"attn/blank_[kv]$"), P(MODEL_AXIS)),
    # attention output: row-parallel (one all-reduce on the residual)
    (re.compile(r"attn/proj/kernel$"), P(MODEL_AXIS, None)),
    # MLP: column-parallel fc1 (+ its depthwise conv), row-parallel fc2
    (re.compile(r"mlp/fc1/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r"mlp/fc1/bias$"), P(MODEL_AXIS)),
    (re.compile(r"mlp/dwconv/kernel$"), P(None, None, None, MODEL_AXIS)),
    (re.compile(r"mlp/dwconv/bias$"), P(MODEL_AXIS)),
    (re.compile(r"mlp/fc2/kernel$"), P(MODEL_AXIS, None)),
)


def _normalize(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        else:
            parts.append(str(k))
    return "/".join(parts)


def spec_for_path(path: str, shape, tp: int) -> P:
    """PartitionSpec for one leaf; replicated when no rule matches or the
    sharded dim is not divisible by the ``model`` axis size ``tp``."""
    if tp <= 1:
        return P()
    for rx, spec in _RULES:
        if rx.search(path):
            ok = True
            for dim, axis in enumerate(spec):
                if axis == MODEL_AXIS and (
                    dim >= len(shape) or shape[dim] % tp != 0
                ):
                    ok = False
                    break
            return spec if ok else P()
    return P()


def tree_specs(tree: Any, tp: int) -> Any:
    """Map any param-mirroring pytree (params, EMA, optax moments, full
    TrainState) to a pytree of PartitionSpecs."""
    return jax.tree_util.tree_map_with_path(
        lambda p, leaf: spec_for_path(
            _normalize(p), getattr(leaf, "shape", ()), tp
        ),
        tree,
    )


def tree_shardings(mesh: Mesh, tree: Any) -> Any:
    tp = mesh.shape.get(MODEL_AXIS, 1)
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), tree_specs(tree, tp)
    )


def shard_tree(mesh: Mesh, tree: Any) -> Any:
    """Device-put a TrainState / param tree with tensor-parallel layout
    (replicates everything when the model axis is 1)."""
    return jax.device_put(tree, tree_shardings(mesh, tree))
