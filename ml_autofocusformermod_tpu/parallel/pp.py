"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

The reference has **no** pipeline parallelism (SURVEY.md §2.5: DDP over
NCCL is its only strategy, ``utils.py:106-146``, ``main.py:102``), and the
flagship models here do not *enable* PP by default: they are shallow 4-7
stage pyramids with heterogeneous token counts where the DP x TP x SP mesh
already covers every chip layout without bubbles. The framework still
ships a first-class pipeline executor because uniform block chains — the
depth-6 stage-3 trunk of AFF (``aff_transformer.py:608``: all blocks in a
stage share shapes), or a MixResViT level's global-attention blocks — are
exactly the shape PP wants, and at larger-than-reference scale a ``pipe``
axis is the standard way to span slices over DCN while DP/TP/SP ride ICI.

Schedule: GPipe forward with M microbatches over P stages. At step ``t``
stage ``p`` holds microbatch ``t - p``; hand-offs are single-hop
``lax.ppermute`` shifts (neighbour ICI traffic only). The backward pass
falls out of AD through the same schedule — ``ppermute`` transposes to the
reverse shift — i.e. a reverse-order pipeline with the same bubble
fraction ``(P-1)/(M+P-1)``. Numerics are exactly the sequential chain's:
microbatching only splits the batch axis, and every per-block op in this
framework is batch-elementwise.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["PIPE_AXIS", "make_pipe_mesh", "stack_block_params", "pipeline_blocks"]

PIPE_AXIS = "pipe"


def make_pipe_mesh(pipe: int, data: int = 1, devices=None) -> Mesh:
    """A ``(data, pipe)`` mesh. ``pipe`` innermost so stage hand-offs are
    single-hop neighbour transfers on the fastest links."""
    devices = devices if devices is not None else jax.devices()
    assert data * pipe == len(devices), (
        f"mesh {data}x{pipe} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(data, pipe)
    return Mesh(arr, ("data", PIPE_AXIS))


def stack_block_params(params_list: Sequence):
    """Stack per-block param pytrees along a new leading (layer) axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def _shard_map(fn, mesh, in_specs, out_specs):
    # jax>=0.5 exposes shard_map at the top level; keep one call site.
    sm = getattr(jax, "shard_map", None)
    if sm is None:  # pragma: no cover - older jax
        # The experimental module predates the check_vma rename: it only
        # accepts check_rep=.
        from jax.experimental.shard_map import shard_map as sm  # type: ignore

        return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)
    return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
              check_vma=False)


def pipeline_blocks(
    block_fn: Callable,
    stacked_params,
    x: jax.Array,
    consts: Sequence[jax.Array] = (),
    *,
    mesh: Mesh,
    num_microbatches: int,
    axis: str = PIPE_AXIS,
    batch_spec: P = P(),
):
    """Run ``x -> block_fn(params[L-1], ... block_fn(params[0], x, *consts))``
    pipelined over the ``axis`` dimension of ``mesh``.

    Args:
      block_fn: ``(params_i, x_micro, *consts_micro) -> y_micro`` with
        ``y_micro.shape == x_micro.shape`` (a uniform residual chain).
        ``block_fn`` must be **total**: warmup/drain pipeline steps run it
        on zero-initialized (and later stale) states whose outputs are
        discarded by masking — but a block that produces NaN on such
        inputs (e.g. divides by a zero vector norm) contaminates parameter
        gradients through the zero-cotangent*NaN path. Blocks built from
        matmul/eps-guarded-norm/pointwise ops (everything in this
        framework) are total; guard any custom division with an eps.
      stacked_params: pytree whose leaves have leading axis ``L`` (the
        block count, ``stack_block_params``); ``L % pipe_size == 0`` —
        each stage runs a contiguous chunk of ``L // pipe_size`` blocks.
      x: full-batch input, leading axis ``b``; split into
        ``num_microbatches`` equal microbatches.
      consts: extra per-example arrays (leading axis ``b``) shared by all
        blocks (e.g. neighbour indices / masks); microbatched alongside x.
      batch_spec: PartitionSpec for the microbatch's example axis, to
        compose with data parallelism (e.g. ``P('data')`` on a
        ``(data, pipe)`` mesh).

    Returns the full-batch output, bit-identical to the sequential chain.
    """
    nstage = mesh.shape[axis]
    leaves = jax.tree.leaves(stacked_params)
    assert leaves, "stacked_params must be non-empty"
    L = leaves[0].shape[0]
    assert all(l.shape[0] == L for l in leaves), "inconsistent layer axis"
    assert L % nstage == 0, f"{L} blocks not divisible by {nstage} stages"
    b = x.shape[0]
    M = num_microbatches
    assert b % M == 0, f"batch {b} not divisible by {M} microbatches"
    mb = b // M

    def micro(a):
        return a.reshape((M, mb) + a.shape[1:])

    mx = micro(x)
    mc = tuple(micro(c) for c in consts)

    param_specs = jax.tree.map(lambda _: P(axis), stacked_params)
    micro_spec = P(None, *batch_spec)
    const_specs = tuple(micro_spec for _ in mc)

    def per_device(params_local, mx, *mc):
        p = lax.axis_index(axis)
        chunk_len = L // nstage

        def run_chunk(y, consts_t):
            def body(i, y):
                pi = jax.tree.map(
                    lambda a: lax.dynamic_index_in_dim(a, i, keepdims=False),
                    params_local,
                )
                return block_fn(pi, y, *consts_t)

            return lax.fori_loop(0, chunk_len, body, y, unroll=True)

        state = jnp.zeros_like(mx[0])
        out = jnp.zeros_like(mx)
        perm = [(i, (i + 1) % nstage) for i in range(nstage)]

        def step(t, carry):
            state, out = carry
            # stage 0 injects microbatch t (re-injects the last one once the
            # supply runs dry; those outputs are never collected)
            inj = lax.dynamic_index_in_dim(
                mx, jnp.minimum(t, M - 1), keepdims=False
            )
            state = jnp.where(p == 0, inj, state)
            # this stage currently holds microbatch t - p
            ci = jnp.clip(t - p, 0, M - 1)
            consts_t = tuple(
                lax.dynamic_index_in_dim(c, ci, keepdims=False) for c in mc
            )
            y = run_chunk(state, consts_t)
            oi = t - (nstage - 1)
            out = jnp.where(
                (oi >= 0) & (p == nstage - 1),
                lax.dynamic_update_index_in_dim(
                    out, y, jnp.clip(oi, 0, M - 1), 0
                ),
                out,
            )
            state = lax.ppermute(y, axis, perm)
            return state, out

        _, out = lax.fori_loop(0, M + nstage - 2 + 1, step, (state, out))
        # replicate the last stage's collected outputs across the pipe axis
        out = lax.psum(
            jnp.where(p == nstage - 1, out, jnp.zeros_like(out)), axis
        )
        return out

    out = _shard_map(
        per_device,
        mesh,
        in_specs=(param_specs, micro_spec) + const_specs,
        out_specs=micro_spec,
    )(stacked_params, mx, *mc)
    return out.reshape((b,) + out.shape[2:])


def sequential_blocks(block_fn, stacked_params, x, consts=()):
    """Reference semantics for :func:`pipeline_blocks` (no pipelining)."""
    L = jax.tree.leaves(stacked_params)[0].shape[0]

    def body(i, y):
        pi = jax.tree.map(
            lambda a: lax.dynamic_index_in_dim(a, i, keepdims=False),
            stacked_params,
        )
        return block_fn(pi, y, *consts)

    return lax.fori_loop(0, L, body, x, unroll=True)
