"""Pipeline parallelism (`parallel/pp.py`): GPipe executor vs the
sequential chain — forward and gradients, alone and composed with data
parallelism. The reference has no PP (SURVEY.md §2.5); these tests pin
the framework's beyond-reference pipeline executor on the 8-device CPU
mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ml_autofocusformermod_tpu.parallel.pp import (
    make_pipe_mesh,
    pipeline_blocks,
    sequential_blocks,
    stack_block_params,
)


def _block(params, x, *consts):
    w, bias = params
    y = jnp.tanh(x @ w + bias)
    for c in consts:
        y = y + c
    return x + y


def _make_params(rng, n_blocks, dim):
    keys = jax.random.split(rng, n_blocks)
    return stack_block_params(
        [
            (
                jax.random.normal(k, (dim, dim), jnp.float32) * 0.3,
                jax.random.normal(k, (dim,), jnp.float32) * 0.1,
            )
            for k in keys
        ]
    )


@pytest.mark.parametrize("n_micro", [4, 8])
def test_pipeline_matches_sequential(n_micro):
    dim, batch, n_blocks, pipe = 16, 32, 8, 4
    rng = jax.random.PRNGKey(0)
    params = _make_params(rng, n_blocks, dim)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, dim), jnp.float32)

    mesh = make_pipe_mesh(pipe, data=len(jax.devices()) // pipe)
    ref = sequential_blocks(_block, params, x)
    got = jax.jit(
        lambda p, x: pipeline_blocks(
            _block, p, x, mesh=mesh, num_microbatches=n_micro
        )
    )(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_pipeline_consts_and_data_axis():
    """Per-example consts are microbatched; batch axis composes with DP."""
    dim, batch, n_blocks, pipe = 8, 16, 4, 4
    data = len(jax.devices()) // pipe
    params = _make_params(jax.random.PRNGKey(2), n_blocks, dim)
    x = jax.random.normal(jax.random.PRNGKey(3), (batch, dim), jnp.float32)
    c = jax.random.normal(jax.random.PRNGKey(4), (batch, dim), jnp.float32)

    mesh = make_pipe_mesh(pipe, data=data)
    ref = sequential_blocks(_block, params, x, consts=(c,))
    got = jax.jit(
        lambda p, x, c: pipeline_blocks(
            _block,
            p,
            x,
            consts=(c,),
            mesh=mesh,
            num_microbatches=4,
            batch_spec=P("data"),
        )
    )(params, x, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_pipeline_gradients():
    """AD through the schedule = reverse pipeline; grads match sequential."""
    dim, batch, n_blocks, pipe = 8, 16, 8, 4
    params = _make_params(jax.random.PRNGKey(5), n_blocks, dim)
    x = jax.random.normal(jax.random.PRNGKey(6), (batch, dim), jnp.float32)
    mesh = make_pipe_mesh(pipe, data=len(jax.devices()) // pipe)

    def loss_seq(p, x):
        return jnp.sum(sequential_blocks(_block, p, x) ** 2)

    def loss_pipe(p, x):
        return jnp.sum(
            pipeline_blocks(_block, p, x, mesh=mesh, num_microbatches=8) ** 2
        )

    g_ref = jax.grad(loss_seq)(params, x)
    g_got = jax.jit(jax.grad(loss_pipe))(params, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4
        )


def test_pipeline_rejects_bad_shapes():
    params = _make_params(jax.random.PRNGKey(7), 6, 4)
    x = jnp.zeros((8, 4))
    mesh = make_pipe_mesh(4, data=len(jax.devices()) // 4)
    with pytest.raises(AssertionError):
        # 6 blocks over 4 stages
        pipeline_blocks(_block, params, x, mesh=mesh, num_microbatches=4)
    with pytest.raises(AssertionError):
        # batch 8 not divisible into 3 microbatches
        pipeline_blocks(
            _block,
            _make_params(jax.random.PRNGKey(8), 8, 4),
            x,
            mesh=mesh,
            num_microbatches=3,
        )
