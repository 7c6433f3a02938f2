"""kNN op: brute-force parity + exactness on integer grids."""

import jax.numpy as jnp
import numpy as np

from ml_autofocusformermod_tpu.ops import knn


def brute_force_knn(query, database, k):
    dist = np.sqrt(((query[:, :, None] - database[:, None]) ** 2).sum(-1))
    idx = np.argsort(dist, axis=2, kind="stable")[:, :, :k]
    return idx, np.take_along_axis(dist, idx, 2)


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    b, nq, nd, c, k = 3, 64, 40, 2, 5
    q = rng.integers(0, 100, (b, nq, c)).astype(np.float32)
    d = rng.integers(0, 100, (b, nd, c)).astype(np.float32)
    idx, dist = knn(jnp.asarray(q), jnp.asarray(d), k, return_dist=True)
    ref_idx, ref_dist = brute_force_knn(q, d, k)
    # distances must match exactly-ranked reference distances
    np.testing.assert_allclose(np.asarray(dist), ref_dist, atol=1e-4)
    # indices must agree wherever distances are unique
    unique = ref_dist[:, :, :-1] != ref_dist[:, :, 1:]
    first_unique = np.ones_like(ref_idx[..., :1], bool)
    np.testing.assert_array_equal(
        np.asarray(idx)[np.concatenate([first_unique, unique], 2)],
        ref_idx[np.concatenate([first_unique, unique], 2)],
    )


def test_knn_self_query_returns_self_first():
    """d(q, q) = 0 must rank self first — exact integer arithmetic on TPU path."""
    rng = np.random.default_rng(1)
    b, n = 2, 128
    pos = np.stack([rng.permutation(4096)[:n] for _ in range(b)])
    pos = np.stack([pos % 64, pos // 64], axis=2).astype(np.float32)
    idx, dist = knn(jnp.asarray(pos), jnp.asarray(pos), 2, return_dist=True)
    np.testing.assert_array_equal(
        np.asarray(idx)[:, :, 0], np.arange(n)[None].repeat(b, 0)
    )
    np.testing.assert_array_equal(np.asarray(dist)[:, :, 0], 0.0)
    assert (np.asarray(dist)[:, :, 1] > 0).all()


def test_knn_no_gradient():
    import jax

    q = jnp.ones((1, 4, 2))
    d = jnp.ones((1, 8, 2))

    def f(q):
        _, dist = knn(q, d, 2, return_dist=True)
        return dist.sum()

    g = jax.grad(f)(q)
    np.testing.assert_array_equal(np.asarray(g), 0.0)
