"""Jitted k-means++ / Lloyd clustering — the PQ codebook trainer.

TPU-native replacement for the reference's `ProductQuantization.compute`
(k-means++ per subspace, UNWEIGHTED centroid updates, parallel pools —
call site JVectorIndexQuantization.java:114-140). Here the per-subspace
parallelism is a `vmap` and the per-point parallelism is batched matmuls on
the MXU; no thread pools.

UNWEIGHTED == plain arithmetic-mean centroid update (no point weights).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from opensearch_jvector_tpu.ops.distances import pairwise_sqdist


def _kmeanspp_init(x: jax.Array, k: int, key: jax.Array) -> jax.Array:
    """k-means++ seeding: [n, d] -> [k, d].

    Sequential by nature (each new seed depends on current min distances);
    the O(n) distance update per step is the vectorized part.
    """
    n = x.shape[0]

    k0, key = jax.random.split(key)
    first = x[jax.random.randint(k0, (), 0, n)]
    centroids0 = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(first)
    mind0 = pairwise_sqdist(first[None, :], x)[0]

    def step(i, state):
        centroids, mind, key = state
        key, sub = jax.random.split(key)
        # Sample proportional to min squared distance (Gumbel-max on logs).
        logits = jnp.log(jnp.maximum(mind, 1e-30))
        g = jax.random.gumbel(sub, (n,), dtype=logits.dtype)
        idx = jnp.argmax(logits + g)
        c = x[idx]
        centroids = centroids.at[i].set(c)
        mind = jnp.minimum(mind, pairwise_sqdist(c[None, :], x)[0])
        return centroids, mind, key

    centroids, _, _ = jax.lax.fori_loop(1, k, step, (centroids0, mind0, key))
    return centroids


def _lloyd_iter(x: jax.Array, centroids: jax.Array) -> jax.Array:
    """One Lloyd step: assign to nearest centroid, recompute means.

    Centroid update as one-hot matmul so the reduction runs on the MXU.
    Empty clusters keep their previous centroid.
    """
    k = centroids.shape[0]
    d2 = pairwise_sqdist(x, centroids)  # [n, k]
    assign = jnp.argmin(d2, axis=1)
    onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)  # [n, k]
    sums = jax.lax.dot_general(
        onehot,
        x.astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [k, d]
    counts = jnp.sum(onehot, axis=0)  # [k]
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    return jnp.where((counts > 0)[:, None], means, centroids).astype(x.dtype)


def _train_one(x: jax.Array, k: int, iters: int, key: jax.Array) -> jax.Array:
    centroids = _kmeanspp_init(x, k, key)
    return jax.lax.fori_loop(0, iters, lambda _, c: _lloyd_iter(x, c), centroids)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def train_kmeans(
    x: jax.Array, k: int, iters: int = 8, key: jax.Array | None = None
) -> jax.Array:
    """Train k centroids over x [n, d] -> [k, d] (k-means++ init + Lloyd)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    return _train_one(x, k, iters, key)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def train_kmeans_subspaces(
    x_sub: jax.Array, k: int, iters: int = 8, key: jax.Array | None = None
) -> jax.Array:
    """Per-subspace codebook training: [M, n, dsub] -> [M, k, dsub].

    The per-subspace parallelism of the reference's pool-submitted training
    becomes a vmap over the leading axis.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, x_sub.shape[0])
    return jax.vmap(lambda xs, kk: _train_one(xs, k, iters, kk))(x_sub, keys)
