"""Batched Lloyd k-means on device.

Replaces the host-side sklearn KMeans codebook init
(/root/reference/model/dino_pqgo.py:348-355) and the faiss GPU k-means
of dino_new_vq.py:128-149 / dino_ema.py:91-99: the assignment step is
the same pairwise-L2 matmul + argmin as the PQ kernel, so it runs on the
MXU; the update step is a one-hot matmul mean.  Vectorized over M
independent subspaces (a leading batch axis), which sklearn cannot do.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _assign(x: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """x: (M, n, d), centroids: (M, K, d) -> (M, n) argmin indices."""
    x_sq = jnp.sum(x * x, axis=-1)[..., None]
    c_sq = jnp.sum(centroids * centroids, axis=-1)[:, None, :]
    cross = jnp.einsum("mnd,mkd->mnk", x, centroids,
                       preferred_element_type=jnp.float32,
                       precision="highest")
    d2 = x_sq + c_sq - 2.0 * cross
    return jnp.argmin(d2, axis=-1)


def kmeans_plus_plus_init(key: jax.Array, x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-means++ seeding (sklearn init='k-means++' analogue), batched.

    x: (M, n, d) -> (M, k, d).  D^2-weighted sampling via the Gumbel-max
    trick on log-probabilities.
    """
    M, n, d = x.shape

    def body(carry, key_i):
        centroids, count = carry                        # (M, k, d), scalar
        d2 = (
            jnp.sum(x * x, -1)[..., None]
            + jnp.sum(centroids * centroids, -1)[:, None, :]
            - 2.0 * jnp.einsum("mnd,mkd->mnk", x, centroids,
                               preferred_element_type=jnp.float32)
        )                                               # (M, n, k)
        # distance to nearest chosen centroid; unchosen slots masked out
        mask = jnp.arange(k)[None, None, :] < count
        d2 = jnp.where(mask, d2, jnp.inf)
        min_d2 = jnp.maximum(jnp.min(d2, axis=-1), 0.0)  # (M, n)
        logits = jnp.log(min_d2 + 1e-12)
        g = jax.random.gumbel(key_i, logits.shape)
        pick = jnp.argmax(logits + g, axis=-1)           # (M,)
        new_c = jnp.take_along_axis(x, pick[:, None, None].repeat(d, -1),
                                    axis=1)[:, 0]        # (M, d)
        centroids = jax.lax.dynamic_update_index_in_dim(
            centroids, new_c, count, axis=1)
        return (centroids, count + 1), None

    k0 = jax.random.randint(key, (M,), 0, n)
    first = jnp.take_along_axis(x, k0[:, None, None].repeat(d, -1), axis=1)
    centroids = jnp.zeros((M, k, d), x.dtype)
    centroids = centroids.at[:, 0].set(first[:, 0])
    keys = jax.random.split(jax.random.fold_in(key, 1), k - 1)
    (centroids, _), _ = jax.lax.scan(body, (centroids, 1), keys)
    return centroids


@functools.partial(jax.jit, static_argnames=("k", "n_iters", "plus_plus"))
def kmeans(
    key: jax.Array,
    x: jnp.ndarray,                # (n, d) or (M, n, d)
    k: int,
    n_iters: int = 25,
    plus_plus: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (centroids, assignments).  Dead clusters keep their
    previous centroid (standard Lloyd behavior for empty cells)."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    M, n, d = x.shape
    x = x.astype(jnp.float32)

    if plus_plus:
        centroids = kmeans_plus_plus_init(key, x, k)
    else:
        idx = jax.random.choice(key, n, (M, k), replace=False)
        centroids = jnp.take_along_axis(x, idx[..., None].repeat(d, -1), axis=1)

    def step(centroids, _):
        assign = _assign(x, centroids)                  # (M, n)
        one_hot = jax.nn.one_hot(assign, k, dtype=jnp.float32)
        counts = jnp.sum(one_hot, axis=1)               # (M, k)
        sums = jnp.einsum("mnk,mnd->mkd", one_hot, x,
                          preferred_element_type=jnp.float32)
        new_c = sums / jnp.maximum(counts, 1.0)[..., None]
        new_c = jnp.where((counts > 0)[..., None], new_c, centroids)
        return new_c, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=n_iters)
    assign = _assign(x, centroids)
    if squeeze:
        return centroids[0], assign[0]
    return centroids, assign
