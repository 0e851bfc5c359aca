"""K-means on TPU: blocked matmul assignment + segment-sum updates.

Replaces the reference's faiss GPU clustering
(``src/contrastor/utils.py:28-71``): distances via one MXU matmul per
iteration (||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2, argmin over centroids),
centroid update via ``segment_sum``. Everything jits with static shapes;
empty clusters keep their previous centroid (faiss redistributes — with
nredo>1 and random init the practical behavior matches).

Also provides the phi concentration estimate used for per-prototype
temperatures (``src/contrastor/utils.py:79-94``):

    phi_c = mean(sqrt(d_i)) / log(n_c + 10), singletons get max phi,
    clipped to [p10, p90], scaled so mean phi = temperature.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _kmeanspp_init(key, x, num_clusters):
    """k-means++ seeding: distance-weighted sequential centroid choice."""
    n, d = x.shape
    k0, key = jax.random.split(key)
    first = x[jax.random.randint(k0, (), 0, n)]
    centroids0 = jnp.zeros((num_clusters, d), x.dtype).at[0].set(first)
    min_d0 = jnp.sum((x - first) ** 2, axis=1)

    def body(i, carry):
        centroids, min_d, key = carry
        key, kc = jax.random.split(key)
        probs = min_d / jnp.maximum(jnp.sum(min_d), 1e-12)
        idx = jax.random.choice(kc, n, p=probs)
        c = x[idx]
        centroids = centroids.at[i].set(c)
        min_d = jnp.minimum(min_d, jnp.sum((x - c) ** 2, axis=1))
        return centroids, min_d, key

    centroids, _, _ = jax.lax.fori_loop(
        1, num_clusters, body, (centroids0, min_d0, key)
    )
    return centroids


@functools.partial(
    jax.jit, static_argnames=("num_clusters", "num_iters", "num_redo")
)
def kmeans_fit(
    key: jax.Array,
    x: jnp.ndarray,  # [N, D] points
    num_clusters: int,
    num_iters: int = 20,
    num_redo: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Lloyd's algorithm with k-means++ seeding and ``num_redo`` restarts
    (best inertia wins — the role of faiss's ``nredo``,
    ``src/contrastor/utils.py:32``). Returns (centroids [K, D],
    assignments [N], sq_dists [N] to own centroid)."""
    if num_redo > 1:
        keys = jax.random.split(key, num_redo)
        cents, assigns, dists = jax.vmap(
            lambda k: kmeans_fit(k, x, num_clusters, num_iters, 1)
        )(keys)
        best = jnp.argmin(jnp.sum(dists, axis=1))
        return cents[best], assigns[best], dists[best]

    n = x.shape[0]
    centroids = _kmeanspp_init(key, x, num_clusters)

    x_sq = jnp.sum(x * x, axis=1, keepdims=True)  # [N, 1]

    def assign(centroids):
        c_sq = jnp.sum(centroids * centroids, axis=1)  # [K]
        # [N, K] distances via MXU; x_sq constant per row (argmin-invariant
        # but kept so sq_dists are true distances).
        d = x_sq - 2.0 * jnp.dot(x, centroids.T, preferred_element_type=jnp.float32) + c_sq[None, :]
        a = jnp.argmin(d, axis=1)
        return a, jnp.maximum(jnp.min(d, axis=1), 0.0)

    def body(_, centroids):
        a, _ = assign(centroids)
        sums = jax.ops.segment_sum(x, a, num_segments=num_clusters)
        counts = jax.ops.segment_sum(
            jnp.ones((n,), jnp.float32), a, num_segments=num_clusters
        )
        new = sums / jnp.maximum(counts[:, None], 1.0)
        # keep old centroid for empty clusters
        return jnp.where(counts[:, None] > 0, new, centroids)

    centroids = jax.lax.fori_loop(0, num_iters, body, centroids)
    a, d = assign(centroids)
    return centroids, a, d


@functools.partial(jax.jit, static_argnames=("num_clusters",))
def phi_density(
    assignments: jnp.ndarray,  # [N] cluster ids
    sq_dists: jnp.ndarray,  # [N] squared distance to own centroid
    num_clusters: int,
    temperature: float,
) -> jnp.ndarray:
    """Per-cluster concentration temperatures (reference formula)."""
    n = assignments.shape[0]
    counts = jax.ops.segment_sum(
        jnp.ones((n,), jnp.float32), assignments, num_segments=num_clusters
    )
    sqrt_sum = jax.ops.segment_sum(
        jnp.sqrt(sq_dists), assignments, num_segments=num_clusters
    )
    multi = counts > 1
    density = jnp.where(
        multi,
        (sqrt_sum / jnp.maximum(counts, 1.0)) / jnp.log(counts + 10.0),
        0.0,
    )
    dmax = jnp.max(density)
    density = jnp.where(multi, density, dmax)
    # Degenerate case: every cluster a singleton (granularity >= corpus) or
    # zero spread — the reference's singleton rule (max of multi-cluster
    # densities) is undefined and zero temperatures would NaN/inf the proto
    # loss; fall back to a flat temperature.
    density = jnp.where(dmax <= 0.0, jnp.ones_like(density), density)
    lo = jnp.percentile(density, 10.0)
    hi = jnp.percentile(density, 90.0)
    density = jnp.clip(density, lo, hi)
    return temperature * density / jnp.maximum(jnp.mean(density), 1e-12)


def normalize_rows(c: jnp.ndarray) -> jnp.ndarray:
    return c / jnp.maximum(jnp.linalg.norm(c, axis=1, keepdims=True), 1e-12)
