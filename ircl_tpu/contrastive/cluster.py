"""Cluster orchestration for ProtoNCE / HProtoNCE.

Equivalent of the reference's ``run_kmeans`` / ``run_hierarchical_clustering``
(``src/contrastor/utils.py:50-160``): embed the corpus with the momentum-free
query encoder, cluster at several granularities, compute normalized centroids
+ phi-scaled per-prototype temperatures, and hand the result to the proto
loss. K-means runs fully on device (``ops/kmeans``); Ward hierarchical
clustering runs host-side via scipy's C nn-chain (the reference used the
fastcluster C++ library for the same job; scipy's ward is the same algorithm)
with centroids/densities computed in numpy.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ircl_tpu.ops.kmeans import kmeans_fit, normalize_rows, phi_density


@dataclass
class ClusterResult:
    """Per granularity: assignments over the dataset, normalized centroids,
    per-cluster temperature vector. Mirrors the reference dict
    {'emb2cluster', 'centroids', 'density'}."""

    emb2cluster: List[jnp.ndarray]
    centroids: List[jnp.ndarray]
    density: List[jnp.ndarray]

    @property
    def num_granularities(self) -> int:
        return len(self.centroids)


def run_kmeans(
    embeddings: np.ndarray,  # [N, D] corpus embeddings (host or device)
    num_clusters: Sequence[int],
    temperature: float,
    num_iters: int = 20,
    num_redo: int = 3,
    seed: int = 0,
) -> ClusterResult:
    """Device k-means at each granularity (reference ``run_kmeans``,
    ``src/contrastor/utils.py:50-105``; seeds increment per granularity)."""
    x = jnp.asarray(embeddings, dtype=jnp.float32)
    out = ClusterResult([], [], [])
    for g, k in enumerate(num_clusters):
        key = jax.random.PRNGKey(seed + g)
        centroids, assign, sq_d = kmeans_fit(key, x, int(k), num_iters, num_redo)
        dens = phi_density(assign, sq_d, int(k), temperature)
        out.emb2cluster.append(assign)
        out.centroids.append(normalize_rows(centroids))
        out.density.append(dens)
    return out


def run_hierarchical(
    embeddings: np.ndarray,
    num_clusters: Sequence[int],
    temperature: float,
) -> ClusterResult:
    """Ward linkage once, then cuts at each granularity (reference
    ``run_hierarchical_clustering``, ``src/contrastor/utils.py:108-160``)."""
    import scipy.cluster.hierarchy as sch

    x = np.asarray(embeddings, dtype=np.float64)
    link = sch.linkage(x, method="ward", metric="euclidean")

    out = ClusterResult([], [], [])
    for k in num_clusters:
        k = int(min(k, x.shape[0]))
        labels = sch.fcluster(link, k, criterion="maxclust") - 1
        kk = labels.max() + 1
        centroids = np.zeros((kk, x.shape[1]))
        counts = np.bincount(labels, minlength=kk).astype(np.float64)
        np.add.at(centroids, labels, x)
        centroids /= np.maximum(counts[:, None], 1.0)

        sq = np.sum((x - centroids[labels]) ** 2, axis=1)
        sqrt_sum = np.zeros(kk)
        np.add.at(sqrt_sum, labels, np.sqrt(sq))
        multi = counts > 1
        density = np.where(
            multi, (sqrt_sum / np.maximum(counts, 1.0)) / np.log(counts + 10.0), 0.0
        )
        if multi.any() and density.max() > 0:
            density = np.where(multi, density, density.max())
        else:
            # all-singleton (granularity >= corpus size) or zero spread:
            # the reference's singleton rule (max of multi densities) is
            # undefined here and zero temperatures would NaN the proto
            # loss — use a flat temperature instead
            density = np.ones(kk)
        density = np.clip(
            density, np.percentile(density, 10), np.percentile(density, 90)
        )
        density = temperature * density / max(density.mean(), 1e-12)

        cn = centroids / np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
        )
        out.emb2cluster.append(jnp.asarray(labels.astype(np.int32)))
        out.centroids.append(jnp.asarray(cn.astype(np.float32)))
        out.density.append(jnp.asarray(density.astype(np.float32)))
    return out
