"""K-means / hierarchical clustering tests."""

import numpy as np

import jax
import jax.numpy as jnp

from ircl_tpu.contrastive.cluster import run_hierarchical, run_kmeans
from ircl_tpu.ops.kmeans import kmeans_fit, phi_density


def _blobs(rng, k=4, per=50, d=8, spread=0.05):
    centers = rng.normal(size=(k, d)) * 3
    pts = np.concatenate(
        [c + spread * rng.normal(size=(per, d)) for c in centers]
    ).astype(np.float32)
    labels = np.repeat(np.arange(k), per)
    return pts, labels


def test_kmeans_recovers_blobs():
    rng = np.random.default_rng(0)
    pts, labels = _blobs(rng)
    cents, assign, sq_d = kmeans_fit(jax.random.PRNGKey(0), jnp.asarray(pts), 4, 25, 4)
    assign = np.asarray(assign)
    # Every ground-truth blob maps to exactly one k-means cluster.
    for b in range(4):
        got = assign[labels == b]
        assert len(set(got.tolist())) == 1
    # distances are small within blobs
    assert float(np.asarray(sq_d).mean()) < 0.1


def test_phi_density_properties():
    rng = np.random.default_rng(1)
    assign = jnp.asarray(rng.integers(0, 8, 200).astype(np.int32))
    sq_d = jnp.asarray(rng.random(200).astype(np.float32))
    dens = phi_density(assign, sq_d, 8, temperature=0.05)
    dens = np.asarray(dens)
    assert dens.shape == (8,)
    assert np.all(dens > 0)
    np.testing.assert_allclose(dens.mean(), 0.05, rtol=1e-5)


def test_run_kmeans_multi_granularity():
    rng = np.random.default_rng(2)
    pts, _ = _blobs(rng, k=6, per=30)
    res = run_kmeans(pts, num_clusters=[4, 6], temperature=0.05, seed=3)
    assert res.num_granularities == 2
    assert res.centroids[0].shape == (4, 8)
    assert res.centroids[1].shape == (6, 8)
    for c in res.centroids:
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(c), axis=1), 1.0, rtol=1e-5
        )
    for a, k in zip(res.emb2cluster, [4, 6]):
        assert int(jnp.max(a)) < k


def test_run_hierarchical():
    rng = np.random.default_rng(3)
    pts, labels = _blobs(rng, k=3, per=20)
    res = run_hierarchical(pts, num_clusters=[3, 5], temperature=0.05)
    assert res.num_granularities == 2
    a0 = np.asarray(res.emb2cluster[0])
    # 3-cut should align with the blobs
    for b in range(3):
        assert len(set(a0[labels == b].tolist())) == 1
    np.testing.assert_allclose(
        float(np.asarray(res.density[0]).mean()), 0.05, rtol=1e-4
    )
