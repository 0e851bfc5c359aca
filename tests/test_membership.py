"""Membership-matmul (ELL) scoring: exactness vs the gather/sort path."""

import numpy as np
import pytest

import jax.numpy as jnp

from ircl_tpu.corpus.store import MemoryDocStore
from ircl_tpu.corpus.synthetic import generate
from ircl_tpu.index.build import build_count_index
from ircl_tpu.index.ell import to_ell
from ircl_tpu.index.ranker import TfidfRanker
from ircl_tpu.index.tfidf import tfidf_transform
from ircl_tpu.ops.membership import membership_dense_scores

HASH_SIZE = 2**20


@pytest.fixture(scope="module")
def setup():
    wiki = generate(num_docs=80, num_claims=40, seed=3)
    store = MemoryDocStore({d: rec["text"] for d, rec in wiki.docs.items()})
    index = tfidf_transform(build_count_index(store, ngram=2, hash_size=HASH_SIZE))
    claims = [c.claim for c in wiki.claims]
    return index, claims


def test_ell_roundtrip(setup):
    index, _ = setup
    ell = to_ell(index)
    assert ell.terms.shape == ell.vals.shape
    # Sum of stored values must equal the CSR total.
    np.testing.assert_allclose(ell.vals.sum(), index.post_vals.sum(), rtol=1e-5)
    # Rows ascending (padding -1 leads nowhere since it's trailing).
    for r in range(0, ell.num_docs, 17):
        row = ell.terms[r]
        live = row[row >= 0]
        assert (np.diff(live) > 0).all()


def test_membership_dense_matches_ragged_dense(setup):
    index, claims = setup
    ranker_ell = TfidfRanker(index, mode="ell")
    ranker_rag = TfidfRanker(index, mode="ragged")

    dense_ref = ranker_rag.dense_scores_batch(claims)

    buckets, weights = ranker_ell._vectorize(claims)
    u_pad = ranker_ell._union_slots(buckets, weights)
    dense_ell = np.asarray(
        membership_dense_scores(
            ranker_ell._ell_terms,
            ranker_ell._ell_vals,
            jnp.asarray(u_pad),
            jnp.asarray(buckets.astype(np.int32)),
            jnp.asarray(weights),
        )
    )
    np.testing.assert_allclose(dense_ell, dense_ref, rtol=1e-4, atol=1e-5)


def test_ell_topk_matches_ragged_topk(setup):
    index, claims = setup
    r_ell = TfidfRanker(index, mode="ell")
    r_rag = TfidfRanker(index, mode="ragged")
    out_e = r_ell.closest_docs_batch(claims, k=5)
    out_r = r_rag.closest_docs_batch(claims, k=5)
    for (ids_e, s_e), (ids_r, s_r) in zip(out_e, out_r):
        assert len(ids_e) == len(ids_r)
        np.testing.assert_allclose(s_e, s_r, rtol=1e-4)
        # doc sets may differ only within tied scores
        assert set(ids_e) == set(ids_r) or np.allclose(
            sorted(s_e), sorted(s_r), rtol=1e-4
        )


def test_auto_mode_selects_ell_for_small_corpus(setup):
    index, _ = setup
    assert TfidfRanker(index).mode == "ell"


def test_slab_xla_reference_matches_pallas_interpret():
    """The XLA fallback slab (CPU-mesh scale path) is bit-identical to the
    Pallas kernels on the same inputs."""
    import jax.numpy as jnp

    from ircl_tpu.ops.membership_pallas import (
        membership_slab,
        membership_slab_windowed,
        pad_for_slab,
        slab_xla_reference,
    )

    rng = np.random.default_rng(5)
    n, kw, hash_size = 640, 12, 1 << 16
    terms = np.sort(
        rng.choice(hash_size, size=(n, kw), replace=True), axis=1
    ).astype(np.int32)
    # trailing pads per doc
    width = rng.integers(1, kw + 1, size=n)
    mask = np.arange(kw)[None, :] < width[:, None]
    terms = np.where(mask, terms, -1)
    terms = np.sort(terms, axis=1)[:, ::-1]  # keep -1 trailing? re-sort asc
    terms = np.where(terms >= 0, terms, np.iinfo(np.int32).max)
    terms = np.sort(terms, axis=1)
    terms = np.where(terms == np.iinfo(np.int32).max, -1, terms)
    vals = np.where(terms >= 0, rng.random((n, kw)).astype(np.float32), 0.0)

    u = np.unique(terms[terms >= 0])[::3]
    u_cap = 512
    u_pad = np.full(u_cap, hash_size, np.int32)
    u_pad[: min(len(u), u_cap)] = u[:u_cap]

    tt, vt = pad_for_slab(
        np.ascontiguousarray(terms.T), np.ascontiguousarray(vals.T), d_tile=256
    )
    ref = np.asarray(slab_xla_reference(
        jnp.asarray(u_pad), jnp.asarray(tt), jnp.asarray(vt)
    ))
    got_w = np.asarray(membership_slab_windowed(
        jnp.asarray(u_pad), jnp.asarray(tt), jnp.asarray(vt),
        u_tile=128, d_tile=256, interpret=True,
    ))
    got_p = np.asarray(membership_slab(
        jnp.asarray(u_pad), jnp.asarray(tt), jnp.asarray(vt),
        u_tile=128, d_tile=256, interpret=True,
    ))
    np.testing.assert_array_equal(ref, got_w)
    np.testing.assert_array_equal(ref, got_p)
