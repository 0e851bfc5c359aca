"""df-threshold autotune: model wiring, limiting behavior, ranker parity."""

import numpy as np

from ircl_tpu.corpus.store import MemoryDocStore
from ircl_tpu.corpus.synthetic import generate
from ircl_tpu.index.autotune import auto_df_threshold, synthesize_query_sample
from ircl_tpu.index.build import build_count_index, to_scipy
from ircl_tpu.index.ranker import TfidfRanker, vectorize_queries
from ircl_tpu.index.tfidf import tfidf_transform


def _index(num_docs=400, seed=5):
    wiki = generate(num_docs=num_docs, num_claims=16, seed=seed)
    store = MemoryDocStore({d: r["text"] for d, r in wiki.docs.items()})
    index = tfidf_transform(
        build_count_index(store, ngram=2, hash_size=1 << 18)
    )
    return index, [c.claim for c in wiki.claims]


def test_limiting_behavior():
    """Rate extremes push the argmin to the candidate extremes: free light
    path -> everything light (max t); free slab -> everything heavy
    (min t). Pins the sign of each model term."""
    index, _ = _index()
    cands = (4, 16, 64, 256)
    all_light = auto_df_threshold(
        index, candidates=cands, ns_light=1e-12, r_slab=1.0, r_mm=1.0
    )
    assert all_light == max(cands)
    all_heavy = auto_df_threshold(
        index, candidates=cands, ns_light=1e9, r_slab=1e30, r_mm=1e30
    )
    assert all_heavy == min(cands)


def test_costs_finite_and_query_models():
    index, _ = _index()
    best, costs = auto_df_threshold(index, return_costs=True)
    assert best in costs and all(np.isfinite(c) for c in costs.values())
    qb, qw = synthesize_query_sample(
        index.doc_freqs, batch=64, model="mass"
    )
    assert qb.shape == (64, 24) and (index.doc_freqs[qb] > 0).all()


def test_ranker_auto_threshold_parity():
    """df_threshold='auto' resolves to a concrete candidate and the engine
    stays exact vs scipy."""
    from ircl_tpu.index.build import scipy_query_scores

    index, claims = _index()
    r = TfidfRanker(index, mode="hybrid", df_threshold="auto")
    assert isinstance(r.df_threshold, (int, np.integer))
    mat = to_scipy(index)
    qb, qw = vectorize_queries(
        claims, index.hash_size, index.ngram, index.doc_freqs, index.num_docs
    )
    ref_dense = scipy_query_scores(mat, qb, qw, index.hash_size)
    out = r.closest_docs_batch(claims, k=5)
    doc2idx = {d: i for i, d in enumerate(index.doc_ids)}
    for b, (ids, scores) in enumerate(out):
        dense = ref_dense[b]
        top = np.sort(dense)[::-1][: len(scores)]
        np.testing.assert_allclose(scores, top, rtol=1e-4, atol=1e-6)
        for d, s in zip(ids, scores):
            np.testing.assert_allclose(
                s, dense[doc2idx[d]], rtol=1e-4, atol=1e-6
            )
