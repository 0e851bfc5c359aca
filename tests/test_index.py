"""Sparse index tests: build, tf-idf math, ragged TPU scoring vs scipy."""

import os

import numpy as np
import pytest
import scipy.sparse as sp

from ircl_tpu.corpus.store import MemoryDocStore
from ircl_tpu.index.build import build_count_index, to_scipy
from ircl_tpu.index.ranker import TfidfRanker, vectorize_queries
from ircl_tpu.index.tfidf import idf_vector, tfidf_transform

# A small fixture corpus in the spirit of the reference's inline smoke test
# (build_tfidf_lines.py) but with original text.
CORPUS = [
    "The committee approved the solar farm proposal after a lengthy debate.",
    "Solar panels on the farm generate enough power for three villages.",
    "A lengthy debate about wind turbines delayed the committee vote.",
    "Wind and solar power together supply most of the island's electricity.",
    "The villages voted to expand the turbine farm next spring.",
    "Electricity prices fell after the island connected the new turbines.",
    "The proposal to expand the harbor was rejected by the council.",
    "Harbor expansion would disturb seabird nesting sites, experts warned.",
    "Experts presented evidence about nesting seabirds to the council.",
    "Spring storms damaged three turbines and one solar panel array.",
    "The council debated electricity prices at the spring meeting.",
]

HASH_SIZE = 2**18  # small hash space keeps the test light; collisions fine


@pytest.fixture(scope="module")
def index():
    store = MemoryDocStore(CORPUS)
    return build_count_index(store, ngram=2, hash_size=HASH_SIZE)


@pytest.fixture(scope="module")
def tfidf_index(index):
    return tfidf_transform(index)


def test_count_matrix_matches_scipy_reference(index):
    """CSR assembly equals a scipy COO->CSR build from the same counts."""
    from ircl_tpu.index.build import doc_to_hashed_counts

    rows, cols, vals = [], [], []
    for di, text in enumerate(CORPUS):
        buckets, counts = doc_to_hashed_counts(text, 2, HASH_SIZE)
        rows.extend(buckets.tolist())
        cols.extend([di] * len(buckets))
        vals.extend(counts.tolist())
    ref = sp.csr_matrix(
        (vals, (rows, cols)), shape=(HASH_SIZE, len(CORPUS))
    )
    ref.sum_duplicates()

    ours = to_scipy(index)
    assert (ours != ref).nnz == 0


def test_doc_freqs(index):
    ref = to_scipy(index)
    binary = (ref > 0).astype(int)
    freqs = np.array(binary.sum(1)).squeeze()
    np.testing.assert_array_equal(index.doc_freqs, freqs)


def test_tfidf_matches_reference_formula(index, tfidf_index):
    cnts = to_scipy(index)
    Ns = index.doc_freqs
    idfs = np.log((cnts.shape[1] - Ns + 0.5) / (Ns + 0.5))
    idfs[idfs < 0] = 0
    ref = sp.diags(idfs, 0).dot(cnts.log1p()).tocsr()
    ours = to_scipy(tfidf_index)
    np.testing.assert_allclose(ours.toarray(), ref.toarray(), rtol=1e-6)


QUERIES = [
    "solar farm proposal",
    "seabird nesting sites near the harbor",
    "electricity prices on the island",
    "committee debate",
    "zzz unseen tokens qqq",
]


def test_dense_scores_match_scipy(tfidf_index):
    ranker = TfidfRanker(tfidf_index)
    got = ranker.dense_scores_batch(QUERIES)

    mat = to_scipy(tfidf_index)
    buckets, weights = vectorize_queries(
        QUERIES, HASH_SIZE, 2, tfidf_index.doc_freqs, tfidf_index.num_docs
    )
    for b, q in enumerate(QUERIES):
        nz = weights[b] != 0
        spvec = sp.csr_matrix(
            (
                weights[b][nz],
                buckets[b][nz],
                [0, int(nz.sum())],
            ),
            shape=(1, HASH_SIZE),
        )
        ref = (spvec * mat).toarray().ravel()
        np.testing.assert_allclose(got[b], ref, rtol=1e-5, atol=1e-6)


def test_topk_matches_dense_ranking(tfidf_index):
    ranker = TfidfRanker(tfidf_index)
    dense = ranker.dense_scores_batch(QUERIES)
    topk = ranker.closest_docs_batch(QUERIES, k=3)
    for b in range(len(QUERIES)):
        ids, scores = topk[b]
        ref_order = np.argsort(-dense[b])
        nonzero = dense[b][ref_order] > 0
        expect_ids = [str(i) for i in ref_order[nonzero][:3]]
        # Scores must match; id sets must match per tied-score group.
        np.testing.assert_allclose(
            scores, np.sort(dense[b])[::-1][: len(scores)], rtol=1e-5
        )
        assert len(ids) == len(expect_ids)
        got_by_score = {}
        for i, s in zip(ids, scores):
            got_by_score.setdefault(round(float(s), 5), set()).add(i)
        for i in expect_ids:
            s = round(float(dense[b][int(i)]), 5)
            assert any(i in v for kk, v in got_by_score.items() if kk == s) or s in got_by_score


def test_empty_query_returns_empty(tfidf_index):
    ranker = TfidfRanker(tfidf_index)
    ids, scores = ranker.closest_docs("the of and a", k=5)
    assert ids == [] and scores.size == 0


def test_segment_topk_unit():
    import jax.numpy as jnp

    from ircl_tpu.ops.ragged import segment_topk

    INT_MAX = np.iinfo(np.int32).max
    docs = jnp.array([[3, 1, 3, 2, 1, INT_MAX, INT_MAX, INT_MAX]], dtype=jnp.int32)
    vals = jnp.array([[1.0, 2.0, 4.0, 8.0, 16.0, 0.0, 0.0, 0.0]])
    scores, ids = segment_topk(docs, vals, k=3)
    # totals: doc1=18, doc2=8, doc3=5
    np.testing.assert_allclose(np.asarray(scores[0]), [18.0, 8.0, 5.0])
    np.testing.assert_array_equal(np.asarray(ids[0]), [1, 2, 3])


@pytest.mark.skipif(
    not os.path.exists("/root/reference"), reason="reference repo not mounted"
)
@pytest.mark.filterwarnings(
    # The reference's get_count_matrix creates its multiprocessing Pool
    # unconditionally (fork after JAX init). The forked child only
    # tokenizes/hashes — it never touches JAX — so the fork-deadlock
    # warning does not apply; the reference code cannot be modified.
    "ignore:.*os.fork.*:RuntimeWarning",
    "ignore:.*multi-threaded, use of fork.*:DeprecationWarning",
)
def test_parity_with_reference_drqa_ranker(tfidf_index):
    """End-to-end parity with the reference DrQA ranker on the fixture corpus.

    Imports the reference implementation (read-only) and compares top-k doc
    ids and scores for every query.
    """
    import sys

    sys.path.insert(0, "/root/reference/preprocessing")
    try:
        import types

        import drqa.build_tfidf as ref_build
        from drqa import retriever as ref_retriever

        args = types.SimpleNamespace(
            ngram=2, hash_size=HASH_SIZE, tokenizer="simple", num_workers=1
        )
        cm, doc_dict = ref_build.get_count_matrix(args, "memory", {"lines": CORPUS})
        ref_tfidf = ref_build.get_tfidf_matrix(cm)
        ref_freqs = ref_build.get_doc_freqs(cm)

        ranker = TfidfRanker(tfidf_index)
        for q in QUERIES[:4]:
            # reference scoring
            import drqa.retriever.utils as ref_utils
            from drqa import tokenizers as ref_tok

            tok = ref_tok.get_class("simple")()
            grams = tok.tokenize(ref_utils.normalize(q)).ngrams(
                n=2, uncased=True, filter_fn=ref_utils.filter_ngram
            )
            wids = [ref_utils.hash(w, HASH_SIZE) for w in grams]
            uniq, cnt = np.unique(wids, return_counts=True)
            tfs = np.log1p(cnt)
            Ns = ref_freqs[uniq]
            idfs = np.log((cm.shape[1] - Ns + 0.5) / (Ns + 0.5))
            idfs[idfs < 0] = 0
            data = tfs * idfs
            spvec = sp.csr_matrix(
                (data, uniq, [0, len(uniq)]), shape=(1, HASH_SIZE)
            )
            ref_scores = (spvec * ref_tfidf).toarray().ravel()

            ours = ranker.dense_scores_batch([q])[0]
            np.testing.assert_allclose(ours, ref_scores, rtol=1e-5, atol=1e-6)
    finally:
        sys.path.remove("/root/reference/preprocessing")


def test_candidate_docs_matches_scipy_boolean_filter():
    """candidate_docs == the reference's documents_filtering semantics:
    posting union over the query's hashed ngrams (src/evaluation.py:57-84),
    cross-checked against a scipy boolean matvec."""
    import scipy.sparse as sp

    from ircl_tpu.corpus.store import MemoryDocStore
    from ircl_tpu.corpus.synthetic import generate
    from ircl_tpu.index.build import build_count_index, to_scipy
    from ircl_tpu.index.ranker import candidate_docs

    wiki = generate(num_docs=80, num_claims=20, seed=21)
    store = MemoryDocStore({d: r["text"] for d, r in wiki.docs.items()})
    index = build_count_index(store, ngram=2, hash_size=1 << 18)
    claims = [c.claim for c in wiki.claims]

    got = candidate_docs(index, claims)
    mat = to_scipy(index)  # [H, N]
    from ircl_tpu.index.build import doc_to_hashed_counts

    for b, claim in enumerate(claims):
        # the reference filters on the COUNT matrix: every hashed ngram
        # participates, including idf-0 (very common) terms
        live, _ = doc_to_hashed_counts(claim, index.ngram, index.hash_size)
        ref_idx = np.unique(mat[live].nonzero()[1])
        assert got[b] == [index.doc_ids[i] for i in ref_idx], f"claim {b}"
        assert len(got[b]) > 0

    # bigram_only drops unigram-driven candidates
    only_bi = candidate_docs(index, claims, bigram_only=True)
    assert all(
        set(bi) <= set(full) for bi, full in zip(only_bi, got)
    )
