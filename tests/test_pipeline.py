"""End-to-end pipeline tests on the synthetic FEVER-like corpus."""

import numpy as np
import pytest

from ircl_tpu.corpus.fever import parse_lines_tab
from ircl_tpu.corpus.store import MemoryDocStore
from ircl_tpu.corpus.synthetic import generate
from ircl_tpu.index.build import build_count_index
from ircl_tpu.index.ranker import TfidfRanker
from ircl_tpu.index.tfidf import tfidf_transform
from ircl_tpu.pipeline.recall import doc_recall_at_k, sentence_recall_at_k
from ircl_tpu.pipeline.retrieve import retrieve, sparse_sentence_scorer

HASH_SIZE = 2**20


@pytest.fixture(scope="module")
def wiki():
    return generate(num_docs=120, num_claims=60, seed=7)


@pytest.fixture(scope="module")
def ranker(wiki):
    store = MemoryDocStore({d: rec["text"] for d, rec in wiki.docs.items()})
    index = build_count_index(store, ngram=2, hash_size=HASH_SIZE)
    return TfidfRanker(tfidf_transform(index))


def test_lines_roundtrip(wiki):
    doc_id = next(iter(wiki.docs))
    sents = parse_lines_tab(wiki.docs[doc_id]["lines"])
    assert sents == wiki.sentences[doc_id]


def test_doc_recall_on_synthetic(wiki, ranker):
    claims = [c.claim for c in wiki.claims]
    results = ranker.closest_docs_batch(claims, k=5)
    retrieved = [ids for ids, _ in results]
    recall = doc_recall_at_k(wiki.claims, retrieved, k=5)
    # Synthetic claims share unique entity tokens with their gold doc; sparse
    # retrieval should find nearly all of them.
    assert recall >= 0.9, f"doc recall@5 too low: {recall}"


def test_two_stage_pipeline_sentence_recall(wiki, ranker):
    claims = [c.claim for c in wiki.claims]

    def factory(sents):
        store = MemoryDocStore(list(sents))
        idx = build_count_index(store, ngram=2, hash_size=2**16)
        return TfidfRanker(tfidf_transform(idx))

    result = retrieve(
        claims,
        ranker,
        wiki.sentences,
        sparse_sentence_scorer(factory),
        k_docs=5,
        k_sents=5,
    )
    srecall = sentence_recall_at_k(wiki.claims, result.sentences, k=5)
    assert srecall >= 0.75, f"sentence recall@5 too low: {srecall}"


def test_recall_metric_unit():
    from ircl_tpu.corpus.fever import Claim

    claims = [
        Claim(1, "c1", "SUPPORTS", {"DocA": [0, 2]}),
        Claim(2, "c2", "SUPPORTS", {"DocB": [1], "DocC": [0]}),
        Claim(3, "c3", "NOT ENOUGH INFO", {}),
    ]
    retrieved = [["DocX", "DocA"], ["DocC"], ["DocA"]]
    # claim 3 has no evidence -> excluded from denominator
    assert doc_recall_at_k(claims, retrieved, k=2) == 1.0
    assert doc_recall_at_k(claims, retrieved, k=1) == 0.5
    assert doc_recall_at_k(claims, retrieved, k=2, mode="full") == 0.5

    sent_retrieved = [[("DocA", 2)], [("DocB", 0)], []]
    assert sentence_recall_at_k(claims, sent_retrieved, k=5) == 0.5


def test_recall_full_mode_per_annotation():
    from ircl_tpu.corpus.fever import Claim

    # two ALTERNATIVE single-doc annotations: either alone covers
    c = Claim(1, "c", "SUPPORTS", {"D1": [0], "D2": [0]},
              evidence_sets=[[("D1", 0)], [("D2", 0)]])
    assert doc_recall_at_k([c], [["D1"]], k=1, mode="full") == 1.0
    # one MULTI-DOC annotation: a single doc does not cover
    c2 = Claim(2, "c", "SUPPORTS", {"D1": [0], "D2": [0]},
               evidence_sets=[[("D1", 0), ("D2", 0)]])
    assert doc_recall_at_k([c2], [["D1"]], k=1, mode="full") == 0.0
    assert doc_recall_at_k([c2], [["D1", "D2"]], k=2, mode="full") == 1.0
    assert sentence_recall_at_k([c2], [[("D1", 0)]], k=5, mode="full") == 0.0
    assert (
        sentence_recall_at_k([c2], [[("D1", 0), ("D2", 0)]], k=5, mode="full")
        == 1.0
    )
    # flattened-only producer: conservative single-annotation fallback
    c3 = Claim(3, "c", "SUPPORTS", {"D1": [0], "D2": [0]})
    assert sentence_recall_at_k([c3], [[("D1", 0)]], k=5, mode="full") == 0.0


def _fake_embed(texts):
    """Deterministic device-free embedder: crc32-seeded unit vectors."""
    import zlib

    out = np.zeros((len(texts), 16), np.float32)
    for i, t in enumerate(texts):
        rng = np.random.default_rng(zlib.crc32(t.encode("utf-8")))
        v = rng.normal(size=16).astype(np.float32)
        out[i] = v / np.linalg.norm(v)
    return out


def test_precomputed_scorer_matches_on_the_fly(wiki, ranker):
    from ircl_tpu.pipeline.dense_scorer import (
        PrecomputedSentenceScorer,
        _score_by_embed,
    )

    claims = [c.claim for c in wiki.claims][:20]
    on_the_fly = lambda cs, cands: _score_by_embed(_fake_embed, cs, cands)
    pre = PrecomputedSentenceScorer(_fake_embed, wiki.sentences)

    r_fly = retrieve(claims, ranker, wiki.sentences, on_the_fly, k_docs=3, k_sents=4)
    r_pre = retrieve(claims, ranker, wiki.sentences, pre, k_docs=3, k_sents=4)
    assert r_pre.sentences == r_fly.sentences
    for a, b in zip(r_pre.sentence_scores, r_fly.sentence_scores):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_precomputed_scorer_edges(wiki):
    from ircl_tpu.pipeline.dense_scorer import PrecomputedSentenceScorer

    pre = PrecomputedSentenceScorer(_fake_embed, wiki.sentences)
    # empty candidate list -> empty scores
    (empty,) = pre.score_keys(["a claim"], [[]])
    assert empty.shape == (0,)
    # a key outside the table is a caller bug: loud, not wrong-row
    doc = next(iter(wiki.sentences))
    with pytest.raises(KeyError):
        pre.score_keys(["a claim"], [[("no_such_doc", 0)]])
    # protocol __call__ still works for out-of-table text
    (sc,) = pre(["a claim"], [[wiki.sentences[doc][0], "novel text"]])
    assert sc.shape == (2,)
    # preloaded table round-trips (the bench's disk-cache path)...
    pre2 = PrecomputedSentenceScorer(
        _fake_embed, wiki.sentences, table=pre.table
    )
    keys = [[(doc, 0)]]
    np.testing.assert_array_equal(
        pre2.score_keys(["a claim"], keys)[0],
        pre.score_keys(["a claim"], keys)[0],
    )
    # ...and a stale (wrong-row-count) table is rejected loudly
    with pytest.raises(ValueError):
        PrecomputedSentenceScorer(
            _fake_embed, wiki.sentences, table=pre.table[:-1]
        )
