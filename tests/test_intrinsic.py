"""Intrinsic cosine metric + hybrid empty-query edge cases."""

import numpy as np

from ircl_tpu.corpus.fever import Claim
from ircl_tpu.corpus.store import MemoryDocStore
from ircl_tpu.corpus.synthetic import generate
from ircl_tpu.index.build import build_count_index
from ircl_tpu.index.ranker import TfidfRanker
from ircl_tpu.index.tfidf import tfidf_transform
from ircl_tpu.pipeline.intrinsic import mean_claim_evidence_cosine


def test_mean_claim_evidence_cosine():
    claims = [
        Claim(1, "alpha beta", "SUPPORTS", {"DocA": [0]}),
        Claim(2, "gamma delta", "SUPPORTS", {"DocB": [1]}),
        Claim(3, "missing doc", "SUPPORTS", {"Nope": [0]}),
    ]
    sents = {"DocA": ["alpha beta evidence", "other"], "DocB": ["x", "gamma delta text"]}

    def embed(texts):
        # toy embedding: 2-dim indicator of 'alpha'/'gamma', normalized
        out = []
        for t in texts:
            v = np.array([float("alpha" in t), float("gamma" in t)]) + 1e-3
            out.append(v / np.linalg.norm(v))
        return np.stack(out)

    res = mean_claim_evidence_cosine(embed, claims, sents, seed=1)
    assert res["pairs"] == 2
    assert res["mean_cosine"] > 0.99  # matched pairs align
    assert res["shuffled_cosine"] <= res["mean_cosine"]


def test_hybrid_empty_and_stopword_queries():
    wiki = generate(num_docs=60, num_claims=5, seed=23)
    store = MemoryDocStore({d: r["text"] for d, r in wiki.docs.items()})
    index = tfidf_transform(build_count_index(store, ngram=2, hash_size=1 << 18))
    r = TfidfRanker(index, mode="hybrid", df_threshold=8)
    out = r.closest_docs_batch(["the of and a", "", wiki.claims[0].claim], k=5)
    assert out[0][0] == [] and out[1][0] == []
    assert len(out[2][0]) > 0
