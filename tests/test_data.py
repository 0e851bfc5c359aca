"""Pair sampler + similarity contracts (rebuilt module, host-only)."""

import numpy as np
import pytest

from ircl_tpu.corpus.synthetic import generate
from ircl_tpu.data.pairs import DocPairSampler
from ircl_tpu.data.similarity import sentence_pair_similarity


@pytest.fixture(scope="module")
def wiki():
    return generate(num_docs=30, num_claims=5, seed=9)


def test_epoch_covers_every_eligible_doc_once(wiki):
    docs = list(wiki.sentences.values())
    s = DocPairSampler(docs, sample="uniform", seed=0)
    n = len(s._eligible)
    idxs, _, _ = s.sample_pairs(n)
    # one shuffled epoch: every eligible doc exactly once
    assert sorted(idxs) == sorted(s._eligible)
    # next epoch reshuffles but still covers all
    idxs2, _, _ = s.sample_pairs(n)
    assert sorted(idxs2) == sorted(s._eligible)


def test_augment_anchor_is_claim_like_view(wiki):
    docs = list(wiki.sentences.values())
    s = DocPairSampler(docs, sample="augment", seed=1)
    _, anchors, positives = s.sample_pairs(64)
    shorter = 0
    for a, p in zip(anchors, positives):
        # anchor words are a sub-multiset of the positive's words
        pw = p.split()
        counts = {}
        for w in pw:
            counts[w] = counts.get(w, 0) + 1
        for w in a.split():
            assert counts.get(w, 0) > 0, (a, p)
            counts[w] -= 1
        shorter += len(a.split()) < len(pw)
    assert shorter > 32  # crops/dropout actually shorten most anchors


def test_tfidf_single_sentence_doc_self_pair():
    docs = [["only one sentence here"], ["two sents a", "two sents b"]]
    sim = sentence_pair_similarity(docs, hash_size=1 << 12)
    assert sim[0][0][0] == (0, 0)  # reference's self-pair case
    assert all(i < j for (i, j), _ in sim[1])
    scores = [sc for _, sc in sim[1]]
    assert scores == sorted(scores, reverse=True)


def test_similarity_idf_fitted_over_full_corpus():
    # a pair sharing a corpus-rare word must outscore one sharing only a
    # corpus-common word (idf comes from ALL sentences, not just the doc)
    common = "alpha beta gamma"
    docs = [
        [f"{common} zephyrquark", f"{common} zephyrquark", f"{common} other"],
    ] + [[f"{common} filler{i}"] for i in range(20)]
    sim = sentence_pair_similarity(docs, hash_size=1 << 16)
    top_pair, _ = sim[0][0]
    assert top_pair == (0, 1)


def test_stem_variant_collapses_inflected_surfaces():
    wiki = generate(num_docs=200, num_claims=5, seed=42, inflect_prob=0.4)
    docs = list(wiki.sentences.values())
    surface = sentence_pair_similarity(docs)
    stem = sentence_pair_similarity(docs, stem=True)
    changed = sum(
        1 for a, b in zip(surface, stem) if a and a[0][0] != b[0][0]
    )
    assert changed > 10  # the spaces genuinely differ under morphology
    # and without morphology they coincide (suffix stripping is a no-op on
    # the CV-syllable vocabulary)
    wiki0 = generate(num_docs=50, num_claims=5, seed=42)
    docs0 = list(wiki0.sentences.values())
    assert sentence_pair_similarity(docs0) == sentence_pair_similarity(
        docs0, stem=True
    )


def test_batches_shapes_and_doc_idx(wiki):
    from ircl_tpu.models.featurizer import FeaturizerConfig, HashEmbedFeaturizer

    feat = HashEmbedFeaturizer(
        FeaturizerConfig(dim=16, max_len=8, vocab_buckets=1 << 10)
    )
    docs = list(wiki.sentences.values())
    s = DocPairSampler(docs, sample="uniform", seed=3)
    out = list(s.batches(feat, accum_steps=2, micro_batch=4, num_steps=3))
    assert len(out) == 3
    doc_idx, ids_a, mask_a, ids_k, mask_k = out[0]
    assert doc_idx.shape == (2, 4)
    for arr in (ids_a, mask_a, ids_k, mask_k):
        assert arr.shape == (2, 4, 8)
    assert mask_a.max() == 1.0 and (doc_idx >= 0).all()
