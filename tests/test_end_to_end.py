"""Minimum end-to-end slice (SURVEY.md section 7): synthetic corpus -> sparse
top-k docs -> trained contrastive encoder -> dense sentence re-rank ->
sentence recall@5."""

import dataclasses

import numpy as np
import pytest

from ircl_tpu.contrastive.state import TrainConfig
from ircl_tpu.contrastive.trainer import ContrastiveTrainer
from ircl_tpu.corpus.store import MemoryDocStore
from ircl_tpu.corpus.synthetic import generate
from ircl_tpu.data.pairs import DocPairSampler
from ircl_tpu.index.build import build_count_index
from ircl_tpu.index.ranker import TfidfRanker
from ircl_tpu.index.tfidf import tfidf_transform
from ircl_tpu.models.encoder import EncoderConfig
from ircl_tpu.models.featurizer import FeaturizerConfig, HashEmbedFeaturizer
from ircl_tpu.pipeline.dense_scorer import ContrastiveSentenceScorer
from ircl_tpu.pipeline.recall import doc_recall_at_k, sentence_recall_at_k
from ircl_tpu.pipeline.retrieve import retrieve


def test_full_two_stage_slice(tmp_path):
    wiki = generate(num_docs=60, num_claims=40, seed=21)
    claims = [c.claim for c in wiki.claims]

    # stage 1: sparse index
    store = MemoryDocStore({d: r["text"] for d, r in wiki.docs.items()})
    index = tfidf_transform(build_count_index(store, ngram=2, hash_size=1 << 18))
    ranker = TfidfRanker(index)

    # contrastive encoder trained briefly on the corpus sentence pairs
    feat = HashEmbedFeaturizer(
        FeaturizerConfig(dim=32, max_len=16, vocab_buckets=1 << 12)
    )
    cfg = TrainConfig(
        encoder=EncoderConfig(
            input_size=32, hidden_size=16, output_size=16, num_layers=1,
            masked_mean=True,
        ),
        queue_size=32,
        queue_start_steps=5,
        micro_batch=16,
        accum_steps=1,
        learning_rate=3e-3,
    )
    sampler = DocPairSampler(
        list(wiki.sentences.values()), sample="augment", seed=3
    )
    trainer = ContrastiveTrainer(
        cfg, feat, sampler, ckptdir=str(tmp_path / "c"), logdir=str(tmp_path / "l")
    )
    state = trainer.train(total_steps=200, log_step=200)

    scorer = ContrastiveSentenceScorer(cfg, feat, state)
    result = retrieve(
        claims, ranker, wiki.sentences, scorer, k_docs=5, k_sents=5
    )

    # The serving form of stage 2: precompute the corpus sentence-embedding
    # table once, score candidates by (doc, sent) key — must agree with the
    # on-the-fly re-embedding path through the REAL trained encoder (rows
    # are batch-independent at pinned shapes).
    from ircl_tpu.pipeline.dense_scorer import PrecomputedSentenceScorer

    pre = PrecomputedSentenceScorer.from_scorer(scorer, wiki.sentences)
    result_pre = retrieve(
        claims, ranker, wiki.sentences, pre, k_docs=5, k_sents=5
    )
    assert result_pre.sentences == result.sentences
    for a, b in zip(result_pre.sentence_scores, result.sentence_scores):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    dr = doc_recall_at_k(wiki.claims, result.doc_ids, k=5)
    sr = sentence_recall_at_k(wiki.claims, result.sentences, k=5)
    assert dr >= 0.9, f"doc recall {dr}"
    # dense re-rank with the trained encoder: gold sentences share rare
    # entity tokens with their claims; the contrastive embedding ranks them
    # into the top-5 of ~25+ candidates.
    assert sr >= 0.85, f"sentence recall {sr}"
