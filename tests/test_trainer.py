"""Trainer runtime tests: pair sampling, checkpoint/resume, proto training."""

import dataclasses
import os

import numpy as np
import pytest

import jax

from ircl_tpu.contrastive.state import TrainConfig, init_train_state
from ircl_tpu.contrastive.trainer import ContrastiveTrainer
from ircl_tpu.corpus.synthetic import generate
from ircl_tpu.data.pairs import DocPairSampler
from ircl_tpu.data.similarity import sentence_pair_similarity
from ircl_tpu.models.encoder import EncoderConfig
from ircl_tpu.models.featurizer import FeaturizerConfig, HashEmbedFeaturizer
from ircl_tpu.utils.checkpoint import latest_checkpoint, restore_state, save_state

CFG = TrainConfig(
    encoder=EncoderConfig(input_size=16, hidden_size=8, output_size=8, num_layers=1),
    queue_size=16,
    queue_start_steps=2,
    micro_batch=8,
    accum_steps=2,
    learning_rate=1e-3,
    cluster_start_steps=3,
    cluster_update_steps=2,
    num_clusters=(3, 4),
    num_neg_proto=2,
)

FEAT = HashEmbedFeaturizer(FeaturizerConfig(dim=16, max_len=8, vocab_buckets=1 << 10))


@pytest.fixture(scope="module")
def wiki():
    return generate(num_docs=40, num_claims=5, seed=5)


def _sampler(wiki, sample="uniform", seed=0):
    docs = list(wiki.sentences.values())
    sim = sentence_pair_similarity(docs, hash_size=1 << 16) if sample == "tf_idf" else None
    return DocPairSampler(docs, sample=sample, similarity=sim, seed=seed)


def test_pair_sampler_uniform(wiki):
    s = _sampler(wiki)
    idxs, anchors, positives = s.sample_pairs(32)
    assert len(anchors) == len(positives) == 32
    for di, a, p in zip(idxs, anchors, positives):
        assert a in s.docs[di] and p in s.docs[di]
        assert a != p  # distinct sentences within a doc


def test_pair_sampler_tfidf_prefers_similar(wiki):
    s = _sampler(wiki, "tf_idf")
    idxs, anchors, positives = s.sample_pairs(16)
    for di, a, p in zip(idxs, anchors, positives):
        i, j = s.docs[di].index(a), s.docs[di].index(p)
        k = max(1, int(np.ceil(len(s.similarity[di]) * s.ratio)))
        top = {frozenset(p_) for p_, _ in s.similarity[di][:k]}
        assert frozenset((i, j)) in top


def test_trainer_runs_and_checkpoints(tmp_path, wiki):
    sampler = _sampler(wiki)
    tr = ContrastiveTrainer(
        CFG, FEAT, sampler, ckptdir=str(tmp_path / "ckpt"),
        logdir=str(tmp_path / "log"),
    )
    state = tr.train(total_steps=4, log_step=2)
    assert int(state.step) == 4
    path = latest_checkpoint(str(tmp_path / "ckpt"), tr.tag)
    assert path and path.endswith("_4")
    # metrics written
    assert os.path.exists(tr.metrics.path)

    # resume into a fresh trainer
    tr2 = ContrastiveTrainer(
        CFG, FEAT, _sampler(wiki, seed=1), ckptdir=str(tmp_path / "ckpt"),
        logdir=str(tmp_path / "log"),
    )
    assert tr2.maybe_resume() == 4
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state.params_q)[0]),
        np.asarray(jax.tree.leaves(tr2.state.params_q)[0]),
    )
    assert int(tr2.state.queue_ptr) == int(state.queue_ptr)


def test_trainer_protonce(tmp_path, wiki):
    cfg = dataclasses.replace(CFG, loss="ProtoNCE")
    sampler = _sampler(wiki)
    tr = ContrastiveTrainer(
        cfg, FEAT, sampler, ckptdir=str(tmp_path / "c2"), logdir=str(tmp_path / "l2")
    )
    state = tr.train(total_steps=6, log_step=3)
    assert int(state.step) == 6
    assert tr.cluster_result is not None
    assert tr.cluster_result.num_granularities == 2


def test_trainer_hprotonce(tmp_path, wiki):
    cfg = dataclasses.replace(CFG, loss="HProtoNCE")
    tr = ContrastiveTrainer(
        cfg, FEAT, _sampler(wiki), ckptdir=str(tmp_path / "c3"),
        logdir=str(tmp_path / "l3"),
    )
    state = tr.train(total_steps=5, log_step=5)
    assert int(state.step) == 5
    assert tr.cluster_result is not None
