"""TransformerFeaturizer: the reference's frozen-BERT -> BiLSTM architecture.

Reference: ``src/contrastor/contrastive_module.py:32-41`` freezes a pretrained
``bert-base-uncased`` and trains the BiLSTM head on its last hidden state.
Offline, the same architecture runs with a corpus-trained WordPiece vocab and
a random-init transformer; these tests train the head end-to-end on top of it.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ircl_tpu.contrastive.state import TrainConfig, init_train_state
from ircl_tpu.contrastive.train import make_embed_fn, make_train_step
from ircl_tpu.models.encoder import EncoderConfig
from ircl_tpu.models.featurizer import (
    FeaturizerConfig,
    TransformerFeaturizer,
    make_featurizer,
)

TFG = FeaturizerConfig(
    kind="transformer",
    dim=32,
    max_len=12,
    tf_layers=2,
    tf_heads=2,
    tf_intermediate=64,
    wp_vocab=512,
)

CFG = TrainConfig(
    encoder=EncoderConfig(
        input_size=32, hidden_size=16, output_size=8, num_layers=2
    ),
    temperature=0.05,
    queue_size=16,
    queue_start_steps=10_000,
    micro_batch=4,
    accum_steps=2,
    learning_rate=1e-3,
)

CORPUS = [
    f"tok{i} alpha beta gamma delta epsilon zeta eta theta" for i in range(60)
]


@pytest.fixture(scope="module")
def feat():
    return TransformerFeaturizer.train_from_corpus(CORPUS, TFG)


def _batch(feat, rng, accum, micro):
    texts_a, texts_k = [], []
    for _ in range(accum * micro):
        ent = f"tok{rng.integers(50)}"
        texts_a.append(f"{ent} alpha beta gamma")
        texts_k.append(f"delta {ent} epsilon")
    ids_a, mask_a = feat.encode_host(texts_a)
    ids_k, mask_k = feat.encode_host(texts_k)
    shape = (accum, micro, feat.config.max_len)
    return tuple(
        jnp.asarray(a.reshape(shape)) for a in (ids_a, mask_a, ids_k, mask_k)
    )


def test_encode_host_contract(feat):
    ids, mask = feat.encode_host(["tok1 alpha", ""])
    assert ids.shape == (2, TFG.max_len) and ids.dtype == np.int32
    assert mask.shape == (2, TFG.max_len) and mask.dtype == np.float32
    # [CLS] tok 1(maybe split) alpha [SEP] -> at least 3 real tokens
    assert mask[0].sum() >= 3
    # empty text still gets [CLS] [SEP]
    assert mask[1].sum() == 2


def test_features_matches_pure_apply(feat):
    ids, mask = feat.encode_host(["tok3 alpha beta", "gamma delta"])
    f1 = np.asarray(feat.features(ids, mask))
    f2 = np.asarray(
        feat.apply(feat.params, jnp.asarray(ids), jnp.asarray(mask))
    )
    assert f1.shape == (2, TFG.max_len, TFG.dim)
    np.testing.assert_allclose(f1, f2, rtol=1e-5, atol=1e-6)
    # padded positions zeroed
    pad = np.asarray(mask) == 0.0
    assert np.abs(f1[pad]).max() == 0.0
    # distinct texts -> distinct features
    assert not np.allclose(f1[0], f1[1])


def test_contrastive_head_trains_on_frozen_transformer(feat):
    """End-to-end: BiLSTM head + NT-Xent over frozen transformer features —
    the reference's actual architecture (contrastive_module.py:32-41)."""
    rng = np.random.default_rng(0)
    state = init_train_state(jax.random.PRNGKey(0), CFG)
    step = make_train_step(CFG, feat)
    feat_leaf0 = np.asarray(jax.tree.leaves(feat.params)[0]).copy()

    batch = _batch(feat, rng, CFG.accum_steps, CFG.micro_batch)
    losses = []
    for _ in range(25):
        state, loss, grad_norm = step(state, *batch)
        losses.append(float(loss))
        assert np.isfinite(losses[-1]) and np.isfinite(float(grad_norm))

    # head trained on the fixed batch...
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # ...while the featurizer stayed frozen
    np.testing.assert_array_equal(
        feat_leaf0, np.asarray(jax.tree.leaves(feat.params)[0])
    )


def test_embed_fn_normalized(feat):
    state = init_train_state(jax.random.PRNGKey(3), CFG)
    embed = make_embed_fn(CFG, feat)
    ids, mask = feat.encode_host(["some text here", "another document"])
    emb = embed(state.params_q, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=1), 1.0, rtol=1e-5
    )


def test_dp_train_step_on_mesh(feat):
    """The frozen-transformer architecture shards over the data axis like the
    hash featurizer does (params replicated, batch split, grads psum'd)."""
    from ircl_tpu.parallel.dp import make_dp_train_step
    from ircl_tpu.parallel.mesh import make_mesh

    cfg = dataclasses.replace(CFG, micro_batch=8, accum_steps=1)
    mesh = make_mesh(("data",))
    step, place_state, place_batch, _ = make_dp_train_step(cfg, feat, mesh)
    state = place_state(init_train_state(jax.random.PRNGKey(0), cfg))
    batch = place_batch(
        *_batch(feat, np.random.default_rng(1), cfg.accum_steps, cfg.micro_batch)
    )
    state, loss, grad_norm = step(state, *batch)
    assert np.isfinite(float(loss)) and np.isfinite(float(grad_norm))


def test_make_featurizer_dispatch():
    f = make_featurizer(TFG, CORPUS)
    assert isinstance(f, TransformerFeaturizer)
    from ircl_tpu.models.featurizer import HashEmbedFeaturizer

    assert isinstance(
        make_featurizer(FeaturizerConfig(dim=16, max_len=8, vocab_buckets=64)),
        HashEmbedFeaturizer,
    )
    with pytest.raises(ValueError, match="corpus_texts"):
        make_featurizer(TFG)
    with pytest.raises(ValueError, match="unknown featurizer kind"):
        make_featurizer(dataclasses.replace(TFG, kind="bogus"), CORPUS)


def test_vocab_deterministic_across_builds():
    """Train and retrieve must rebuild the identical vocab from the corpus."""
    f1 = TransformerFeaturizer.train_from_corpus(CORPUS, TFG)
    f2 = TransformerFeaturizer.train_from_corpus(CORPUS, TFG)
    assert f1.tokenizer.vocab == f2.tokenizer.vocab
    ids1, _ = f1.encode_host(["tok7 alpha beta"])
    ids2, _ = f2.encode_host(["tok7 alpha beta"])
    np.testing.assert_array_equal(ids1, ids2)


def test_from_huggingface_cache_gated():
    """Real bert-base weights when a local HF cache exists (no egress here)."""
    try:
        feat = TransformerFeaturizer.from_huggingface("bert-base-uncased")
    except Exception:
        pytest.skip("no local HF cache for bert-base-uncased")
    ids, mask = feat.encode_host(["hello world"])
    out = feat.features(ids, mask)
    assert out.shape == (1, feat.config.max_len, 768)
