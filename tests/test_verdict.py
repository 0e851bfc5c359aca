"""Transformer encoder, WordPiece tokenizer, and verdict classifier tests."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ircl_tpu.corpus.fever import Claim
from ircl_tpu.models.transformer import (
    TransformerConfig,
    init_transformer_params,
    transformer_apply,
)
from ircl_tpu.models.wordpiece import WordPieceTokenizer
from ircl_tpu.verdict.data import build_examples, encode_examples
from ircl_tpu.verdict.evaluate import classification_report, format_report
from ircl_tpu.verdict.model import (
    VerdictConfig,
    init_verdict_params,
    make_verdict_train_step,
    verdict_apply,
)
from ircl_tpu.verdict.train import train_verdict

TINY = TransformerConfig(
    vocab_size=128, hidden=32, layers=2, heads=4, intermediate=64,
    max_positions=32, type_vocab=2,
)


def test_transformer_padding_invariance():
    """Padded positions must not change real-token outputs."""
    params = init_transformer_params(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, size=(2, 16)).astype(np.int32)
    mask = np.ones((2, 16), np.float32)
    mask[:, 10:] = 0.0
    out1 = transformer_apply(params, TINY, jnp.asarray(ids), jnp.asarray(mask))

    ids2 = ids.copy()
    ids2[:, 10:] = rng.integers(1, 128, size=(2, 6))  # scramble padding ids
    out2 = transformer_apply(params, TINY, jnp.asarray(ids2), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(out1)[:, :10], np.asarray(out2)[:, :10], atol=2e-5
    )


def test_wordpiece_roundtrip_and_pairs():
    corpus = ["the solar farm proposal", "wind turbines near the harbor",
              "seabird nesting sites", "electricity prices fell"]
    tok = WordPieceTokenizer.train(corpus, vocab_size=256, min_count=1)
    toks = tok.tokenize("solar turbines")
    assert toks and "[UNK]" not in toks
    # unseen word decomposes into char pieces, not UNK
    assert "[UNK]" not in tok.tokenize("solarharbor")

    ids, mask, types = tok.encode_pair("solar farm", "wind turbines", max_length=16)
    assert len(ids) == len(mask) == len(types) == 16
    assert ids[0] == tok.vocab["[CLS]"]
    assert sum(mask) == ids.index(tok.vocab["[PAD]"])
    # type ids flip after the first [SEP]
    sep = tok.vocab["[SEP]"]
    first_sep = ids.index(sep)
    assert types[first_sep] == 0 and types[first_sep + 1] == 1


def test_classification_report_matches_sklearn():
    sk = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    y_true = rng.integers(0, 2, 100)
    y_pred = rng.integers(0, 2, 100)
    rep = classification_report(y_true, y_pred)
    np.testing.assert_allclose(
        rep["macro_f1"], sk.f1_score(y_true, y_pred, average="macro"), rtol=1e-9
    )
    np.testing.assert_allclose(
        rep["per_class"][1]["precision"],
        sk.precision_score(y_true, y_pred), rtol=1e-9,
    )
    assert "macro" in format_report(rep)


def _toy_dataset(tok, n=64, seed=0):
    """Separable: label 1 iff 'positive' appears in the evidence."""
    rng = np.random.default_rng(seed)
    claims, evs, labels = [], [], []
    for i in range(n):
        lab = int(rng.integers(0, 2))
        word = "affirmative positive" if lab else "contrary negative"
        claims.append(f"claim number {i} about topic {int(rng.integers(5))}")
        evs.append(f"evidence text {word} detail {int(rng.integers(5))}")
        labels.append(lab)
    ids, mask, types = tok.encode_batch(list(zip(claims, evs)), max_length=24)
    return ids, mask, types, np.asarray(labels, np.int32)


def test_verdict_learns_separable_task():
    corpus = ["claim number topic evidence text affirmative positive contrary negative detail"]
    tok = WordPieceTokenizer.train(corpus * 2, vocab_size=256, min_count=1)
    cfg = VerdictConfig(
        encoder=dataclasses.replace(TINY, vocab_size=tok.vocab_size),
        learning_rate=1e-3,
        warmup_steps=5,
        total_steps=1000,
        max_length=24,
    )
    ids, mask, types, labels = _toy_dataset(tok, n=128)
    params, history = train_verdict(
        cfg, ids, mask, types, labels, epochs=25, batch_size=16,
        val_fraction=0.1, seed=0,
    )
    logits = verdict_apply(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types)
    )
    acc = float(np.mean(np.argmax(np.asarray(logits), -1) == labels))
    assert acc >= 0.9, f"verdict classifier failed to learn: acc={acc}"


def test_build_examples_gold_and_override():
    claims = [
        Claim(1, "c one", "SUPPORTS", {"Doc_A": [0]}),
        Claim(2, "c two", "REFUTES", {"Doc_B": [1]}),
        Claim(3, "c three", "NOT ENOUGH INFO", {}),
    ]
    sents = {"Doc_A": ["a0 text", "a1 text"], "Doc_B": ["b0", "b1 gold"]}
    ex = build_examples(claims, sents)
    assert len(ex) == 2  # NEI dropped
    assert "Doc A" in ex[0].evidence_text.replace("_", " ") or "Doc" in ex[0].evidence_text
    assert "a0 text" in ex[0].evidence_text
    assert ex[1].label == 0 and "b1 gold" in ex[1].evidence_text

    override = [[("Doc_B", 0)], [("Doc_A", 1)], []]
    ex2 = build_examples(claims, sents, evidence_override=override)
    assert "b0" in ex2[0].evidence_text and "a1 text" in ex2[1].evidence_text
