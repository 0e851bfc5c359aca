"""Round-trip IO, optimizer variants, and store tests."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ircl_tpu.contrastive.state import TrainConfig, init_train_state, make_optimizer
from ircl_tpu.corpus.store import FlatDocStore, MemoryDocStore
from ircl_tpu.corpus.synthetic import generate
from ircl_tpu.index.build import build_count_index, CountIndex
from ircl_tpu.index.tfidf import tfidf_transform
from ircl_tpu.models.encoder import EncoderConfig


def test_count_index_save_load_roundtrip(tmp_path):
    wiki = generate(num_docs=20, num_claims=2, seed=1)
    store = MemoryDocStore({d: r["text"] for d, r in wiki.docs.items()})
    index = tfidf_transform(build_count_index(store, ngram=2, hash_size=1 << 16))
    path = str(tmp_path / "idx.npz")
    index.save(path)
    loaded = CountIndex.load(path)
    assert loaded.weighted and loaded.hash_size == index.hash_size
    np.testing.assert_array_equal(loaded.indptr, index.indptr)
    np.testing.assert_array_equal(loaded.post_docs, index.post_docs)
    np.testing.assert_allclose(loaded.post_vals, index.post_vals)
    assert loaded.doc_ids == index.doc_ids


def test_flat_doc_store_roundtrip(tmp_path):
    docs = {
        "Motörhead": {"text": "a band.", "lines": "0\ta band ."},
        "Plain_Doc": {"text": "plain text", "lines": "0\tplain text"},
    }
    path = str(tmp_path / "store.json")
    store = FlatDocStore.write(path, docs)
    assert len(store) == 2
    # NFD and NFC forms of the same id both resolve
    import unicodedata

    nfc = unicodedata.normalize("NFC", "Motörhead")
    assert store.get_doc_text(nfc) == "a band."
    assert store.get_doc_lines("Plain_Doc") == "0\tplain text"
    assert store.get_doc_text("Missing") is None

    reopened = FlatDocStore(path)
    assert set(reopened.get_doc_ids()) == set(store.get_doc_ids())


def test_sgd_cosine_optimizer_decays():
    cfg = TrainConfig(
        encoder=EncoderConfig(input_size=8, hidden_size=4, output_size=4, num_layers=1),
        optimizer="sgd",
        learning_rate=3e-4,
        total_steps=100,
        queue_size=8,
        micro_batch=4,
        accum_steps=1,
    )
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((4, 4))}
    opt_state = tx.init(params)
    grads = {"w": jnp.ones((4, 4))}

    # First step moves params; after total_steps the cosine lr is ~0 so the
    # update magnitude collapses.
    updates1, opt_state = tx.update(grads, opt_state, params)
    mag1 = float(jnp.abs(updates1["w"]).max())
    for _ in range(99):
        updates, opt_state = tx.update(grads, opt_state, params)
    mag_end = float(jnp.abs(updates["w"]).max())
    assert mag1 > 0
    assert mag_end < mag1 * 0.2


def test_vectorize_fixed_max_terms_truncates():
    from ircl_tpu.index.ranker import vectorize_queries

    df = np.zeros(1 << 16, np.int32)
    buckets, weights = vectorize_queries(
        ["alpha beta gamma delta epsilon zeta", "iota"],
        1 << 16,
        1,
        df,
        10,
        max_terms=3,
    )
    assert buckets.shape == (2, 3)
    assert (weights[0] != 0).sum() == 3  # truncated to 3 slots
    assert (weights[1] != 0).sum() == 1


def test_throughput_meter():
    from ircl_tpu.utils.profiling import Throughput

    t = Throughput()
    t.add(10)
    assert t.rate() > 0
