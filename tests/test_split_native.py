"""Parity: the C++ two-pass df-split fill (``ircl_split_widths`` /
``ircl_split_fill``) must be bit-identical to the numpy reference
(``index/split.py::_split_index_np``) — the heavy ELL layout, the light CSR
arrays, and every edge case (all-heavy, all-light, empty docs)."""

from __future__ import annotations

import numpy as np
import pytest

from ircl_tpu.corpus.store import MemoryDocStore
from ircl_tpu.corpus.synthetic import generate
from ircl_tpu.index.build import build_count_index
from ircl_tpu.index.split import (
    _native_split_lib,
    _split_index_np,
    split_index,
)
from ircl_tpu.index.tfidf import tfidf_transform


def _index(ndocs=1500, seed=3, hash_size=1 << 18):
    wiki = generate(num_docs=ndocs, num_claims=4, seed=seed)
    store = MemoryDocStore({d: r["text"] for d, r in wiki.docs.items()})
    return tfidf_transform(
        build_count_index(store, ngram=2, hash_size=hash_size)
    )


def _assert_split_equal(a, b):
    np.testing.assert_array_equal(a.heavy.terms, b.heavy.terms)
    np.testing.assert_array_equal(a.heavy.vals, b.heavy.vals)
    np.testing.assert_array_equal(a.light_indptr, b.light_indptr)
    np.testing.assert_array_equal(a.light_docs, b.light_docs)
    np.testing.assert_array_equal(a.light_vals, b.light_vals)
    assert a.heavy.num_docs == b.heavy.num_docs
    assert a.heavy.hash_size == b.heavy.hash_size


@pytest.mark.skipif(
    _native_split_lib() is None, reason="native library unavailable"
)
@pytest.mark.parametrize("df_threshold", [0, 7, 32, 10**9])
def test_native_split_matches_numpy(df_threshold):
    index = _index()
    _assert_split_equal(
        split_index(index, df_threshold=df_threshold),
        _split_index_np(index, df_threshold=df_threshold),
    )


@pytest.mark.skipif(
    _native_split_lib() is None, reason="native library unavailable"
)
def test_native_split_unweighted_counts():
    """Unweighted (raw count) index — integer vals path."""
    wiki = generate(num_docs=800, num_claims=4, seed=9)
    store = MemoryDocStore({d: r["text"] for d, r in wiki.docs.items()})
    index = build_count_index(store, ngram=2, hash_size=1 << 17)
    _assert_split_equal(
        split_index(index, df_threshold=12),
        _split_index_np(index, df_threshold=12),
    )
