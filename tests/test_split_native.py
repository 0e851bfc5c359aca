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


def test_assemble_csr_scatter_matches_lexsort():
    """The C++ counting-sort CSR scatter must reproduce the lexsort path
    bit-exactly for doc-major COO input, and assemble_csr must fall back to
    lexsort for non-doc-major input (still correct, just slower)."""
    from ircl_tpu.index import build as B

    rng = np.random.default_rng(4)
    HASH = 1 << 14
    rows, cols, vals = [], [], []
    for d in range(500):
        terms = np.unique(rng.integers(0, HASH, size=rng.integers(1, 30)))
        rows.extend(terms.tolist())
        cols.extend([d] * len(terms))
        vals.extend(rng.integers(1, 5, size=len(terms)).tolist())
    args = (
        np.asarray(rows, np.int64),
        np.asarray(cols, np.int32),
        np.asarray(vals, np.int32),
        HASH,
        2,
        [str(i) for i in range(500)],
    )
    fast = B.assemble_csr(*args)
    real = B._native_csr_lib
    try:
        B._native_csr_lib = lambda: None
        ref = B.assemble_csr(*args)
    finally:
        B._native_csr_lib = real
    np.testing.assert_array_equal(fast.indptr, ref.indptr)
    np.testing.assert_array_equal(fast.post_docs, ref.post_docs)
    np.testing.assert_array_equal(fast.post_vals, ref.post_vals)
    np.testing.assert_array_equal(fast.doc_freqs, ref.doc_freqs)

    # shuffled (non-doc-major) input: must route to lexsort and still give
    # a doc-ascending CSR identical to sorting the doc-major input
    perm = rng.permutation(len(rows))
    shuffled = B.assemble_csr(
        args[0][perm], args[1][perm], args[2][perm], HASH, 2, args[5]
    )
    np.testing.assert_array_equal(shuffled.indptr, ref.indptr)
    np.testing.assert_array_equal(shuffled.post_docs, ref.post_docs)
    np.testing.assert_array_equal(shuffled.post_vals, ref.post_vals)


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
