"""Chunked hybrid ranker: doc-range slicing + cross-chunk merge exactness."""

import numpy as np
import pytest

from ircl_tpu.corpus.store import MemoryDocStore
from ircl_tpu.corpus.synthetic import generate
from ircl_tpu.index.build import build_count_index
from ircl_tpu.index.chunked import ChunkedHybridRanker, slice_doc_range
from ircl_tpu.index.ranker import TfidfRanker
from ircl_tpu.index.tfidf import tfidf_transform


@pytest.fixture(scope="module")
def setup():
    wiki = generate(num_docs=300, num_claims=60, seed=5)
    store = MemoryDocStore({d: rec["text"] for d, rec in wiki.docs.items()})
    index = tfidf_transform(
        build_count_index(store, ngram=2, hash_size=1 << 20)
    )
    return index, [c.claim for c in wiki.claims]


def test_slice_doc_range_partitions(setup):
    index, _ = setup
    a = slice_doc_range(index, 0, 120)
    b = slice_doc_range(index, 120, 300)
    assert a.num_docs == 120 and b.num_docs == 180
    assert a.nnz + b.nnz == index.nnz
    np.testing.assert_array_equal(
        a.doc_freqs + b.doc_freqs, index.doc_freqs
    )
    # per-chunk postings renumbered into the local range
    assert a.post_docs.max(initial=0) < 120
    assert b.post_docs.max(initial=0) < 180


@pytest.mark.parametrize("chunk_docs", [97, 150])
def test_chunked_matches_single_ranker(setup, chunk_docs):
    index, claims = setup
    ref = TfidfRanker(index, mode="ragged")
    chunked = ChunkedHybridRanker(
        index, chunk_docs=chunk_docs, df_threshold=8, width_buckets=2
    )
    got_r = ref.closest_docs_batch(claims, k=5)
    got_c = chunked.closest_docs_batch(claims, k=5)
    for (ids_r, sc_r), (ids_c, sc_c) in zip(got_r, got_c):
        assert len(sc_c) == len(sc_r)
        np.testing.assert_allclose(
            np.sort(sc_c), np.sort(sc_r), rtol=1e-5, atol=1e-6
        )
        # ids agree above the k-th score (cut ties are engine-dependent)
        cut = float(np.min(sc_r)) * (1 + 1e-4) + 1e-4 if len(sc_r) else 0.0
        want = {d for d, s in zip(ids_r, sc_r) if s > cut}
        got = {d for d, s in zip(ids_c, sc_c) if s > cut}
        assert got == want


@pytest.mark.parametrize("seed", [0, 1])
def test_chunked_fuzz_random_boundaries(seed):
    """Random corpus sizes x random chunk widths (including a last chunk of
    width 1 and chunk_docs > num_docs) stay parity-exact vs the single
    ragged ranker, with random df thresholds and k."""
    import numpy as np
    from ircl_tpu.corpus.store import MemoryDocStore
    from ircl_tpu.corpus.synthetic import generate
    from ircl_tpu.index.build import build_count_index
    from ircl_tpu.index.tfidf import tfidf_transform

    rng = np.random.default_rng(40 + seed)
    for _ in range(3):
        n = int(rng.integers(30, 260))
        wiki = generate(num_docs=n, num_claims=12, seed=int(rng.integers(1e6)))
        store = MemoryDocStore({d: r["text"] for d, r in wiki.docs.items()})
        index = tfidf_transform(
            build_count_index(store, ngram=2, hash_size=1 << 18)
        )
        claims = [c.claim for c in wiki.claims]
        k = int(rng.integers(1, 7))
        # bias toward awkward boundaries: n-1 gives a width-1 last chunk,
        # n+5 a single chunk wider than the corpus
        chunk_docs = int(rng.choice([n - 1, n + 5, rng.integers(7, n + 1)]))
        df = int(rng.integers(2, 24))
        ref = TfidfRanker(index, mode="ragged")
        chunked = ChunkedHybridRanker(
            index, chunk_docs=chunk_docs, df_threshold=df
        )
        got_r = ref.closest_docs_batch(claims, k=k)
        got_c = chunked.closest_docs_batch(claims, k=k)
        cfg = f"seed={seed} n={n} chunk={chunk_docs} df={df} k={k}"
        for (ids_r, sc_r), (ids_c, sc_c) in zip(got_r, got_c):
            assert len(sc_c) == len(sc_r), cfg
            np.testing.assert_allclose(
                np.sort(sc_c), np.sort(sc_r), rtol=1e-5, atol=1e-6,
                err_msg=cfg,
            )
            if len(sc_r):
                cut = float(np.min(sc_r)) * (1 + 1e-4) + 1e-4
                want = {d for d, s in zip(ids_r, sc_r) if s > cut}
                got = {d for d, s in zip(ids_c, sc_c) if s > cut}
                assert got == want, cfg


def test_chunked_split_cache_roundtrip(setup, tmp_path):
    """split_cache_dir: first construction persists per-chunk artifacts,
    a second construction loads them (bit-identical results), a df
    mismatch is rejected."""
    index, claims = setup
    cache = str(tmp_path / "splits")
    a = ChunkedHybridRanker(
        index, chunk_docs=120, df_threshold=8, split_cache_dir=cache
    )
    import os

    files = sorted(os.listdir(cache))
    assert files == [
        "chunk_0_120.npz", "chunk_120_240.npz", "chunk_240_300.npz"
    ]
    b = ChunkedHybridRanker(
        index, chunk_docs=120, df_threshold=8, split_cache_dir=cache
    )
    got_a = a.closest_docs_batch(claims, k=5)
    got_b = b.closest_docs_batch(claims, k=5)
    for (ia, sa), (ib, sb) in zip(got_a, got_b):
        assert ia == ib
        np.testing.assert_array_equal(sa, sb)
    with pytest.raises(ValueError, match="df_threshold"):
        ChunkedHybridRanker(
            index, chunk_docs=120, df_threshold=16, split_cache_dir=cache
        )
