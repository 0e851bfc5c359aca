"""Document-frequency split of the sparse index (hybrid scoring).

Posting mass in a hashed-ngram index is power-law: a few thousand common
terms own most postings, while the discriminative terms (entities, rare
bigrams) have tiny document frequency. The hybrid scorer exploits this:

- **heavy terms** (df > threshold): doc-major ELL, scored by the Pallas
  membership slab. The per-doc heavy width K_h and the per-batch heavy union
  are both much smaller than their full-index counterparts, cutting the
  slab's U*N*K compare cost by ~an order of magnitude.
- **light terms** (df <= threshold): term-major postings kept host-side;
  a query's light posting pool is at most T * threshold entries, gathered by
  vectorized numpy (contiguous CSR slices — the one pattern CPUs do well)
  and shipped to the device as a tiny dense pool.

Exact merge (``ops/hybrid.py``): scores = H + L with H, L >= 0, so
top-k(H+L) is contained in top-k(H) union {docs with L > 0}; both parts are
computed exactly and the stale heavy-only duplicates are masked out.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from ircl_tpu.index.build import CountIndex
from ircl_tpu.index.ell import EllIndex, to_ell


@dataclass
class SplitIndex:
    heavy: EllIndex  # doc-major, heavy terms only
    # light term-major postings (full-width indptr; heavy rows empty)
    light_indptr: np.ndarray  # [hash_size + 1] int64
    light_docs: np.ndarray  # [nnz_light] int32
    light_vals: np.ndarray  # [nnz_light] float32
    df_threshold: int
    num_docs: int
    hash_size: int
    doc_freqs: np.ndarray  # full df vector (query-side routing + idf)


def split_index(index: CountIndex, df_threshold: int = 128) -> SplitIndex:
    heavy_mask_term = index.doc_freqs > df_threshold  # [hash_size]
    term_of_posting = np.repeat(
        np.arange(index.hash_size, dtype=np.int64), np.diff(index.indptr)
    )
    posting_is_heavy = heavy_mask_term[term_of_posting]

    # heavy sub-index -> ELL
    heavy_counts = np.where(heavy_mask_term, index.doc_freqs, 0)
    heavy_indptr = np.zeros(index.hash_size + 1, dtype=np.int64)
    np.cumsum(heavy_counts, out=heavy_indptr[1:])
    heavy_sub = CountIndex(
        hash_size=index.hash_size,
        ngram=index.ngram,
        doc_ids=index.doc_ids,
        indptr=heavy_indptr,
        post_docs=index.post_docs[posting_is_heavy],
        post_vals=index.post_vals[posting_is_heavy],
        doc_freqs=heavy_counts.astype(np.int32),
        weighted=index.weighted,
    )
    heavy_ell = to_ell(heavy_sub)

    light_counts = np.where(~heavy_mask_term, index.doc_freqs, 0)
    light_indptr = np.zeros(index.hash_size + 1, dtype=np.int64)
    np.cumsum(light_counts, out=light_indptr[1:])

    return SplitIndex(
        heavy=heavy_ell,
        light_indptr=light_indptr,
        light_docs=index.post_docs[~posting_is_heavy],
        light_vals=index.post_vals[~posting_is_heavy],
        df_threshold=df_threshold,
        num_docs=index.num_docs,
        hash_size=index.hash_size,
        doc_freqs=index.doc_freqs,
    )


def gather_light_pools(
    split: SplitIndex,
    buckets: np.ndarray,  # [B, T] int32 query buckets
    weights: np.ndarray,  # [B, T] f32 query weights
    pool_floor: int = 128,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Per-query light posting pools (docs [B, NNZ], w*val contribs [B, NNZ]).

    Vectorized numpy ragged gather over contiguous CSR slices; NNZ is the
    batch max rounded to a power of two (compile-shape bucketing). Padding
    entries carry doc id = num_docs and contribution 0.
    """
    B, T = buckets.shape
    is_light = (weights != 0.0) & (
        split.doc_freqs[buckets] <= split.df_threshold
    )
    starts = split.light_indptr[buckets]  # [B, T]
    lens = np.where(is_light, np.diff(split.light_indptr)[buckets], 0)

    cum = np.zeros((B, T + 1), dtype=np.int64)
    np.cumsum(lens, axis=1, out=cum[:, 1:])
    totals = cum[:, -1]
    nnz = pool_floor
    while nnz < totals.max(initial=0):
        nnz *= 2

    docs = np.full((B, nnz), split.num_docs, dtype=np.int32)
    contribs = np.zeros((B, nnz), dtype=np.float32)

    # Flatten all (query, term) segments into one index expression.
    b_idx, t_idx = np.nonzero(lens)
    seg_lens = lens[b_idx, t_idx]
    seg_starts = starts[b_idx, t_idx]
    seg_out0 = cum[b_idx, t_idx]
    seg_w = weights[b_idx, t_idx]
    if len(seg_lens):
        flat_total = int(seg_lens.sum())
        seg_offsets = np.zeros(len(seg_lens) + 1, dtype=np.int64)
        np.cumsum(seg_lens, out=seg_offsets[1:])
        within = np.arange(flat_total, dtype=np.int64) - np.repeat(
            seg_offsets[:-1], seg_lens
        )
        src = np.repeat(seg_starts, seg_lens) + within
        dst_col = np.repeat(seg_out0, seg_lens) + within
        dst_row = np.repeat(b_idx, seg_lens)
        docs[dst_row, dst_col] = split.light_docs[src]
        contribs[dst_row, dst_col] = split.light_vals[src] * np.repeat(
            seg_w, seg_lens
        )
    return docs, contribs, nnz
