"""Hashed-ngram sparse index: host-side build, HBM-resident CSR, TPU query."""

from ircl_tpu.index.build import build_count_index, CountIndex
from ircl_tpu.index.chunked import ChunkedHybridRanker
from ircl_tpu.index.ranker import TfidfRanker
from ircl_tpu.index.split import load_split, save_split, split_index
from ircl_tpu.index.tfidf import tfidf_transform, doc_freqs_from_postings

__all__ = [
    "build_count_index",
    "CountIndex",
    "ChunkedHybridRanker",
    "tfidf_transform",
    "doc_freqs_from_postings",
    "TfidfRanker",
    "split_index",
    "save_split",
    "load_split",
]
