"""Hashed-ngram sparse index: host-side build, HBM-resident CSR, TPU query."""

from ircl_tpu.index.build import build_count_index, CountIndex
from ircl_tpu.index.tfidf import tfidf_transform, doc_freqs_from_postings
from ircl_tpu.index.ranker import TfidfRanker

__all__ = [
    "build_count_index",
    "CountIndex",
    "tfidf_transform",
    "doc_freqs_from_postings",
    "TfidfRanker",
]
