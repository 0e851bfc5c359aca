"""Host-side text layer: tokenization, hashing, filtering, FEVER corpus parsing."""

from ircl_tpu.corpus.tokenizer import SimpleTokenizer, Tokens
from ircl_tpu.corpus.hashing import murmurhash3_32, hash_token, hash_tokens
from ircl_tpu.corpus.filters import (
    STOPWORDS,
    normalize,
    filter_word,
    filter_ngram,
)
from ircl_tpu.corpus.store import MemoryDocStore, FlatDocStore

__all__ = [
    "SimpleTokenizer",
    "Tokens",
    "murmurhash3_32",
    "hash_token",
    "hash_tokens",
    "STOPWORDS",
    "normalize",
    "filter_word",
    "filter_ngram",
    "MemoryDocStore",
    "FlatDocStore",
]
