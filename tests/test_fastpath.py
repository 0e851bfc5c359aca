"""C++ ASCII fast-path vectorizer: bit-exact parity with the Python path."""

import numpy as np
import pytest

from ircl_tpu.corpus import hashing
from ircl_tpu.corpus.fastpath import _python_vectorize_one, batch_vectorize
from ircl_tpu.corpus.filters import normalize

TEXTS = [
    "The quick brown fox jumped over 12 lazy dogs!",
    "Tesco's pay (for women) vs men: unfair?",
    "a the of and",  # all stopwords -> empty
    "",
    "x",
    "Solar panels; wind turbines -- and $5 worth of cable + 3 bolts.",
    "don't can't won't n't standalone",
    "A.B.C. acronym-like punctuation...bursts!!!",
    "The committee approved the solar farm proposal after a lengthy debate.",
    "MiXeD CaSe TOKENS and Numbers 42x7",
    "semi;colon:duo [brackets] {braces} _underscores_ @ats #hash %pct",
    "symbols survive: $ + < = > ^ ` | ~",
    "naïve café — Motörhead",  # non-ASCII -> python fallback path
]


@pytest.mark.skipif(not hashing.native_available(), reason="native lib missing")
@pytest.mark.parametrize("hash_size", [2**16, 2**24])
def test_fastpath_matches_python(hash_size):
    got = batch_vectorize(TEXTS, hash_size, ngram=2)
    for text, (b, c) in zip(TEXTS, got):
        eb, ec = _python_vectorize_one(normalize(text), hash_size, 2)
        np.testing.assert_array_equal(b, eb, err_msg=f"buckets differ: {text!r}")
        np.testing.assert_array_equal(c, ec, err_msg=f"counts differ: {text!r}")


@pytest.mark.skipif(not hashing.native_available(), reason="native lib missing")
def test_fastpath_unigram_only():
    got = batch_vectorize(TEXTS[:6], 2**20, ngram=1)
    for text, (b, c) in zip(TEXTS[:6], got):
        eb, ec = _python_vectorize_one(normalize(text), 2**20, 1)
        np.testing.assert_array_equal(b, eb)
        np.testing.assert_array_equal(c, ec)


@pytest.mark.skipif(not hashing.native_available(), reason="native lib missing")
def test_fastpath_capacity_growth():
    # Force the retry path with a long text.
    long_text = " ".join(f"word{i} token{i}" for i in range(3000))
    got = batch_vectorize([long_text], 2**24, ngram=2)
    eb, ec = _python_vectorize_one(normalize(long_text), 2**24, 2)
    np.testing.assert_array_equal(got[0][0], eb)
    np.testing.assert_array_equal(got[0][1], ec)
