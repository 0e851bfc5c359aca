"""Parity guard: the C++ sequence tokenizer (``ircl_tokenize_hash_seq``)
must be bit-identical to the Python tokenize+hash fallback in
``HashEmbedFeaturizer.encode_host``.

The C++ path is the training-loop host hot path (encode 67ms -> 2.3ms per
effective-batch-256 step); any divergence silently changes the feature
stream. Tricky ASCII cases live here; non-ASCII rows must route to the
Python fallback unchanged.
"""

import numpy as np
import pytest

from ircl_tpu.models import featurizer as fz
from ircl_tpu.models.featurizer import FeaturizerConfig, HashEmbedFeaturizer

TRICKY_ASCII = [
    "plain lower case words",
    "Mixed CASE And Capitals",
    "punct,uation! split's (brackets) [and] {braces} end.",
    "digits 123 mixed a1b2c3 4x4",
    "",
    "   ",
    "\t\n  \t",
    "a",
    "hyphen-ated co-op e-mail",
    "dots...ellipsis..and.periods",
    "under_scores mix_ed",
    "quotes 'single' \"double\" `back`",
    "semi;colons:and/slashes\\back",
    "x " * 100,  # > max_len tokens: truncation path
    "trailing space ",
    " leading space",
    "repeat repeat repeat repeat",
    "@#$%^&* only symbols",
    "tok1 tok2\ttok3\nnewline",
]


@pytest.fixture(scope="module")
def feat():
    return HashEmbedFeaturizer(
        FeaturizerConfig(dim=16, max_len=12, vocab_buckets=1 << 12)
    )


def _python_only(feat, texts, monkeypatch):
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(fz, "_native_seq_lib", lambda: None)
        return feat.encode_host(texts)


def test_native_matches_python_on_ascii(feat):
    lib = fz._native_seq_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    ids_n, mask_n = feat.encode_host(TRICKY_ASCII)
    ids_p, mask_p = _python_only(feat, TRICKY_ASCII, None)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)


def test_mixed_ascii_unicode_batch(feat):
    lib = fz._native_seq_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    texts = [
        "ascii row one",
        "café naïve résumé",  # non-ASCII -> fallback
        "Björk Δelta",
        "ascii row two",
        "日本語 text",
    ]
    ids_n, mask_n = feat.encode_host(texts)
    ids_p, mask_p = _python_only(feat, texts, None)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)


def test_random_ascii_fuzz(feat):
    lib = fz._native_seq_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    alphabet = list(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "0123456789 .,;:!?-_'\"()[]{}@#$%&*/\\\t\n"
    )
    texts = [
        "".join(rng.choice(alphabet, size=rng.integers(0, 120)))
        for _ in range(64)
    ]
    ids_n, mask_n = feat.encode_host(texts)
    ids_p, mask_p = _python_only(feat, texts, None)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)
