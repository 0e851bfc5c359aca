"""Corpus layer tests: tokenizer, filters, hashing, FEVER parsing.

Golden values in this file were produced by running the reference
implementation (``preprocessing/drqa``) on the same inputs; bit-exact
agreement on tokens/ngrams/hashes is the recall-parity contract.
"""

import numpy as np
import pytest

from ircl_tpu.corpus import (
    SimpleTokenizer,
    filter_ngram,
    filter_word,
    hash_token,
    hash_tokens,
    murmurhash3_32,
    normalize,
)
from ircl_tpu.corpus.fever import (
    extract_sentences,
    parse_lines_tab,
)

TOKENIZER = SimpleTokenizer()

# (text, expected uncased words, expected filtered 1..2-grams, expected hashes mod 2^24)
GOLDEN = [
    (
        'The quick brown fox—jumped over 12 lazy dogs!',
        ['the', 'quick', 'brown', 'fox', '—', 'jumped', 'over', '12', 'lazy', 'dogs', '!'],
        ['quick', 'quick brown', 'brown', 'brown fox', 'fox', 'jumped', '12', '12 lazy', 'lazy', 'lazy dogs', 'dogs'],
        [16316365, 2265621, 3382784, 3825602, 5522537, 16686257, 13823765, 11844183, 444745, 16218449, 6035773],
    ),
    (
        'Tesco’s £8/hour pay (for women) vs men: unfair?',
        ['tesco', '’', 's', '£', '8', '/', 'hour', 'pay', '(', 'for', 'women', ')', 'vs', 'men', ':', 'unfair', '?'],
        ['tesco', '£', '£ 8', '8', 'hour', 'hour pay', 'pay', 'women', 'vs', 'vs men', 'men', 'unfair'],
        [2005552, 8806474, 6860248, 9568279, 10409877, 1646069, 8787465, 15855769, 2726847, 15822438, 11435520, 15547509],
    ),
    (
        'Chromosome 22, naïve café — Motörhead',
        ['chromosome', '22', ',', 'naïve', 'café', '—', 'motörhead'],
        ['chromosome', 'chromosome 22', '22', 'naïve', 'naïve café', 'café', 'motörhead'],
        [14594404, 8480060, 6716876, 16756593, 15674816, 11657865, 9478846],
    ),
    ('a the of and', ['a', 'the', 'of', 'and'], [], []),
    ('', [], [], []),
]


@pytest.mark.parametrize("text,words,ngrams,hashes", GOLDEN)
def test_tokenize_ngrams_hash_golden(text, words, ngrams, hashes):
    toks = TOKENIZER.tokenize(normalize(text))
    # Golden literals are NFC in this source file; the pipeline emits NFD.
    assert toks.words(uncased=True) == [normalize(w) for w in words]
    got_ngrams = toks.ngrams(n=2, uncased=True, filter_fn=filter_ngram)
    assert got_ngrams == [normalize(g) for g in ngrams]
    assert [hash_token(w, 2**24) for w in got_ngrams] == hashes


# sklearn.utils.murmurhash3_32(s, positive=True) golden values.
MURMUR_GOLDEN = {
    'hello': 613153351,
    'the cat': 1192667458,
    'tesco': 3911096880,
    'über': 2684790572,
    '': 0,
    'a': 1009084850,
}


def test_murmurhash_golden():
    for s, h in MURMUR_GOLDEN.items():
        assert murmurhash3_32(s) == h


def test_murmurhash_batch_matches_scalar():
    tokens = list(MURMUR_GOLDEN) + ['quick brown', 'naïve café', 'x' * 37]
    batch = hash_tokens(tokens, 2**24)
    scalar = np.array([murmurhash3_32(t) % 2**24 for t in tokens])
    np.testing.assert_array_equal(batch, scalar)


def test_murmurhash_against_sklearn_if_available():
    sklearn = pytest.importorskip("sklearn.utils")
    import random

    rng = random.Random(0)
    alphabet = 'abcdefghijklmnopqrstuvwxyz éßü— '
    for _ in range(200):
        s = ''.join(rng.choice(alphabet) for _ in range(rng.randrange(0, 24)))
        assert murmurhash3_32(s) == sklearn.murmurhash3_32(s, positive=True)


def test_filter_word():
    assert filter_word('the')
    assert filter_word('!')
    assert filter_word('...')
    assert not filter_word('fox')
    assert not filter_word('£')  # currency symbol is not \p{P}
    assert filter_word("n't")


def test_filter_ngram_modes():
    assert filter_ngram(['the', 'fox'], mode='any')
    assert not filter_ngram(['the', 'fox'], mode='all')
    assert filter_ngram(['the', 'fox'], mode='ends')
    assert not filter_ngram(['quick', 'the', 'fox'], mode='ends')
    with pytest.raises(ValueError):
        filter_ngram(['x'], mode='bogus')


def test_ngram_enumeration_order():
    toks = TOKENIZER.tokenize('alpha beta gamma')
    grams = toks.ngrams(n=2, uncased=True)
    assert grams == ['alpha', 'alpha beta', 'beta', 'beta gamma', 'gamma']
    spans = toks.ngrams(n=2, uncased=True, as_strings=False)
    assert spans == [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]


def test_parse_lines_tab():
    lines = "0\tFirst sentence .\tAnchor\n1\tSecond sentence .\n2\t"
    sents = parse_lines_tab(lines)
    assert sents == ["First sentence . Anchor", "Second sentence .", ""]


def test_extract_sentences_accepts_and_rejects():
    # Heuristic parser: needs trailing count digit, > 2 sentences.
    # The trailing count line must satisfy the reference's text[-3:] digit
    # heuristic (docs_sentence_extraction.py:21-24).
    good = (
        "0\tAlpha is a letter .\n"
        "1\tBeta follows alpha .\n"
        "2\tGamma -LRB- third -RRB- comes next .\n"
        "3\tDelta ends the doc .\n 4"
    )
    doc = extract_sentences(good)
    # Reference output on this fixture:
    assert doc == [
        'Alpha is a letter.',
        'Beta follows alpha.',
        'Gamma  third  comes next.',
        'Delta ends the doc.',
    ]

    assert extract_sentences("no trailing digit") is None
    assert extract_sentences("0\tOne .\n1\tTwo .\n2") is None  # length <= 2


def test_regexp_tokenizer_ptb_conventions():
    from ircl_tpu.corpus.tokenizer import get_tokenizer

    t = get_tokenizer("regexp")
    assert t.tokenize("Don't stop--we can't!").words() == [
        "Do", "n't", "stop", "--", "we", "ca", "n't", "!",
    ]
    assert t.tokenize("The U.S. grew 3.5% in 2020...").words() == [
        "The", "U.S.", "grew", "3.5", "%", "in", "2020", "...",
    ]
    assert t.tokenize("Tesco's state-of-the-art line").words() == [
        "Tesco", "'s", "state-of-the-art", "line",
    ]


def test_tokenizer_registry():
    import pytest as _pytest

    from ircl_tpu.corpus.tokenizer import RegexpTokenizer, SimpleTokenizer, get_tokenizer

    assert isinstance(get_tokenizer("simple"), SimpleTokenizer)
    assert isinstance(get_tokenizer("regexp"), RegexpTokenizer)
    with _pytest.raises(ValueError):
        get_tokenizer("corenlp")
