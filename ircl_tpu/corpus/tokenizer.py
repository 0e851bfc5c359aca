"""Regex tokenizer and ngram generation.

``SimpleTokenizer`` reproduces the token stream of the reference's live
tokenizer (``preprocessing/drqa/tokenizers/simple_tokenizer.py:18-57``):
alternation of unicode alphanumeric runs with single non-whitespace chars.
``Tokens.ngrams`` reproduces the 1..n-gram enumeration with filtering
(``preprocessing/drqa/tokenizers/tokenizer.py:79-104``). Together with
``filters`` and ``hashing`` this fixes the exact feature space of the sparse
index — any deviation breaks recall parity.

Unlike the reference there is no tokenizer class registry / annotator
machinery: the index pipeline only ever needs word streams, so ``Tokens`` is a
thin list-of-strings wrapper.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import regex


class Tokens:
    """Tokenized text: word list plus character spans."""

    __slots__ = ("_words", "_spans")

    def __init__(self, words: List[str], spans: Optional[List[tuple]] = None):
        self._words = words
        self._spans = spans

    def __len__(self) -> int:
        return len(self._words)

    def words(self, uncased: bool = False) -> List[str]:
        if uncased:
            return [w.lower() for w in self._words]
        return list(self._words)

    def offsets(self) -> Optional[List[tuple]]:
        return list(self._spans) if self._spans is not None else None

    def ngrams(
        self,
        n: int = 1,
        uncased: bool = False,
        filter_fn: Optional[Callable[[Sequence[str]], bool]] = None,
        as_strings: bool = True,
    ):
        """All ngrams of length 1..n, space-joined when ``as_strings``.

        Matches reference ``Tokens.ngrams`` exactly, including enumeration
        order (by start position, then length).
        """
        words = self.words(uncased)
        L = len(words)
        out = []
        for s in range(L):
            for e in range(s, min(s + n, L)):
                gram = words[s : e + 1]
                if filter_fn is not None and filter_fn(gram):
                    continue
                out.append((s, e + 1))
        if as_strings:
            return [' '.join(words[s:e]) for (s, e) in out]
        return out


class SimpleTokenizer:
    """Unicode alphanumeric / single-char tokenizer (reference-compatible)."""

    ALPHA_NUM = r'[\p{L}\p{N}\p{M}]+'
    NON_WS = r'[^\p{Z}\p{C}]'

    def __init__(self):
        self._regexp = regex.compile(
            '(%s)|(%s)' % (self.ALPHA_NUM, self.NON_WS),
            flags=regex.IGNORECASE + regex.UNICODE + regex.MULTILINE,
        )

    def tokenize(self, text: str) -> Tokens:
        words = []
        spans = []
        for m in self._regexp.finditer(text):
            words.append(m.group())
            spans.append(m.span())
        return Tokens(words, spans)


class RegexpTokenizer:
    """PTB-convention tokenizer (reference ``regexp_tokenizer.py`` provides
    an equivalent; the live index pipeline never uses it — it exists for
    users who want PTB-style tokens instead of ``simple`` ones).

    Built independently from PTB conventions: contractions and possessives
    split off ("don't" -> "do", "n't"), abbreviations and decimal numbers
    stay whole, multi-char punctuation runs (``...``, ``--``) group.
    """

    PATTERN = r"""(?x)
        \p{N}+(?:[.,]\p{N}+)*            # numbers incl. decimals/thousands
      | (?:[A-Za-z]\.){2,}               # abbreviations like U.S.
      | [\p{L}\p{M}]+(?='(?:[sSdDmM]|ll|LL|re|RE|ve|VE)\b)  # stem before 's 'll...
      | [\p{L}\p{M}]+(?=[nN]'[tT]\b)     # stem before the n't clitic
      | [nN]'[tT]\b                      # negation clitic
      | '(?:[sSdDmM]|ll|LL|re|RE|ve|VE)\b  # the clitics themselves
      | [\p{L}\p{M}\p{N}]+(?:[-'][\p{L}\p{M}\p{N}]+)*  # words w/ hyphens & inner apostrophes
      | \.\.\.+ | --+                     # ellipses, dashes
      | [^\p{Z}\p{C}]                     # any other visible char
    """

    def __init__(self):
        self._regexp = regex.compile(
            self.PATTERN, flags=regex.UNICODE + regex.MULTILINE
        )

    def tokenize(self, text: str) -> Tokens:
        words, spans = [], []
        for m in self._regexp.finditer(text):
            words.append(m.group())
            spans.append(m.span())
        return Tokens(words, spans)


_REGISTRY = {"simple": SimpleTokenizer, "regexp": RegexpTokenizer}


def get_tokenizer(name: str):
    """Name -> tokenizer instance (reference registry surface,
    ``tokenizers/__init__.py:31-41``; 'spacy'/'corenlp' are not provided —
    their backends don't exist in this environment and the reference's own
    spacy import is broken)."""
    try:
        return _REGISTRY[name]()
    except KeyError:
        raise ValueError(f"invalid tokenizer: {name}") from None


_DEFAULT_TOKENIZER: Optional[SimpleTokenizer] = None


def default_tokenizer() -> SimpleTokenizer:
    """Shared tokenizer instance (the reference re-instantiates per call in
    ``src/evaluation.py:58``; we deliberately do not)."""
    global _DEFAULT_TOKENIZER
    if _DEFAULT_TOKENIZER is None:
        _DEFAULT_TOKENIZER = SimpleTokenizer()
    return _DEFAULT_TOKENIZER
