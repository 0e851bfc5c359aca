"""Backed-tokenizer tests with injected backends.

The spaCy model and CoreNLP jars don't exist in this environment, so the
mapping logic — spaCy doc -> ``Tokens`` and the CoreNLP JSON pipe protocol
-> ``Tokens`` — is exercised through the injection seams
(``SpacyTokenizer(nlp=...)``, ``CoreNLPTokenizer(cmd=...)``). The scripted
CoreNLP backend reproduces the real pipeline's interleaved banner noise and
JSON shape (sentences[].tokens[] with characterOffset*, pos/lemma/ner).
"""

import json
import sys
import textwrap
from dataclasses import dataclass, field

import pytest

from ircl_tpu.corpus.tokenizer import (
    CoreNLPTokenizer,
    SpacyTokenizer,
    Tokens,
    get_tokenizer,
)


# ---------------------------------------------------------------- spaCy ----

@dataclass
class FakeTok:
    text: str
    idx: int
    tag_: str = "NN"
    lemma_: str = ""
    ent_type_: str = ""

    def __post_init__(self):
        if not self.lemma_:
            self.lemma_ = self.text.lower()


def fake_nlp(text):
    toks, pos = [], 0
    for w in text.split(" "):
        if w:
            ent = "PERSON" if w[0].isupper() else ""
            toks.append(FakeTok(w, pos, ent_type_=ent))
        pos += len(w) + 1
    return toks


def test_spacy_mapping_with_annotators():
    tok = SpacyTokenizer(annotators=("pos", "lemma", "ner"), nlp=fake_nlp)
    t = tok.tokenize("Alice met\nBob")
    assert t.words() == ["Alice", "met", "Bob"]  # newline flattened
    assert t.offsets() == [(0, 5), (6, 9), (10, 13)]
    assert t.lemmas() == ["alice", "met", "bob"]
    assert t.pos() == ["NN", "NN", "NN"]
    assert t.entities() == ["PERSON", "", "PERSON"]
    # ngrams ride the same Tokens container as the index tokenizers
    assert "alice met" in t.ngrams(n=2, uncased=True)


def test_spacy_no_annotators_yields_none():
    t = SpacyTokenizer(nlp=fake_nlp).tokenize("a b")
    assert t.words() == ["a", "b"]
    assert t.pos() is None and t.lemmas() is None and t.entities() is None


def test_spacy_rejects_unknown_annotator():
    with pytest.raises(ValueError, match="unknown annotators"):
        SpacyTokenizer(annotators=("parse",), nlp=fake_nlp)


def test_spacy_without_backend_raises_import_error():
    if "spacy" in sys.modules:  # pragma: no cover - only offline asserted
        pytest.skip("spacy installed")
    with pytest.raises(ModuleNotFoundError):
        get_tokenizer("spacy")


# -------------------------------------------------------------- CoreNLP ----

BACKEND = textwrap.dedent(
    """
    import json, sys
    print("[banner] loading pipeline...")   # noise before any JSON
    print("NLP> ", end="", flush=True)
    for line in sys.stdin:
        text = line.rstrip("\\n")
        toks, pos = [], 0
        for w in text.split(" "):
            if w:
                toks.append({
                    "word": w,
                    "characterOffsetBegin": pos,
                    "characterOffsetEnd": pos + len(w),
                    "pos": "NNP" if w[0].isupper() else "NN",
                    "lemma": w.lower(),
                    "ner": "PERSON" if w[0].isupper() else "O",
                })
            pos += len(w) + 1
        print(json.dumps({"sentences": [{"tokens": toks}]}), flush=True)
        print("NLP> ", end="", flush=True)
    """
)


def _corenlp(annotators=()):
    return CoreNLPTokenizer(
        annotators=annotators, cmd=[sys.executable, "-c", BACKEND]
    )


def test_corenlp_protocol_and_mapping():
    tok = _corenlp(annotators=("pos", "lemma", "ner"))
    try:
        t = tok.tokenize("Alice met Bob")
        assert t.words() == ["Alice", "met", "Bob"]
        assert t.offsets() == [(0, 5), (6, 9), (10, 13)]
        assert t.pos() == ["NNP", "NN", "NNP"]
        assert t.lemmas() == ["alice", "met", "bob"]
        # 'O' maps to '' like the reference's non_ent option
        assert t.entities() == ["PERSON", "", "PERSON"]
        # a second call reuses the live subprocess
        assert tok.tokenize("x y").words() == ["x", "y"]
        # braces inside tokenized text land in JSON string values and must
        # not confuse the brace-balanced reader
        assert tok.tokenize("a { b } c").words() == ["a", "{", "b", "}", "c"]
    finally:
        tok.close()


def test_corenlp_requires_classpath(monkeypatch):
    monkeypatch.delenv("CLASSPATH", raising=False)
    with pytest.raises(ValueError, match="classpath"):
        CoreNLPTokenizer()  # no cmd and no $CLASSPATH


def test_corenlp_dead_backend_errors():
    tok = CoreNLPTokenizer(cmd=[sys.executable, "-c", "pass"])
    with pytest.raises(IOError, match="terminated"):
        tok.tokenize("x")


def test_registry_exposes_all_four():
    assert isinstance(get_tokenizer("simple").tokenize("a b"), Tokens)
    assert isinstance(get_tokenizer("regexp").tokenize("a b"), Tokens)
    with pytest.raises(ValueError, match="invalid tokenizer"):
        get_tokenizer("nope")
