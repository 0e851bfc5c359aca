"""Real-FEVER-format golden fixtures through the full ingestion chain.

The ingestion path (``corpus/prepare.py``, ``corpus/fever.py``) had only ever
parsed synthetic text; these hand-written fixtures reproduce the real dump's
quirks so any ``lines``-parsing or normalization bug is caught before real
data ever arrives:

- anchor tab-fields after sentences (tab-split parser joins them,
  reference ``src/dataset.py:26-31``),
- the heuristic extractor's trailing-count requirement — the ``lines`` string
  must END with an empty numbered row ``\\nN\\t`` whose digits are the
  sentence count (reference ``docs_sentence_extraction.py:19-27``),
- unicode doc ids: composed vs decomposed (NFC/NFD) and compatibility
  (fullwidth) forms that must unify under NFKD
  (reference ``extract_wiki.py:21``, ``src/dataset.py:55``),
- NFKD id collisions across shard records (last record wins),
- empty ``lines`` fields, empty mid-document sentences,
- a malformed document where the reference's extractor would crash on
  ``min([])`` (``docs_sentence_extraction.py:38-46``) — ours must reject it,
- a NOT-ENOUGH-INFO claim with null evidence entries,
- multi-evidence-set flattening (``src/dataset.py:37-70``).

Fixtures live in ``tests/fixtures/fever/`` (2 wiki shards, train + dev
jsonl). The end-to-end test runs prepare -> build-index -> retrieve ->
recall over them.
"""

import json
import os
import unicodedata

import numpy as np
import pytest

from ircl_tpu.corpus import fever

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "fever")

BEYONCE = unicodedata.normalize("NFKD", "Beyoncé_Knowles")
SAVAGES = "Savages_-LRB-2012_film-RRB-"
TOKYO = "Tokyo"


def shard_records():
    recs = []
    for name in ("wiki-001.jsonl", "wiki-002.jsonl"):
        recs.extend(fever.iter_wiki_jsonl(os.path.join(FIX, name)))
    return {r["id"]: r for r in recs}


# ---------------------------------------------------------------- parsers


def test_tab_split_joins_anchor_fields():
    recs = shard_records()
    sents = fever.parse_lines_tab(recs["Beyoncé_Knowles"]["lines"])
    # anchors ("Houston", "Texas") are tab-fields joined into the sentence
    assert sents[0] == (
        "Beyoncé Knowles is an American singer songwriter and actress "
        "born in Houston Texas . Houston Texas"
    )
    # trailing empty numbered row parses to an empty sentence slot
    assert sents[4] == ""
    assert len(sents) == 5


def test_tab_split_empty_lines_field():
    assert fever.parse_lines_tab("") == [""]


def test_heuristic_extractor_good_doc_strips_artifacts():
    recs = shard_records()
    doc = fever.extract_sentences(recs[SAVAGES]["lines"])
    assert doc is not None and len(doc) == 4
    # -LRB- / -RRB- artifact tokens removed word-wise
    assert "-LRB-" not in doc[1] and "-RRB-" not in doc[1]
    assert "novel of the same name" in doc[1]


def test_heuristic_extractor_requires_trailing_count():
    recs = shard_records()
    # Naruto's lines end with a real sentence, not "\nN\t": rejected even
    # though the tab-split parser reads 3 sentences fine.
    assert fever.extract_sentences(recs["Naruto"]["lines"]) is None
    assert len(fever.parse_lines_tab(recs["Naruto"]["lines"])) == 3


def test_heuristic_extractor_drops_short_and_empty_docs():
    recs = shard_records()
    liech = "Liechtenstein_national_football_team"
    assert fever.extract_sentences(recs[liech]["lines"]) is None  # count<=2
    assert fever.extract_sentences("") is None  # empty lines field


def test_heuristic_extractor_rejects_reference_crash_case():
    # Trailing digit present but no ".\t"/".\n"/"1\t" marker: the reference
    # raises ValueError on min([]) here; we must reject cleanly.
    recs = shard_records()
    malformed = recs["Malformed_Doc"]["lines"]
    assert malformed[-3:].strip().isdigit()  # the heuristic's precondition
    assert fever.extract_sentences(malformed) is None


# ----------------------------------------------------------- claim jsonl


def test_claims_unicode_and_nei_and_multiset():
    claims = fever.parse_claims_jsonl(os.path.join(FIX, "shared_task_dev.jsonl"))
    assert len(claims) == 5
    by_id = {c.id: c for c in claims}

    # decomposed evidence id unifies with the composed wiki id under NFKD
    raw = json.loads(
        open(os.path.join(FIX, "shared_task_dev.jsonl"), encoding="utf-8")
        .readlines()[0]
    )
    assert raw["evidence"][0][0][2] != "Beyoncé_Knowles"  # truly NFD
    assert list(by_id[2001].evidences) == [BEYONCE]

    # NEI claim: null doc entries contribute no evidence; drop_nei removes it
    assert by_id[2004].evidences == {}
    kept = fever.parse_claims_jsonl(
        os.path.join(FIX, "shared_task_dev.jsonl"), drop_nei=True
    )
    assert {c.id for c in kept} == {2001, 2002, 2003, 2005}

    # multi-evidence-set flattening appends per doc across sets
    assert by_id[2005].evidences == {"Naruto": [0, 2]}


# ------------------------------------------------------------ end-to-end


@pytest.fixture(scope="module")
def prepared(tmp_path_factory):
    from ircl_tpu.corpus import prepare

    tmp = tmp_path_factory.mktemp("fever_fixture")
    full = str(tmp / "full_wiki.json")
    small = str(tmp / "small_wiki.json")
    n_full = prepare.extract_wiki(os.path.join(FIX, "wiki-*.jsonl"), full)
    ids = prepare.small_wiki_doc_ids(
        os.path.join(FIX, "train.jsonl"),
        os.path.join(FIX, "shared_task_dev.jsonl"),
    )
    n_small = prepare.extract_wiki(
        os.path.join(FIX, "wiki-*.jsonl"), small, restrict_to=ids
    )
    store = prepare.build_flat_store(full, str(tmp / "store"))
    return tmp, full, small, n_full, n_small, store


def test_extract_wiki_counts_and_collision(prepared):
    _, full, small, n_full, n_small, store = prepared
    # 8 shard records, fullwidth+ascii Tokyo collide under NFKD -> 7 docs
    assert n_full == 7
    wiki = fever.load_wiki_json(full)
    assert set(wiki) == {
        BEYONCE, SAVAGES, "Telescopium", "Naruto", TOKYO,
        "Liechtenstein_national_football_team", "Malformed_Doc",
    }
    # collision is last-record-wins: the ascii record's sentence 3 survives
    assert "Shibuya" in wiki[TOKYO]["lines"]
    assert "Old record variant" not in wiki[TOKYO]["lines"]
    # small wiki = evidence-cited docs only
    assert n_small == 4
    assert set(fever.load_wiki_json(small)) == {
        BEYONCE, SAVAGES, TOKYO, "Naruto",
    }


def test_sentence_corpus_keys_and_filters(prepared):
    _, full, *_ = prepared
    wiki = fever.load_wiki_json(full)
    docs, docs_dict = fever.build_sentence_corpus(wiki)
    # survivors: Beyonce, Savages, Tokyo (others rejected by the heuristic)
    assert len(docs) == 3
    assert set(docs_dict) == {
        unicodedata.normalize("NFD", BEYONCE), SAVAGES, TOKYO,
    }


def test_retrieval_recall_over_fixture(prepared):
    from ircl_tpu.index.build import build_count_index
    from ircl_tpu.index.ranker import TfidfRanker
    from ircl_tpu.index.tfidf import tfidf_transform
    from ircl_tpu.pipeline.recall import doc_recall_at_k, sentence_recall_at_k
    from ircl_tpu.pipeline.retrieve import host_sparse_scorer, retrieve

    _, full, _, _, _, store = prepared
    claims = fever.parse_claims_jsonl(
        os.path.join(FIX, "shared_task_dev.jsonl"), drop_nei=True
    )
    index = tfidf_transform(build_count_index(store, ngram=2, hash_size=1 << 20))
    ranker = TfidfRanker(index)

    wiki = fever.load_wiki_json(full)
    doc_sents = {d: fever.parse_lines_tab(r["lines"]) for d, r in wiki.items()}
    r = retrieve(
        [c.claim for c in claims], ranker, doc_sents,
        host_sparse_scorer(), k_docs=3, k_sents=3,
    )
    assert doc_recall_at_k(claims, r.doc_ids, k=3) == 1.0
    assert sentence_recall_at_k(claims, r.sentences, k=3) == 1.0
    # the decomposed-claim / composed-wiki-id pair resolves to the gold
    # sentence despite the unicode round trip
    assert r.sentences[0][0] == (BEYONCE, 2)


def test_store_roundtrip_unicode_ids(prepared):
    _, _, _, _, _, store = prepared
    text = store.get_doc_text(BEYONCE)
    assert text and "Grammy Awards" in text
