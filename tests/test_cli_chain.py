"""ONE test proving the full CLI chain works on reference-format archives:

    fetch -> prepare -> build-index -> retrieve -> recall@k

The golden FEVER-format fixtures (``tests/fixtures/fever/`` — real dump
quirks: anchor tab-fields, trailing-count rows, NFC/NFD/fullwidth ids,
malformed docs, NEI claims) are zipped into a reference-shaped
``wiki-pages.zip`` (``wiki-pages/wiki-XXX.jsonl`` members, exactly the
layout ``script/get_data.sh`` + ``preprocessing/fetch_data.py:35-70``
download), served from a localhost fixture server, and pulled through the
real ``cli fetch`` with sha256 verification. Every later stage runs through
``cli.main`` exactly as a user would invoke it.
"""

import hashlib
import http.server
import io
import json
import os
import threading
import zipfile

import pytest

from ircl_tpu.cli import main as cli_main

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "fever")


@pytest.fixture(scope="module")
def archive_server(tmp_path_factory):
    """Serve wiki-pages.zip + train/dev jsonl in the reference layout."""
    root = tmp_path_factory.mktemp("release")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name in ("wiki-001.jsonl", "wiki-002.jsonl"):
            zf.write(os.path.join(FIX, name), f"wiki-pages/{name}")
    (root / "wiki-pages.zip").write_bytes(buf.getvalue())
    for name in ("train.jsonl", "shared_task_dev.jsonl"):
        (root / name).write_bytes(
            open(os.path.join(FIX, name), "rb").read()
        )

    class Quiet(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(root), **kw)

        def log_message(self, *a):
            pass

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Quiet)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield root, f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_full_chain_fetch_prepare_index_retrieve(
    archive_server, tmp_path, capsys
):
    root, base = archive_server
    ws = tmp_path
    data = ws / "data"
    cfgfile = ws / "cfg.yaml"
    cfgfile.write_text(
        f"""
data:
  data_dir: {data}
  wiki_json: {data}/small_wiki.json
  train_jsonl: {data}/train.jsonl
  dev_jsonl: {data}/shared_task_dev.jsonl
  synthetic: false
index:
  hash_size: 1048576
retrieval:
  k_docs: 3
  k_sents: 3
  batch_size: 8
"""
    )

    def sha(p):
        return hashlib.sha256(open(p, "rb").read()).hexdigest()

    resources = ws / "resources.json"
    resources.write_text(
        json.dumps(
            {
                "resources": {
                    "wiki_pages": f"{base}/wiki-pages.zip",
                    "train": f"{base}/train.jsonl",
                    "dev": f"{base}/shared_task_dev.jsonl",
                },
                "checksums": {
                    "wiki_pages": sha(root / "wiki-pages.zip"),
                    "train": sha(root / "train.jsonl"),
                    "dev": sha(root / "shared_task_dev.jsonl"),
                },
            }
        )
    )

    # --- fetch: download + sha256-verify + unzip into the dump layout ----
    cli_main(
        ["--config", str(cfgfile), "fetch", "--resources", str(resources)]
    )
    capsys.readouterr()
    assert os.path.exists(data / "wiki-pages" / "wiki-001.jsonl")
    assert os.path.exists(data / "train.jsonl")
    assert os.path.exists(data / "shared_task_dev.jsonl")

    # --- prepare: wiki-pages/*.jsonl -> small wiki + sentence corpus -----
    cli_main(["--config", str(cfgfile), "prepare"])
    capsys.readouterr()
    assert os.path.exists(data / "small_wiki.json")
    assert os.path.exists(data / "docs_sentence.pkl")

    # --- build-index: count + tf-idf npz ---------------------------------
    cli_main(["--config", str(cfgfile), "build-index"])
    capsys.readouterr()
    assert os.path.exists(data / "index" / "count_matrix.npz")

    # --- retrieve: two-stage retrieval + recall@k over dev claims --------
    out_jsonl = ws / "retrieved.jsonl"
    cli_main(
        ["--config", str(cfgfile), "retrieve", "--out", str(out_jsonl)]
    )
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the fixtures are built so gold evidence is retrievable: every dev
    # claim's evidence doc must rank in the top-3
    assert report["doc_recall@k"] == 1.0
    assert report["sentence_recall@k"] == 1.0
    with open(out_jsonl) as f:
        rows = [json.loads(l) for l in f]
    assert rows and all("docs" in r and "sentences" in r for r in rows)
