"""Fetcher tests against a localhost fixture server (no egress needed).

Exercises the download/verify/extract path of ``corpus/fetch.py`` — the
reference's ``preprocessing/fetch_data.py`` stage — end to end: streaming
download, content-length truncation detection, sha256 verification, atomic
rename, idempotent skip, zip extraction, and traversal rejection.
"""

import hashlib
import http.server
import io
import json
import os
import tarfile
import threading
import zipfile

import pytest

from ircl_tpu.corpus.fetch import (
    download_file,
    extract_archive,
    fetch_all,
)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("srv")

    # a wiki-pages.zip fixture with one jsonl shard inside
    shard = "\n".join(
        json.dumps({"id": f"Doc_{i}", "text": f"t{i}", "lines": f"0\tt{i}"})
        for i in range(3)
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("wiki-pages/wiki-001.jsonl", shard)
    (root / "wiki-pages.zip").write_bytes(buf.getvalue())
    (root / "train.jsonl").write_text(
        json.dumps({"id": 1, "claim": "c", "label": "SUPPORTS"}) + "\n"
    )

    class Quiet(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(root), **kw)

        def log_message(self, *a):
            pass

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Quiet)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield root, f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_download_verify_and_skip(server, tmp_path):
    root, base = server
    want = hashlib.sha256((root / "train.jsonl").read_bytes()).hexdigest()
    p = download_file(f"{base}/train.jsonl", str(tmp_path), sha256=want)
    assert os.path.exists(p) and not os.path.exists(p + ".part")
    mtime = os.path.getmtime(p)
    # second call: skipped (not re-downloaded), checksum still verified
    p2 = download_file(f"{base}/train.jsonl", str(tmp_path), sha256=want)
    assert p2 == p and os.path.getmtime(p) == mtime
    with pytest.raises(IOError, match="sha256"):
        download_file(f"{base}/train.jsonl", str(tmp_path), sha256="0" * 64)


def test_fetch_all_extracts_archives(server, tmp_path):
    root, base = server
    out = fetch_all(
        str(tmp_path),
        resources={
            "wiki_pages": f"{base}/wiki-pages.zip",
            "train": f"{base}/train.jsonl",
        },
    )
    shard = tmp_path / "wiki-pages" / "wiki-001.jsonl"
    assert shard.exists()
    rows = [json.loads(l) for l in shard.read_text().splitlines()]
    assert [r["id"] for r in rows] == ["Doc_0", "Doc_1", "Doc_2"]
    assert set(out) == {"wiki_pages", "train"}
    # idempotent second run: nothing re-extracted over the existing tree
    fetch_all(str(tmp_path), resources={"train": f"{base}/train.jsonl"})


def test_missing_resource_errors(server, tmp_path):
    _, base = server
    with pytest.raises(Exception):
        download_file(f"{base}/nope.jsonl", str(tmp_path))


def test_zip_traversal_rejected(tmp_path):
    evil = tmp_path / "evil.zip"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("../escape.txt", "x")
    evil.write_bytes(buf.getvalue())
    with pytest.raises(IOError, match="escapes"):
        extract_archive(str(evil), str(tmp_path / "out"))
    assert not (tmp_path / "escape.txt").exists()


def test_tar_extraction_safe(tmp_path):
    src = tmp_path / "a.txt"
    src.write_text("hello")
    tgz = tmp_path / "bundle.tar.gz"
    with tarfile.open(tgz, "w:gz") as tf:
        tf.add(src, arcname="bundle/a.txt")
    out = tmp_path / "out"
    extract_archive(str(tgz), str(out))
    assert (out / "bundle" / "a.txt").read_text() == "hello"
