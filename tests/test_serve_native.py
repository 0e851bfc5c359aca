"""Native (epoll C++) HTTP front: byte-parity with the stdlib transport.

The two fronts share the routing layer (`serve.py::_handle`), so every
endpoint must answer identically; these tests pin that, plus the
protocol behaviors only the native front adds (keep-alive, C++-side 413,
malformed-request handling) and its stability under concurrent clients.
"""

from __future__ import annotations

import http.client
import json
import threading
import urllib.request

import numpy as np
import pytest

from ircl_tpu.corpus.store import MemoryDocStore
from ircl_tpu.index.build import build_count_index
from ircl_tpu.index.ranker import TfidfRanker
from ircl_tpu.index.tfidf import tfidf_transform
from ircl_tpu.serve import RetrievalService, serve_http
from ircl_tpu.serve_native import native_available, serve_native_http

pytestmark = pytest.mark.skipif(
    not native_available(), reason="libircl_http.so unavailable"
)

DOCS = {
    "Apollo_11": "apollo eleven landed on the moon in nineteen sixty nine",
    "Moon": "the moon is a natural satellite of the earth",
    "Mars": "mars is the fourth planet from the sun",
    "Saturn_V": "the saturn five rocket launched apollo missions to the moon",
    "Earth": "earth is the third planet orbiting the sun",
    "Venus": "venus is the second planet from the sun",
}

QUERIES = [
    "rocket that launched apollo to the moon",
    "planet fourth from the sun",
    "natural satellite of the earth",
]


@pytest.fixture(scope="module")
def ranker():
    return TfidfRanker(
        tfidf_transform(
            build_count_index(MemoryDocStore(DOCS), ngram=2, hash_size=1 << 18)
        )
    )


@pytest.fixture()
def native_server(ranker):
    svc = RetrievalService(ranker, batch_size=4, default_k=3)
    server = serve_native_http(svc, port=0)
    yield server, svc
    server.close()


def _post(port, path, body: bytes, conn=None):
    c = conn or http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    c.request(
        "POST", path, body=body, headers={"Content-Type": "application/json"}
    )
    r = c.getresponse()
    data = r.read()
    if conn is None:
        c.close()
    return r.status, json.loads(data)


def test_health_metrics_search(native_server, ranker):
    server, _ = native_server
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/healthz"
    ) as r:
        assert json.loads(r.read()) == {"ok": True, "docs": len(DOCS)}

    status, payload = _post(
        server.port, "/search", json.dumps({"queries": QUERIES, "k": 2}).encode()
    )
    assert status == 200
    direct = ranker.closest_docs_batch(QUERIES, k=2)
    for got, (ids, scores) in zip(payload["results"], direct):
        assert [g["doc_id"] for g in got] == ids
        np.testing.assert_allclose([g["score"] for g in got], scores, rtol=1e-6)

    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/metrics"
    ) as r:
        snap = json.loads(r.read())
    assert snap["requests"] >= 1


def test_byte_parity_with_stdlib_front(ranker):
    """Same request through both fronts -> identical JSON reply."""
    svc1 = RetrievalService(ranker, batch_size=4, default_k=3)
    svc2 = RetrievalService(ranker, batch_size=4, default_k=3)
    stdlib_server = serve_http(svc1, port=0)
    threading.Thread(
        target=stdlib_server.serve_forever, daemon=True
    ).start()
    native = serve_native_http(svc2, port=0)
    try:
        for req in (
            {"queries": QUERIES, "k": 2},
            {"query": QUERIES[0]},
            {"queries": []},
            {"k": 3},  # missing queries -> 400 from shared parser
        ):
            body = json.dumps(req).encode()
            s1, p1 = _post(
                stdlib_server.server_address[1], "/search", body
            )
            s2, p2 = _post(native.port, "/search", body)
            assert (s1, p1) == (s2, p2), req
        # unknown path parity
        s1, _ = _post(stdlib_server.server_address[1], "/nope", b"{}")
        s2, _ = _post(native.port, "/nope", b"{}")
        assert s1 == s2 == 404
    finally:
        stdlib_server.shutdown()
        native.close()


def test_error_paths(native_server):
    server, _ = native_server
    # malformed JSON -> 400 from the shared routing layer
    status, payload = _post(server.port, "/search", b"{not json")
    assert status == 400 and "error" in payload
    # oversized body -> 413 rejected C++-side (header-only, body never sent
    # in full)
    big = b"x" * (9 << 20)
    try:
        status, payload = _post(server.port, "/search", big)
        assert status == 413
    except (ConnectionError, http.client.HTTPException, OSError):
        pass  # server may close mid-upload after replying; also acceptable


def test_keep_alive_reuses_connection(native_server, ranker):
    server, svc = native_server
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
    try:
        for i in range(5):
            status, payload = _post(
                server.port,
                "/search",
                json.dumps({"query": QUERIES[i % len(QUERIES)]}).encode(),
                conn=conn,
            )
            assert status == 200 and payload["results"]
    finally:
        conn.close()
    assert svc.metrics.snapshot()["requests"] == 5


def test_protocol_robustness_raw_socket(native_server):
    """Adversarial bytes against the C++ parser: requests split into
    arbitrary chunks must parse identically (incremental buffering); two
    pipelined requests in one send both answer in order; header names are
    case-insensitive; 'Connection: close' is honored; a garbage request
    line gets 400 and a closed connection — all without wedging the
    server."""
    import socket
    import time as _time

    server, _ = native_server
    body = json.dumps({"query": "rocket launched apollo to the moon"}).encode()

    def raw(data: bytes, chunks=1, expect_n=1, timeout=15.0):
        s = socket.create_connection(("127.0.0.1", server.port), timeout=timeout)
        try:
            step = max(1, len(data) // chunks)
            for lo in range(0, len(data), step):
                s.sendall(data[lo : lo + step])
                _time.sleep(0.002)
            s.settimeout(timeout)
            buf = b""
            # read until expect_n complete responses (Content-Length framed)
            while buf.count(b"HTTP/1.1 ") < expect_n or not _complete(
                buf, expect_n
            ):
                got = s.recv(65536)
                if not got:
                    break
                buf += got
            return buf
        finally:
            s.close()

    def _complete(buf: bytes, n: int) -> bool:
        seen = 0
        while b"\r\n\r\n" in buf:
            head, _, rest = buf.partition(b"\r\n\r\n")
            cl = 0
            for ln in head.split(b"\r\n"):
                if ln.lower().startswith(b"content-length:"):
                    cl = int(ln.split(b":")[1])
            if len(rest) < cl:
                return False
            seen += 1
            buf = rest[cl:]
        return seen >= n

    req = (
        b"POST /search HTTP/1.1\r\nHost: x\r\ncOnTeNt-LeNgTh: "
        + str(len(body)).encode()
        + b"\r\n\r\n"
        + body
    )
    # byte-dribbled request parses identically
    resp = raw(req, chunks=len(req) // 3)
    assert b"HTTP/1.1 200" in resp and b"Saturn_V" in resp

    # two pipelined requests in one send: both answered, in order
    resp = raw(req + req, chunks=1, expect_n=2)
    assert resp.count(b"HTTP/1.1 200") == 2

    # Connection: close honored (server closes after the reply)
    req_close = (
        b"POST /search HTTP/1.1\r\nHost: x\r\nConnection: close\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    resp = raw(req_close)
    assert b"Connection: close" in resp

    # garbage request line -> 400, connection closed, server still alive
    resp = raw(b"NONSENSE\r\n\r\n")
    assert b"HTTP/1.1 400" in resp
    resp = raw(req)
    assert b"HTTP/1.1 200" in resp  # server survived


def test_concurrent_clients(ranker):
    svc = RetrievalService(ranker, batch_size=4, default_k=3)
    server = serve_native_http(svc, port=0, batch_wait_ms=2.0, workers=2)
    errors = []
    N, per = 8, 6

    def client(ci):
        try:
            conn = http.client.HTTPConnection(
                "127.0.0.1", server.port, timeout=60
            )
            for i in range(per):
                status, payload = _post(
                    server.port,
                    "/search",
                    json.dumps({"query": QUERIES[(ci + i) % len(QUERIES)]}).encode(),
                    conn=conn,
                )
                assert status == 200 and payload["results"], (status, payload)
            conn.close()
        except Exception as e:  # noqa: BLE001 - collect for the main thread
            errors.append(e)

    try:
        threads = [
            threading.Thread(target=client, args=(c,)) for c in range(N)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors
        assert svc.metrics.snapshot()["requests"] == N * per
    finally:
        server.close()
