"""Serving endpoint tests (`ircl_tpu/serve.py`).

The reference has no service surface (its ranker runs in-process,
``drqa/retriever/tfidf_doc_ranker.py:100-126``); these tests pin the
contract of ours: pinned-batch padding/chunking is invisible (results
match a direct `closest_docs_batch` call exactly), empty queries are
legal, and the HTTP + stdin shims round-trip JSON faithfully.
"""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from ircl_tpu.corpus.store import MemoryDocStore
from ircl_tpu.index.build import build_count_index
from ircl_tpu.index.ranker import TfidfRanker
from ircl_tpu.index.tfidf import tfidf_transform
from ircl_tpu.serve import (
    RetrievalService,
    make_service,
    serve_http,
    serve_stdin,
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
def index():
    return tfidf_transform(
        build_count_index(MemoryDocStore(DOCS), ngram=2, hash_size=1 << 18)
    )


@pytest.fixture(scope="module")
def ranker(index):
    return TfidfRanker(index)


def _assert_matches_direct(results, ranker, queries, k):
    direct = ranker.closest_docs_batch(list(queries), k=k)
    assert len(results) == len(queries)
    for got, (ids, scores) in zip(results, direct):
        assert [g["doc_id"] for g in got] == ids
        np.testing.assert_allclose(
            [g["score"] for g in got], scores, rtol=1e-6
        )


def test_padding_is_invisible(ranker):
    # 3 queries into a pinned batch of 4: the pad query must not appear
    # and the real rows must match an unpadded direct call bit-for-bit.
    svc = RetrievalService(ranker, batch_size=4, default_k=3)
    _assert_matches_direct(svc.search(QUERIES), ranker, QUERIES, 3)


def test_chunking_is_invisible(ranker):
    # 7 queries through batch_size=3 -> 3 device batches (last one padded).
    svc = RetrievalService(ranker, batch_size=3, default_k=2)
    queries = (QUERIES * 3)[:7]
    _assert_matches_direct(svc.search(queries), ranker, queries, 2)


def test_empty_and_oov_queries(ranker):
    svc = RetrievalService(ranker, batch_size=2, default_k=3)
    out = svc.search(["", "zzzz qqqq xxxx", QUERIES[0]])
    assert len(out) == 3
    assert out[0] == []  # no terms -> no hits
    assert out[2][0]["doc_id"] == "Saturn_V"


def test_k_clamps_and_validates(ranker):
    svc = RetrievalService(ranker, batch_size=4, default_k=3)
    out = svc.search([QUERIES[0]], k=100)  # > num_docs: clamp, don't crash
    assert len(out[0]) <= len(DOCS)
    with pytest.raises(ValueError):
        svc.search([QUERIES[0]], k=0)


def test_make_service_from_saved_index(index, tmp_path):
    path = str(tmp_path / "tfidf.npz")
    index.save(path)
    svc = make_service(path, batch_size=2, default_k=2, union_round=None)
    assert svc.num_docs == len(DOCS)
    out = svc.search([QUERIES[1]])
    assert out[0][0]["doc_id"] == "Mars"


@pytest.fixture()
def http_service(ranker):
    svc = RetrievalService(ranker, batch_size=4, default_k=3)
    server = serve_http(svc, host="127.0.0.1", port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}", svc
    server.shutdown()


def test_http_search_and_health(http_service, ranker):
    base, _ = http_service
    with urllib.request.urlopen(f"{base}/healthz") as r:
        health = json.loads(r.read())
    assert health == {"ok": True, "docs": len(DOCS)}

    req = urllib.request.Request(
        f"{base}/search",
        data=json.dumps({"queries": QUERIES, "k": 2}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        results = json.loads(r.read())["results"]
    _assert_matches_direct(results, ranker, QUERIES, 2)

    # single-query sugar
    req = urllib.request.Request(
        f"{base}/search", data=json.dumps({"query": QUERIES[0]}).encode()
    )
    with urllib.request.urlopen(req) as r:
        results = json.loads(r.read())["results"]
    assert results[0][0]["doc_id"] == "Saturn_V"


def test_http_bad_requests(http_service):
    base, _ = http_service
    for payload in (b"not json", b"{}", b'{"queries": [1, 2]}',
                    b'{"queries": ["x"], "k": 0}'):
        req = urllib.request.Request(f"{base}/search", data=payload)
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"{base}/nope")
    assert e.value.code == 404


def test_http_malformed_types_get_400_not_connection_abort(http_service):
    # Valid JSON of the wrong TYPE (non-dict body, string k, bare-string
    # queries, bool k) must produce HTTP 400 — round-3 advisor finding:
    # these raised TypeError and aborted the connection with no response.
    base, _ = http_service
    for payload in (
        b"[1, 2]",
        b'"just a string"',
        b'{"queries": ["x"], "k": "three"}',
        b'{"queries": "moon"}',
        b'{"queries": ["x"], "k": true}',
        b'{"query": "x", "k_sents": "two"}',
    ):
        req = urllib.request.Request(f"{base}/search", data=payload)
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 400, payload


def test_http_body_size_limit(http_service):
    base, _ = http_service
    req = urllib.request.Request(f"{base}/search", data=b"x" * (9 << 20))
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 413


def test_stdin_malformed_types_keep_loop_alive(ranker):
    # Advisor finding: a valid-JSON non-dict line (or non-int k) raised
    # TypeError that ESCAPED the loop, killing serving for later lines.
    svc = RetrievalService(ranker, batch_size=2, default_k=2)
    lines = [
        "[1, 2]",
        json.dumps({"queries": "moon"}),  # bare string: per-char iteration
        json.dumps({"queries": ["x"], "k": "three"}),
        json.dumps({"query": QUERIES[1]}),  # loop must still reach this
    ]
    out = io.StringIO()
    served = serve_stdin(svc, io.StringIO("\n".join(lines) + "\n"), out)
    assert served == 1
    replies = [json.loads(l) for l in out.getvalue().splitlines()]
    assert [("error" in r) for r in replies] == [True, True, True, False]
    assert replies[3]["results"][0][0]["doc_id"] == "Mars"


def test_search_rejects_bare_string_queries(ranker):
    # Direct-caller contract, not just transport-level: a bare string would
    # silently score each CHARACTER as a query.
    svc = RetrievalService(ranker, batch_size=2, default_k=2)
    with pytest.raises(ValueError):
        svc.search("moon")


def test_k_is_pinned_server_side(ranker):
    # Requests with different k share one compiled shape: the service
    # computes at k_max and slices host-side. Result correctness across a
    # k sweep is what we can assert portably.
    svc = RetrievalService(ranker, batch_size=4, default_k=3, k_max=5)
    assert svc.k_max == 5
    for k in (1, 2, 3, 5, 100):
        got = svc.search(QUERIES, k=k)
        _assert_matches_direct(got, ranker, QUERIES, min(k, 5))


def _sentences():
    return {d: [s.strip() for s in t.split(" in ")] for d, t in DOCS.items()}


@pytest.fixture(scope="module")
def two_stage(ranker):
    from ircl_tpu.pipeline.retrieve import host_sparse_scorer

    return RetrievalService(
        ranker,
        batch_size=4,
        default_k=3,
        doc_sentences=_sentences(),
        sentence_scorer=host_sparse_scorer(),
        default_k_sents=2,
    )


def test_two_stage_sentence_search(two_stage):
    two_stage.warmup()  # must cover both engines without error
    out = two_stage.search_sentences(QUERIES, k=3, k_sents=2)
    assert len(out) == len(QUERIES)
    for per_q in out:
        assert len(per_q) <= 2
        scores = [r["score"] for r in per_q]
        assert scores == sorted(scores, reverse=True)
        for r in per_q:
            assert r["sentence"] in _sentences()[r["doc_id"]]
            assert _sentences()[r["doc_id"]][r["sent_id"]] == r["sentence"]
    # the top sentence for the rocket claim comes from the Saturn_V doc
    assert out[0][0]["doc_id"] == "Saturn_V"


def test_two_stage_over_http_and_stdin(two_stage):
    server = serve_http(two_stage, host="127.0.0.1", port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        req = urllib.request.Request(
            f"{base}/search",
            data=json.dumps(
                {"queries": QUERIES[:1], "k_sents": 2}
            ).encode(),
        )
        with urllib.request.urlopen(req) as r:
            results = json.loads(r.read())["results"]
        assert results[0][0]["doc_id"] == "Saturn_V"
        assert "sentence" in results[0][0]
    finally:
        server.shutdown()

    out = io.StringIO()
    serve_stdin(
        two_stage,
        io.StringIO(json.dumps({"query": QUERIES[0], "sentences": True}) + "\n"),
        out,
    )
    reply = json.loads(out.getvalue())
    assert reply["results"][0][0]["doc_id"] == "Saturn_V"


def test_sentence_search_unconfigured_is_a_request_error(ranker):
    svc = RetrievalService(ranker, batch_size=2, default_k=2)
    out = io.StringIO()
    serve_stdin(
        svc,
        io.StringIO(json.dumps({"query": "x", "sentences": True}) + "\n"),
        out,
    )
    assert "error" in json.loads(out.getvalue())


def test_stdin_jsonl_loop(ranker):
    svc = RetrievalService(ranker, batch_size=4, default_k=2)
    lines = [
        json.dumps({"queries": QUERIES, "k": 2}),
        "",  # blank lines skipped
        json.dumps({"query": QUERIES[2]}),
        "garbage{",  # malformed -> error line, loop continues
        json.dumps({"queries": [QUERIES[1]]}),
    ]
    out = io.StringIO()
    served = serve_stdin(svc, io.StringIO("\n".join(lines) + "\n"), out)
    assert served == 3
    replies = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(replies) == 4  # 3 results + 1 error
    _assert_matches_direct(replies[0]["results"], ranker, QUERIES, 2)
    assert replies[1]["results"][0][0]["doc_id"] == "Moon"
    assert "error" in replies[2]
    assert replies[3]["results"][0][0]["doc_id"] == "Mars"


def test_stdin_bulk_lines_coalesce(ranker):
    """A piped file of single-query lines must share device batches (one
    dispatch for a buffered drain, not one padded dispatch per line) while
    replies stay in input order and identical to direct calls."""
    svc = RetrievalService(ranker, batch_size=8, default_k=3)
    svc.search(["warmup"])
    base = svc.metrics.device_batches
    qs = [QUERIES[i % len(QUERIES)] + f" v{i}" for i in range(8)]
    lines = [json.dumps({"query": q}) for q in qs]
    out = io.StringIO()
    served = serve_stdin(svc, io.StringIO("\n".join(lines) + "\n"), out)
    assert served == 8
    replies = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(replies) == 8
    for q, rep in zip(qs, replies):
        _assert_matches_direct(rep["results"], ranker, [q], 3)
    used = svc.metrics.device_batches - base
    assert used <= 2, f"bulk stdin lines did not coalesce: {used} dispatches"


def test_stdin_bulk_mixed_k_and_errors_keep_order(ranker):
    """Coalescing must not reorder or cross-contaminate: mixed k values
    form separate groups, malformed/blank/oversized-k lines keep their
    per-line semantics, all in input order."""
    svc = RetrievalService(ranker, batch_size=8, default_k=3)
    lines = [
        json.dumps({"query": QUERIES[0], "k": 1}),
        "",  # blank: no reply line
        json.dumps({"queries": [QUERIES[1], QUERIES[2]], "k": 2}),
        "garbage{",  # malformed: error line in place
        json.dumps({"query": QUERIES[2]}),  # default k
        json.dumps({"query": QUERIES[0], "k": 1}),
    ]
    out = io.StringIO()
    served = serve_stdin(svc, io.StringIO("\n".join(lines) + "\n"), out)
    assert served == 4
    replies = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(replies) == 5  # 4 results + 1 error, blank skipped
    _assert_matches_direct(replies[0]["results"], ranker, [QUERIES[0]], 1)
    _assert_matches_direct(
        replies[1]["results"], ranker, [QUERIES[1], QUERIES[2]], 2
    )
    assert "error" in replies[2]
    _assert_matches_direct(replies[3]["results"], ranker, [QUERIES[2]], 3)
    _assert_matches_direct(replies[4]["results"], ranker, [QUERIES[0]], 1)


def test_batcher_coalesces_concurrent_requests(ranker):
    """8 concurrent 1-query clients share device batches: every reply is
    bit-identical to a direct call, and the dispatch count is far below one
    device batch per request (the whole point of the micro-batcher)."""
    from ircl_tpu.serve import BatchingService

    svc = RetrievalService(ranker, batch_size=8, default_k=3)
    svc.search(["warmup"])  # pay the engine build outside the timed window
    base_dispatches = svc.metrics.device_batches
    batcher = BatchingService(svc, max_wait_ms=100.0)
    queries = [f"{q} variant {i}" for i, q in enumerate(QUERIES * 3)][:8]
    results = [None] * len(queries)
    start = threading.Barrier(len(queries))

    def client(i):
        start.wait()
        results[i] = batcher.search([queries[i]])

    threads = [
        threading.Thread(target=client, args=(i,)) for i in range(len(queries))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    batcher.close()
    for i, q in enumerate(queries):
        assert results[i] is not None, f"client {i} never completed"
        _assert_matches_direct(results[i], ranker, [q], 3)
    used = svc.metrics.device_batches - base_dispatches
    assert used < len(queries), f"no coalescing happened ({used} dispatches)"


def test_batcher_coalesces_under_sustained_load(ranker):
    """Regression guard for the closed-loop serving scenario bench_serve.py
    measures: N clients each firing a stream of 1-query requests. While one
    device batch is in flight the others queue up, so steady state must
    coalesce — total dispatches well below total requests — and every reply
    must still be bit-identical to a direct call (slices of a shared
    top-k_max computation)."""
    from ircl_tpu.serve import BatchingService

    n_clients, reqs_each = 6, 10
    svc = RetrievalService(ranker, batch_size=8, default_k=3)
    svc.search(["warmup"])
    base_dispatches = svc.metrics.device_batches
    # max_wait covers thread-scheduling jitter on the 1-core host; the cap
    # below still requires real coalescing, not just the linger window
    batcher = BatchingService(svc, max_wait_ms=50.0)
    results = [[None] * reqs_each for _ in range(n_clients)]
    errors = []
    start = threading.Barrier(n_clients)

    def client(i):
        try:
            start.wait()
            for r in range(reqs_each):
                q = QUERIES[(i + r) % len(QUERIES)] + f" v{i}"
                results[i][r] = (q, batcher.search([q]))
        except BaseException as e:  # pragma: no cover - fail loudly below
            errors.append(e)

    threads = [
        threading.Thread(target=client, args=(i,)) for i in range(n_clients)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    batcher.close()
    assert not errors, errors
    total = n_clients * reqs_each
    for per_client in results:
        for got in per_client:
            assert got is not None, "a request never completed"
            q, res = got
            _assert_matches_direct(res, ranker, [q], 3)
    used = svc.metrics.device_batches - base_dispatches
    assert used <= total // 2, (
        f"sustained load did not coalesce: {used} dispatches "
        f"for {total} requests"
    )


def test_batcher_submit_async(ranker):
    """`submit` (the native front's non-blocking handoff) must deliver the
    same results as `search` through the callback, run oversized requests
    inline, and raise validation errors synchronously in the caller."""
    from ircl_tpu.serve import BatchingService

    svc = RetrievalService(ranker, batch_size=4, default_k=3)
    batcher = BatchingService(svc, max_wait_ms=2.0)
    try:
        # queued path (3 queries < batch_size=4)
        done = threading.Event()
        got = {}

        def cb(result, error):
            got["r"], got["e"] = result, error
            done.set()

        batcher.submit(QUERIES, None, cb)
        assert done.wait(30), "callback never fired"
        assert got["e"] is None
        _assert_matches_direct(got["r"], ranker, QUERIES, 3)

        # oversized path runs inline: callback fires before submit returns
        big = (QUERIES * 2)[:5]
        inline = {}
        batcher.submit(big, 2, lambda r, e: inline.update(r=r, e=e))
        assert inline["e"] is None
        _assert_matches_direct(inline["r"], ranker, big, 2)

        # validation errors raise in the caller, not the callback
        with pytest.raises(ValueError):
            batcher.submit([QUERIES[0]], 0, lambda r, e: None)
    finally:
        batcher.close()


def test_batcher_submit_coalesces_without_blocking_callers(ranker):
    """One caller thread fires many submits back-to-back (the fixed-pool
    native-front pattern); they must coalesce into few device batches even
    though no caller ever blocks on a result."""
    from ircl_tpu.serve import BatchingService

    svc = RetrievalService(ranker, batch_size=8, default_k=3)
    svc.search(["warmup"])
    base = svc.metrics.device_batches
    batcher = BatchingService(svc, max_wait_ms=50.0)
    n = 12
    done = [threading.Event() for _ in range(n)]
    out = [None] * n
    try:
        for i in range(n):
            q = QUERIES[i % len(QUERIES)] + f" v{i}"

            def cb(result, error, i=i, q=q):
                out[i] = (q, result, error)
                done[i].set()

            batcher.submit([q], None, cb)
        for i in range(n):
            assert done[i].wait(30), f"submit {i} never completed"
            q, result, error = out[i]
            assert error is None
            _assert_matches_direct(result, ranker, [q], 3)
    finally:
        batcher.close()
    used = svc.metrics.device_batches - base
    assert used <= n // 2, f"submits did not coalesce: {used} for {n}"


def test_batcher_sentence_requests_coalesce(ranker):
    """Concurrent two-stage requests with DIFFERENT k/k_sents share one
    stage-1 batch + one stage-2 pass, and every reply is identical to a
    direct `search_sentences` call with that request's own parameters."""
    from ircl_tpu.pipeline.retrieve import host_sparse_scorer
    from ircl_tpu.serve import BatchingService

    svc = RetrievalService(
        ranker,
        batch_size=8,
        default_k=3,
        doc_sentences=_sentences(),
        sentence_scorer=host_sparse_scorer(),
        default_k_sents=2,
    )
    svc.warmup()
    base = svc.metrics.device_batches
    batcher = BatchingService(svc, max_wait_ms=100.0)
    params = [
        (QUERIES[0], 3, 2),
        (QUERIES[1], 2, 1),
        (QUERIES[2], 1, 2),
        (QUERIES[0], 2, None),  # default k_sents
    ]
    results = [None] * len(params)
    start = threading.Barrier(len(params))

    def client(i):
        q, k, ks = params[i]
        start.wait()
        results[i] = batcher.search_sentences([q], k=k, k_sents=ks)

    threads = [
        threading.Thread(target=client, args=(i,)) for i in range(len(params))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    batcher.close()
    used = svc.metrics.device_batches - base  # before the direct re-checks
    for i, (q, k, ks) in enumerate(params):
        assert results[i] is not None, f"client {i} never completed"
        direct = svc.search_sentences([q], k=k, k_sents=ks)
        assert results[i] == direct, (i, results[i], direct)
    assert used < len(params), f"no sentence coalescing ({used} dispatches)"


def test_batcher_sentence_errors(ranker):
    """No sentence stage -> synchronous ValueError (shared message);
    submit_sentences validation errors also raise in the caller."""
    from ircl_tpu.pipeline.retrieve import host_sparse_scorer
    from ircl_tpu.serve import BatchingService

    bare = BatchingService(
        RetrievalService(ranker, batch_size=4, default_k=3), max_wait_ms=2.0
    )
    try:
        with pytest.raises(ValueError, match="sentence search unavailable"):
            bare.search_sentences([QUERIES[0]])
    finally:
        bare.close()

    svc = RetrievalService(
        ranker,
        batch_size=4,
        default_k=3,
        doc_sentences=_sentences(),
        sentence_scorer=host_sparse_scorer(),
    )
    batcher = BatchingService(svc, max_wait_ms=2.0)
    try:
        with pytest.raises(ValueError):
            batcher.submit_sentences([QUERIES[0]], 0, 2, lambda r, e: None)
    finally:
        batcher.close()


def test_http_sentence_requests_ride_the_batcher(ranker):
    """serve_http with micro-batching routes two-stage requests through
    the batcher (same replies as direct)."""
    from ircl_tpu.pipeline.retrieve import host_sparse_scorer

    svc = RetrievalService(
        ranker,
        batch_size=4,
        default_k=3,
        doc_sentences=_sentences(),
        sentence_scorer=host_sparse_scorer(),
        default_k_sents=2,
    )
    server = serve_http(svc, host="127.0.0.1", port=0, batch_wait_ms=2.0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        req = urllib.request.Request(
            f"{base}/search",
            data=json.dumps({"queries": QUERIES[:1], "k_sents": 2}).encode(),
        )
        with urllib.request.urlopen(req) as r:
            results = json.loads(r.read())["results"]
        direct = svc.search_sentences(QUERIES[:1], k_sents=2)
        assert results == json.loads(json.dumps(direct))
    finally:
        server.shutdown()
        server.batcher.close()


def test_batcher_respects_per_request_k(ranker):
    from ircl_tpu.serve import BatchingService

    svc = RetrievalService(ranker, batch_size=4, default_k=3, k_max=5)
    batcher = BatchingService(svc, max_wait_ms=20.0)
    try:
        for k in (1, 2, 5):
            _assert_matches_direct(
                batcher.search(QUERIES[:1], k=k), ranker, QUERIES[:1], k
            )
    finally:
        batcher.close()


def test_batcher_large_request_passes_through(ranker):
    # A request that already fills device batches skips the queue entirely.
    from ircl_tpu.serve import BatchingService

    svc = RetrievalService(ranker, batch_size=2, default_k=2)
    batcher = BatchingService(svc, max_wait_ms=20.0)
    try:
        queries = QUERIES * 2  # 6 queries > batch_size 2
        _assert_matches_direct(batcher.search(queries), ranker, queries, 2)
    finally:
        batcher.close()


def test_batcher_propagates_engine_errors(ranker):
    from ircl_tpu.serve import BatchingService

    svc = RetrievalService(ranker, batch_size=4, default_k=3)

    def boom(queries, k):
        raise RuntimeError("engine fell over")

    svc._ranked = boom
    batcher = BatchingService(svc, max_wait_ms=5.0)
    try:
        with pytest.raises(RuntimeError, match="engine fell over"):
            batcher.search(QUERIES[:1])
        # validation errors surface synchronously, before queueing
        with pytest.raises(ValueError):
            batcher.search("moon")
    finally:
        batcher.close()


def test_batcher_rejects_after_close(ranker):
    from ircl_tpu.serve import BatchingService

    svc = RetrievalService(ranker, batch_size=4, default_k=3)
    batcher = BatchingService(svc, max_wait_ms=5.0)
    batcher.close()
    with pytest.raises(RuntimeError):
        batcher.search(QUERIES[:1])
    with pytest.raises(ValueError):
        BatchingService(svc, max_wait_ms=-1.0)


def test_http_metrics_endpoint_and_batched_transport(ranker):
    svc = RetrievalService(ranker, batch_size=4, default_k=3)
    server = serve_http(svc, host="127.0.0.1", port=0, batch_wait_ms=10.0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        req = urllib.request.Request(
            f"{base}/search",
            data=json.dumps({"queries": QUERIES, "k": 2}).encode(),
        )
        with urllib.request.urlopen(req) as r:
            results = json.loads(r.read())["results"]
        _assert_matches_direct(results, ranker, QUERIES, 2)
        # malformed request increments the error counter
        bad = urllib.request.Request(f"{base}/search", data=b'{"queries": 1}')
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(bad)
        with urllib.request.urlopen(f"{base}/metrics") as r:
            m = json.loads(r.read())
        assert m["requests"] == 1
        assert m["queries"] == len(QUERIES)
        assert m["errors"] == 1
        assert m["device_batches"] >= 1
        assert "latency_p50_ms" in m and "latency_p95_ms" in m
        assert m["latency_p95_ms"] >= m["latency_p50_ms"]
    finally:
        server.shutdown()
        server.batcher.close()


def test_two_stage_precomputed_matches_on_the_fly(ranker):
    """A PrecomputedSentenceScorer-backed service returns the same
    sentence results as the on-the-fly embed path (serve.py routes to
    score_keys automatically when the scorer has one)."""
    import zlib

    from ircl_tpu.pipeline.dense_scorer import (
        PrecomputedSentenceScorer,
        _score_by_embed,
    )

    def fake_embed(texts):
        out = np.zeros((len(texts), 8), np.float32)
        for i, t in enumerate(texts):
            rng = np.random.default_rng(zlib.crc32(t.encode("utf-8")))
            v = rng.normal(size=8).astype(np.float32)
            out[i] = v / np.linalg.norm(v)
        return out

    sents = _sentences()
    kw = dict(
        batch_size=4, default_k=3, doc_sentences=sents, default_k_sents=2
    )
    svc_fly = RetrievalService(
        ranker,
        sentence_scorer=lambda cs, cands: _score_by_embed(fake_embed, cs, cands),
        **kw,
    )
    pre = PrecomputedSentenceScorer(fake_embed, sents)
    svc_pre = RetrievalService(ranker, sentence_scorer=pre, **kw)
    svc_pre.warmup()

    got_fly = svc_fly.search_sentences(QUERIES, k=3, k_sents=2)
    got_pre = svc_pre.search_sentences(QUERIES, k=3, k_sents=2)
    assert [
        [(r["doc_id"], r["sent_id"]) for r in per_q] for per_q in got_pre
    ] == [[(r["doc_id"], r["sent_id"]) for r in per_q] for per_q in got_fly]
    for a, b in zip(got_pre, got_fly):
        np.testing.assert_allclose(
            [r["score"] for r in a], [r["score"] for r in b], rtol=1e-6
        )


# ---------------------------------------------------------------------------
# Stage 3: claim verification (/verdict)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def verdict_service(ranker, tmp_path_factory):
    """Retrieval + sentence + verdict service, with the classifier loaded
    through the REAL checkpoint path (`VerdictClassifier.from_checkpoint`
    over the artifacts `cli train-verdict` persists)."""
    import dataclasses
    import os

    import jax
    import orbax.checkpoint as ocp

    from ircl_tpu.models.transformer import TransformerConfig
    from ircl_tpu.models.wordpiece import WordPieceTokenizer
    from ircl_tpu.pipeline.retrieve import host_sparse_scorer
    from ircl_tpu.verdict.infer import VerdictClassifier
    from ircl_tpu.verdict.model import VerdictConfig, init_verdict_params

    ckptdir = str(tmp_path_factory.mktemp("verdict_ckpt"))
    tok = WordPieceTokenizer.train(list(DOCS.values()), vocab_size=256)
    vcfg = VerdictConfig(
        encoder=TransformerConfig(
            vocab_size=tok.vocab_size, hidden=16, layers=1, heads=2,
            intermediate=32, max_positions=48,
        ),
        max_length=48,
    )
    params = init_verdict_params(jax.random.PRNGKey(0), vcfg)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.join(ckptdir, "verdict"),
        jax.tree.map(np.asarray, params),
        force=True,
    )
    ckptr.wait_until_finished()
    tok.save_vocab(os.path.join(ckptdir, "verdict_vocab.txt"))
    with open(os.path.join(ckptdir, "verdict_config.json"), "w") as f:
        json.dump(
            {
                "encoder": dataclasses.asdict(vcfg.encoder) | {"dtype": None},
                "num_labels": vcfg.num_labels,
                "max_length": vcfg.max_length,
            },
            f,
        )
    clf = VerdictClassifier.from_checkpoint(ckptdir, batch_size=4)
    return RetrievalService(
        ranker,
        batch_size=4,
        default_k=3,
        doc_sentences=_sentences(),
        sentence_scorer=host_sparse_scorer(),
        default_k_sents=2,
        verdict_classifier=clf,
    )


def test_verify_claims_end_to_end(verdict_service):
    verdict_service.warmup()  # covers all three stage compiles
    out = verdict_service.verify_claims(QUERIES, k=3, k_sents=2)
    assert len(out) == len(QUERIES)
    for r in out:
        assert r["label"] in ("SUPPORTS", "REFUTES")
        assert r["label_id"] in (0, 1)
        assert 0.0 < r["confidence"] <= 1.0
        assert r["evidence"] and all("sentence" in e for e in r["evidence"])
    # evidence IS the two-stage sentence result for the same request
    sents = verdict_service.search_sentences(QUERIES, k=3, k_sents=2)
    assert [r["evidence"] for r in out] == sents
    # pinned-shape determinism: same claims -> same verdicts
    assert verdict_service.verify_claims(QUERIES, k=3, k_sents=2) == out


def test_verdict_batch_padding_is_invisible(verdict_service):
    """1 claim vs the same claim inside a full batch: identical verdict
    (classifier pad rows never leak into real outputs)."""
    one = verdict_service.verify_claims(QUERIES[:1])
    many = verdict_service.verify_claims(QUERIES)
    assert one[0] == many[0]


def test_verdict_over_http_and_stdin(verdict_service):
    server = serve_http(verdict_service, host="127.0.0.1", port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        req = urllib.request.Request(
            f"{base}/verdict",
            data=json.dumps({"claims": QUERIES[:1]}).encode(),
        )
        with urllib.request.urlopen(req) as r:
            results = json.loads(r.read())["results"]
        assert results[0]["label"] in ("SUPPORTS", "REFUTES")
        assert results[0]["evidence"]

        # /verdict without claims is a 400, not a queries-shaped reply
        req = urllib.request.Request(
            f"{base}/verdict", data=json.dumps({"queries": ["x"]}).encode()
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
    finally:
        server.shutdown()

    out = io.StringIO()
    serve_stdin(
        verdict_service,
        io.StringIO(json.dumps({"claim": QUERIES[0]}) + "\n"),
        out,
    )
    reply = json.loads(out.getvalue())
    assert reply["results"][0]["label"] in ("SUPPORTS", "REFUTES")


def test_verdict_unconfigured_is_a_request_error(ranker):
    svc = RetrievalService(ranker, batch_size=2, default_k=2)
    out = io.StringIO()
    serve_stdin(
        svc, io.StringIO(json.dumps({"claim": "x"}) + "\n"), out
    )
    assert "error" in json.loads(out.getvalue())


def test_service_over_chunked_ranker(index, ranker, tmp_path):
    """make_service(chunk_docs=...) serves the chunked engine with the
    identical results contract: scores/doc order match the unchunked
    ranker, padding/chunking still invisible, /metrics + num_docs work."""
    path = str(tmp_path / "idx.npz")
    index.save(path)
    svc = make_service(
        path, batch_size=4, default_k=3, chunk_docs=3,
        split_path=str(tmp_path / "splits"),
    )
    assert svc.num_docs == len(DOCS)
    svc.warmup()
    got = svc.search(QUERIES, k=3)
    direct = ranker.closest_docs_batch(list(QUERIES), k=3)
    for g, (ids, scores) in zip(got, direct):
        assert [r["doc_id"] for r in g] == list(ids)
        np.testing.assert_allclose(
            [r["score"] for r in g], scores, rtol=1e-5, atol=1e-6
        )
    # split artifacts persisted per chunk for the next boot
    import os

    assert os.listdir(tmp_path / "splits")
