"""Serving-layer benchmark on the real chip (secondary bench).

tests/test_serve.py proves the serving surfaces functionally; this measures
what they COST end-to-end on TPU — the number round 4 shipped without
(VERDICT.md weak item 2):

  A. Doc-search under concurrency: per-request dispatch
     (``RetrievalService.search``) vs cross-request micro-batching
     (``BatchingService``) at 1/8/64 concurrent single-query closed-loop
     clients.  Per scenario: end-to-end QPS, request p50/p95, and the
     coalescing factor (queries per device dispatch) — the batcher's whole
     value claim is that factor.
  B. HTTP transport tax: the same batched search through the
     ``ThreadingHTTPServer`` on localhost (new connection per request —
     the worst, simplest client).
  C. Later stages' per-request cost: two-stage sentence search
     (``PrecomputedSentenceScorer`` table: query embed + row gather) and
     /verdict claim verification (retrieve -> assemble -> classify), on a
     smaller corpus so the one-off sentence-table sweep stays bounded.

The reference's only serving analogue is the in-process ThreadPool batch in
``preprocessing/drqa/retriever/tfidf_doc_ranker.py:77-84`` — it splits ONE
caller's batch and cannot coalesce independent clients, which is the case
this bench exercises.

Prints one JSON line per scenario on stdout; progress on stderr.  Not the
judged bench (that is bench.py) — no salvage machinery, but the same
compilation cache and pinned-shape rules apply.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(scenario: str, **fields):
    print(
        json.dumps({"bench": "serve", "scenario": scenario, **fields}),
        flush=True,
    )


def run_clients(call, n_clients: int, duration_s: float, queries) -> dict:
    """Closed-loop load: each client thread sends 1-query requests
    back-to-back until the deadline. Returns QPS + latency percentiles."""
    lock = threading.Lock()
    lat: list[float] = []
    stop = time.monotonic() + duration_s

    def client(seed):
        rng = np.random.default_rng(seed)
        mine = []
        while time.monotonic() < stop:
            q = queries[int(rng.integers(len(queries)))]
            t0 = time.monotonic()
            call([q])
            mine.append(time.monotonic() - t0)
        with lock:
            lat.extend(mine)

    threads = [
        threading.Thread(target=client, args=(i,), daemon=True)
        for i in range(n_clients)
    ]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.monotonic() - t0
    arr = np.sort(np.asarray(lat))
    return {
        "clients": n_clients,
        "requests": len(arr),
        "qps": round(len(arr) / dt, 1),
        "p50_ms": round(1e3 * float(arr[len(arr) // 2]), 1),
        "p95_ms": round(
            1e3 * float(arr[min(len(arr) - 1, int(0.95 * len(arr)))]), 1
        ),
    }


def _dispatch_delta(service, before: dict, n_queries: int) -> dict:
    """Coalescing factor from the device-dispatch counter. `n_queries` is
    the client-side count (ServiceMetrics.record_request only fires on the
    transports, so the direct-API scenarios must supply it)."""
    after = service.metrics.snapshot()
    d_disp = after["device_batches"] - before["device_batches"]
    return {
        "device_batches": d_disp,
        # queries per device dispatch — the coalescing factor. 1.0 means
        # every request paid its own (mostly padding) device batch.
        "queries_per_dispatch": (
            round(n_queries / d_disp, 2) if d_disp else None
        ),
    }


def bench_search(service, queries, clients_list, duration_s):
    from ircl_tpu.serve import BatchingService

    for mode in ("direct", "batched"):
        for c in clients_list:
            before = service.metrics.snapshot()
            if mode == "direct":
                res = run_clients(service.search, c, duration_s, queries)
            else:
                batcher = BatchingService(service, max_wait_ms=5.0)
                try:
                    res = run_clients(batcher.search, c, duration_s, queries)
                finally:
                    batcher.close()
            res.update(_dispatch_delta(service, before, res["requests"]))
            emit(f"{mode}_c{c}", **res)
            log(f"{mode} c={c}: {res}")


def bench_http(service, queries, clients_list, duration_s):
    import urllib.request

    from ircl_tpu.serve import serve_http

    server = serve_http(service, port=0, batch_wait_ms=5.0)
    port = server.server_address[1]
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    try:

        def call(qs):
            body = json.dumps({"queries": qs}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/search",
                data=body,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as resp:
                json.loads(resp.read())

        for c in clients_list:
            before = service.metrics.snapshot()
            res = run_clients(call, c, duration_s, queries)
            res.update(_dispatch_delta(service, before, res["requests"]))
            emit(f"http_batched_c{c}", **res)
            log(f"http batched c={c}: {res}")
    finally:
        server.shutdown()
        if server.batcher is not None:
            server.batcher.close()


def bench_native_http(service, queries, clients_list, duration_s):
    """The C++ epoll front (serve_native.py) under the same closed-loop
    load as bench_http, but with per-client persistent connections — the
    keep-alive the native front adds is part of what is being measured."""
    import http.client

    from ircl_tpu.serve_native import native_available, serve_native_http

    if not native_available():
        log("native front unavailable; skipping http_native scenarios")
        return
    server = serve_native_http(service, port=0, batch_wait_ms=5.0, workers=2)
    tls = threading.local()

    def call(qs):
        conn = getattr(tls, "conn", None)
        if conn is None:
            conn = http.client.HTTPConnection(
                "127.0.0.1", server.port, timeout=120
            )
            tls.conn = conn
        body = json.dumps({"queries": qs}).encode()
        try:
            conn.request(
                "POST", "/search", body=body,
                headers={"Content-Type": "application/json"},
            )
            json.loads(conn.getresponse().read())
        except Exception:
            tls.conn = None  # reconnect on the next call
            raise

    try:
        for c in clients_list:
            before = service.metrics.snapshot()
            res = run_clients(call, c, duration_s, queries)
            res.update(_dispatch_delta(service, before, res["requests"]))
            emit(f"http_native_c{c}", **res)
            log(f"http native c={c}: {res}")
    finally:
        server.close()


def bench_offline_reference(service, queries):
    """Context row: one caller with full device batches (the engine's own
    throughput through the service facade, no concurrency machinery)."""
    B = service.batch_size
    batch = [queries[i % len(queries)] for i in range(B)]
    service.search(batch)  # warm
    t0 = time.monotonic()
    reps = 10
    for _ in range(reps):
        service.search(batch)
    dt = time.monotonic() - t0
    emit(
        "offline_fullbatch",
        batch_size=B,
        qps=round(reps * B / dt, 1),
        p50_ms=round(1e3 * dt / reps, 1),
    )
    log(f"offline full-batch B={B}: {reps * B / dt:.1f} q/s")


def build_search_service(num_docs: int, batch_size: int):
    from ircl_tpu.corpus.store import MemoryDocStore
    from ircl_tpu.corpus.synthetic import generate
    from ircl_tpu.index.build import build_count_index
    from ircl_tpu.index.ranker import TfidfRanker
    from ircl_tpu.index.tfidf import tfidf_transform
    from ircl_tpu.serve import RetrievalService

    t0 = time.time()
    wiki = generate(num_docs=num_docs, num_claims=512, seed=11)
    store = MemoryDocStore({d: r["text"] for d, r in wiki.docs.items()})
    index = tfidf_transform(
        build_count_index(store, ngram=2, hash_size=1 << 24)
    )
    log(f"search corpus+index ({num_docs} docs) in {time.time()-t0:.1f}s")
    # the served configuration (make_service defaults): pinned shapes
    ranker = TfidfRanker(
        index,
        fixed_max_terms=24,
        fixed_union_cap=4096,
        union_round=512,
    )
    svc = RetrievalService(ranker, batch_size=batch_size, default_k=5)
    t0 = time.time()
    svc.warmup()
    log(f"warmup (compile + upload) in {time.time()-t0:.1f}s")
    return svc, [c.claim for c in wiki.claims]


def build_staged_service(num_docs: int):
    """Smaller corpus with BOTH later stages configured: precomputed
    sentence table + verdict classifier (random-init weights — this bench
    measures serving cost, not model quality; shapes are what matter)."""
    import jax

    from ircl_tpu.contrastive.state import TrainConfig, init_train_state
    from ircl_tpu.corpus.store import MemoryDocStore
    from ircl_tpu.corpus.synthetic import generate
    from ircl_tpu.index.build import build_count_index
    from ircl_tpu.index.ranker import TfidfRanker
    from ircl_tpu.index.tfidf import tfidf_transform
    from ircl_tpu.models.featurizer import FeaturizerConfig, make_featurizer
    from ircl_tpu.models.transformer import TransformerConfig
    from ircl_tpu.models.wordpiece import WordPieceTokenizer
    from ircl_tpu.pipeline.dense_scorer import (
        ContrastiveSentenceScorer,
        PrecomputedSentenceScorer,
    )
    from ircl_tpu.serve import RetrievalService
    from ircl_tpu.verdict.infer import VerdictClassifier
    from ircl_tpu.verdict.model import VerdictConfig, init_verdict_params

    t0 = time.time()
    wiki = generate(num_docs=num_docs, num_claims=256, seed=13)
    store = MemoryDocStore({d: r["text"] for d, r in wiki.docs.items()})
    index = tfidf_transform(
        build_count_index(store, ngram=2, hash_size=1 << 22)
    )
    ranker = TfidfRanker(
        index, fixed_max_terms=24, fixed_union_cap=2048, union_round=512
    )
    log(f"staged corpus+index ({num_docs} docs) in {time.time()-t0:.1f}s")

    # stage 2: contrastive encoder at its default (reference) shape,
    # precomputed sentence table (the production serving form)
    cfg = TrainConfig()
    feat = make_featurizer(FeaturizerConfig())
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    scorer = ContrastiveSentenceScorer(cfg, feat, state)
    n_sents = sum(len(s) for s in wiki.sentences.values())
    t0 = time.time()
    pre = PrecomputedSentenceScorer.from_scorer(scorer, wiki.sentences)
    table_s = time.time() - t0
    log(f"sentence table: {n_sents} sentences embedded in {table_s:.1f}s")
    emit(
        "sentence_table_build",
        sentences=n_sents,
        seconds=round(table_s, 1),
        sents_per_s=round(n_sents / table_s, 1),
    )

    # stage 3: verdict classifier at the reference eval shape
    # (roberta-base 12L/768h, L=512 — src/QA/train.py), batch 8
    tok = WordPieceTokenizer.train(
        [r["text"] for r in list(wiki.docs.values())[:2000]], vocab_size=4096
    )
    vcfg = VerdictConfig(
        encoder=TransformerConfig(vocab_size=tok.vocab_size),
        max_length=512,
    )
    clf = VerdictClassifier(
        vcfg,
        init_verdict_params(jax.random.PRNGKey(1), vcfg),
        tok,
        batch_size=8,
    )
    svc = RetrievalService(
        ranker,
        batch_size=64,
        default_k=5,
        doc_sentences=wiki.sentences,
        sentence_scorer=pre,
        default_k_sents=5,
        verdict_classifier=clf,
    )
    t0 = time.time()
    svc.warmup()
    log(f"staged warmup in {time.time()-t0:.1f}s")
    return svc, [c.claim for c in wiki.claims]


def bench_two_stage_batched(svc, claims, clients_list, duration_s):
    """Cross-request sentence-stage batching (BatchingService sentence
    queue): concurrent 1-query two-stage clients share one stage-1 batch +
    one stage-2 scoring pass. The direct arm is the pre-batching baseline
    (requests serialize on the service lock)."""
    from ircl_tpu.serve import BatchingService

    before = svc.metrics.snapshot()
    res = run_clients(
        lambda qs: svc.search_sentences(qs), clients_list[0], duration_s,
        claims,
    )
    res.update(_dispatch_delta(svc, before, res["requests"]))
    emit(f"two_stage_direct_c{clients_list[0]}", **res)
    log(f"two-stage direct c={clients_list[0]}: {res}")
    batcher = BatchingService(svc, max_wait_ms=5.0)
    try:
        for c in clients_list:
            before = svc.metrics.snapshot()
            res = run_clients(
                lambda qs: batcher.search_sentences(qs), c, duration_s,
                claims,
            )
            res.update(_dispatch_delta(svc, before, res["requests"]))
            emit(f"two_stage_batched_c{c}", **res)
            log(f"two-stage batched c={c}: {res}")
    finally:
        batcher.close()


def bench_stages(svc, claims, n_reqs: int):
    """Per-request p50/p95 of the staged endpoints, single closed-loop
    client (later stages do per-request device work; concurrency would
    only serialize on the service lock)."""
    for name, call in (
        ("two_stage_sentences", lambda qs: svc.search_sentences(qs)),
        ("verdict", lambda qs: svc.verify_claims(qs)),
    ):
        call([claims[0]])  # warm this path
        lat = []
        for i in range(n_reqs):
            t0 = time.monotonic()
            call([claims[i % len(claims)]])
            lat.append(time.monotonic() - t0)
        arr = np.sort(np.asarray(lat))
        res = {
            "requests": n_reqs,
            "qps": round(1.0 / float(arr.mean()), 2),
            "p50_ms": round(1e3 * float(arr[len(arr) // 2]), 1),
            "p95_ms": round(
                1e3 * float(arr[min(len(arr) - 1, int(0.95 * len(arr)))]), 1
            ),
        }
        emit(name, **res)
        log(f"{name}: {res}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--staged-docs", type=int, default=5_000)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--duration", type=float, default=8.0)
    ap.add_argument(
        "--clients", type=int, nargs="+", default=[1, 8, 64],
        help="concurrent-client counts for the search scenarios",
    )
    ap.add_argument("--stage-requests", type=int, default=30)
    ap.add_argument("--skip-stages", action="store_true")
    ap.add_argument("--skip-http", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ircl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ircl_tpu.utils.benchtime import probe_backend

    if not probe_backend():
        emit("error", error="axon backend unavailable (init timeout)")
        return

    svc, queries = build_search_service(args.docs, args.batch_size)
    bench_offline_reference(svc, queries)
    bench_search(svc, queries, args.clients, args.duration)
    if not args.skip_http:
        bench_http(svc, queries, args.clients[-2:], args.duration)
        bench_native_http(svc, queries, args.clients[-2:], args.duration)

    if not args.skip_stages:
        staged, claims = build_staged_service(args.staged_docs)
        bench_stages(staged, claims, args.stage_requests)
        bench_two_stage_batched(
            staged, claims, args.clients[-2:], args.duration
        )


if __name__ == "__main__":
    main()
