"""Production serving endpoint for the sparse retrieval engine.

The reference serves its ranker in-process, one query (or ad-hoc
ThreadPool batch) at a time
(`/root/reference/preprocessing/drqa/retriever/tfidf_doc_ranker.py:100-126`);
it has no service surface at all. This module gives the batch-first
`TfidfRanker` one, applying every rule from docs/SERVING.md:

- **Pinned compile shapes.** The engine compiles one executable per batch
  size, so `RetrievalService` pads every request up to the configured
  `batch_size` (with empty queries — zero terms, zero scores) and splits
  larger requests into `batch_size` chunks. Steady-state serving therefore
  reuses a single executable regardless of request size, and `warmup()`
  pays the one compile (plus the lazy index upload) before traffic.
- **Stdlib-only transport.** `serve_http` is a `ThreadingHTTPServer` with
  `POST /search` and `GET /healthz`; `serve_stdin` is a JSONL
  request-per-line loop for piping. Both are thin shims over
  `RetrievalService.search` — anything heavier (gRPC, batching across
  connections) belongs in front of the same class.

One core serves the host side (this box), so the HTTP server's threading
exists to keep `/healthz` responsive during a search, not for parallel
scoring — device dispatch is serialized through the service lock.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Sequence

from ircl_tpu.index.build import CountIndex
from ircl_tpu.index.ranker import TfidfRanker


class RetrievalService:
    """Pinned-shape search facade over a `TfidfRanker`.

    `search` accepts any number of queries and always dispatches device
    batches of exactly `batch_size` (padding the tail with empty queries,
    which vectorize to zero terms and are dropped from the output), so the
    compile key never changes after `warmup()`.
    """

    def __init__(
        self,
        ranker: TfidfRanker,
        batch_size: int = 256,
        default_k: int = 5,
    ):
        if batch_size <= 0:
            raise ValueError(f"batch_size must be positive, got {batch_size}")
        self.ranker = ranker
        self.batch_size = batch_size
        self.default_k = default_k
        self._lock = threading.Lock()

    @property
    def num_docs(self) -> int:
        return len(self.ranker.dev.doc_ids)

    def warmup(self) -> None:
        """Pay the one compile + lazy index upload before serving traffic."""
        self.search(["warmup"], k=self.default_k)

    def search(
        self, queries: Sequence[str], k: Optional[int] = None
    ) -> List[List[dict]]:
        """Top-k `{"doc_id", "score"}` lists, one per query, score-desc."""
        k = self.default_k if k is None else k
        if k <= 0:
            raise ValueError(f"k must be positive, got {k}")
        k = min(k, self.num_docs)
        out: List[List[dict]] = []
        with self._lock:
            for lo in range(0, len(queries), self.batch_size):
                chunk = list(queries[lo : lo + self.batch_size])
                n_real = len(chunk)
                chunk += [""] * (self.batch_size - n_real)
                ranked = self.ranker.closest_docs_batch(chunk, k=k)
                for ids, scores in ranked[:n_real]:
                    out.append(
                        [
                            {"doc_id": d, "score": float(s)}
                            for d, s in zip(ids, scores)
                        ]
                    )
        return out


def make_service(
    index_path: str,
    batch_size: int = 256,
    default_k: int = 5,
    max_terms: int = 24,
    union_cap: int = 4096,
    union_round: Optional[int] = 512,
    split_path: Optional[str] = None,
    mode: str = "auto",
) -> RetrievalService:
    """Load a saved index (tf-idf npz from `cli build-index`) into a
    serving-configured ranker: shapes pinned (`fixed_max_terms`,
    `fixed_union_cap`, `union_round`) so steady state is one executable,
    df-split optionally preloaded (`index/split.py::save_split`) to skip
    the cold-start rebuild."""
    index = CountIndex.load(index_path)
    split = None
    if split_path:
        from ircl_tpu.index.split import load_split

        split = load_split(split_path)
    ranker = TfidfRanker(
        index,
        mode=mode,
        fixed_max_terms=max_terms,
        fixed_union_cap=union_cap,
        union_round=union_round,
        split=split,
    )
    return RetrievalService(ranker, batch_size=batch_size, default_k=default_k)


class _Handler(BaseHTTPRequestHandler):
    service: RetrievalService = None  # set by serve_http

    def _reply(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (http.server API)
        if self.path == "/healthz":
            self._reply(200, {"ok": True, "docs": self.service.num_docs})
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):  # noqa: N802
        if self.path != "/search":
            self._reply(404, {"error": f"unknown path {self.path}"})
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            queries = req["queries"] if "queries" in req else [req["query"]]
            if not isinstance(queries, list) or not all(
                isinstance(q, str) for q in queries
            ):
                raise ValueError("queries must be a list of strings")
            results = self.service.search(queries, k=req.get("k"))
        except (KeyError, ValueError, json.JSONDecodeError) as e:
            self._reply(400, {"error": str(e)})
            return
        self._reply(200, {"results": results})

    def log_message(self, fmt, *args):  # quiet: metrics go to the caller
        pass


def serve_http(
    service: RetrievalService, host: str = "127.0.0.1", port: int = 8080
) -> ThreadingHTTPServer:
    """Start the HTTP endpoint; returns the (already-bound) server — call
    `.serve_forever()` (blocking) or drive it from a thread (tests)."""
    handler = type("Handler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)


def serve_stdin(service: RetrievalService, infile, outfile) -> int:
    """JSONL loop: one request object per line (`{"queries": [...], "k": n}`
    or `{"query": "..."}`), one `{"results": ...}` reply line each; blank
    lines skipped, malformed lines get an `{"error": ...}` line. Returns
    the number of requests served."""
    served = 0
    for line in infile:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            queries = req["queries"] if "queries" in req else [req["query"]]
            results = service.search(queries, k=req.get("k"))
            outfile.write(json.dumps({"results": results}) + "\n")
            served += 1
        except (KeyError, ValueError, json.JSONDecodeError) as e:
            outfile.write(json.dumps({"error": str(e)}) + "\n")
        outfile.flush()
    return served
