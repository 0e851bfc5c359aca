"""Engine/df_threshold/d_tile sweep for the hybrid ranker on TPU.

Measures steady-state QPS for several (engine, df_threshold, d_tile)
configurations over one corpus, with a scipy parity spot-check per config.
Used to (re)locate the serving optimum after kernel changes (e.g. the
pool-resident fused light-add grid) and to calibrate the build-time
autotuner (``index/autotune.py``).

Two corpus modes mirror the judged benches:
- ``--bench50k``: the bench.py corpus (synthetic 50K-doc wiki, real claim
  queries, B=2048);
- default: the bench_scale synthetic Zipf index (``--docs``, uniform
  occupied-bucket queries, B=1024).

Run from the repo root: ``python scripts/sweep_df.py [--bench50k]``.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ircl_tpu.utils.benchtime import log


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench50k", action="store_true")
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--dfs", type=int, nargs="+", default=None)
    ap.add_argument("--d-tiles", type=int, nargs="+", default=None)
    ap.add_argument("--engines", nargs="+", default=None,
                    choices=["fused", "staged"])
    ap.add_argument("--reps", type=int, default=3,
                    help="timed repetitions of the full query set")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ircl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ircl_tpu.index.build import CountIndex, scipy_query_scores, to_scipy
    from ircl_tpu.index.ranker import TfidfRanker, vectorize_queries
    from ircl_tpu.index.tfidf import idf_vector

    if args.bench50k:
        from ircl_tpu.corpus.store import MemoryDocStore
        from ircl_tpu.corpus.synthetic import generate
        from ircl_tpu.index.build import build_count_index
        from ircl_tpu.index.tfidf import tfidf_transform

        B = args.batch or 2048
        t0 = time.time()
        wiki = generate(num_docs=50_000, num_claims=B, seed=11)
        store = MemoryDocStore(
            {d: r["text"] for d, r in wiki.docs.items()}
        )
        index = tfidf_transform(
            build_count_index(store, ngram=2, hash_size=1 << 24)
        )
        log(f"50K corpus + index in {time.time()-t0:.0f}s")
        qb, qw = vectorize_queries(
            [c.claim for c in wiki.claims], index.hash_size, index.ngram,
            index.doc_freqs, index.num_docs, max_terms=48,
        )
        dfs = args.dfs or [32, 64, 128, 256]
        max_terms = 48
    else:
        B = args.batch or 1024
        cache = f"/tmp/ircl_scale_{args.docs}_96_2000000.npz"
        t0 = time.time()
        if os.path.exists(cache):
            index = CountIndex.load(cache)
        else:
            from bench_scale import synth_index

            index = synth_index(args.docs, 96, 2_000_000, 1 << 24)
            index.save(cache)
        log(f"index ready in {time.time()-t0:.0f}s ({index.nnz} postings)")
        rng = np.random.default_rng(7)
        occupied = np.flatnonzero(index.doc_freqs)
        qb = occupied[rng.integers(0, len(occupied), size=(B, 24))].astype(
            np.int32
        )
        idfs = idf_vector(index.doc_freqs, index.num_docs)
        qw = (np.log1p(1.0) * idfs[qb]).astype(np.float32)
        dfs = args.dfs or [64, 128, 256, 512]
        max_terms = 24

    # scipy parity reference on a spot-check subset (shared single copy:
    # ircl_tpu/index/build.py::scipy_query_scores)
    mat = to_scipy(index)
    n_chk = 32
    dense_ref = scipy_query_scores(mat, qb[:n_chk], qw[:n_chk], index.hash_size)

    def cpu_ref(b, k=5):
        res = dense_ref[b]
        o = np.argsort(-res, kind="stable")[:k]
        return res, np.sort(res[o])[::-1]

    refs = [cpu_ref(b) for b in range(n_chk)]

    d_tiles = args.d_tiles or [256, 512]
    engines = args.engines or ["fused", "staged"]
    rows = []
    saved_gate = TfidfRanker.FUSED_LIGHT_MAX_DOCS
    for engine, df, d_tile in itertools.product(engines, dfs, d_tiles):
        try:
            TfidfRanker.FUSED_LIGHT_MAX_DOCS = (
                10**9 if engine == "fused" else 0
            )
            t0 = time.time()
            ranker = TfidfRanker(
                index, mode="hybrid", df_threshold=df, width_buckets=2,
                precision="high", fixed_max_terms=max_terms, d_tile=d_tile,
            )
            build_s = time.time() - t0

            s, i = ranker.hybrid_from_vectors(qb, qw, 5)  # compile + warm
            bad = 0
            for b in range(n_chk):
                dense, top = refs[b]
                m = min((i[b] >= 0).sum(), len(top))
                ok = np.allclose(
                    s[b][:m], top[:m], rtol=1e-4, atol=1e-6
                ) and all(
                    np.isclose(s[b][j], dense[i[b][j]], rtol=1e-4, atol=1e-6)
                    for j in range(m)
                )
                bad += 0 if ok else 1

            t0 = time.time()
            for _ in range(args.reps):
                pending = ranker.hybrid_from_vectors_async(qb, qw, 5)
            out = ranker._finish_hybrid(pending, B)  # sync once at the end
            dt = (time.time() - t0) / args.reps
            qps = B / dt
            row = {
                "engine": engine, "df": df, "d_tile": d_tile,
                "qps": round(qps, 0), "ms_batch": round(dt * 1000, 1),
                "parity": f"{n_chk - bad}/{n_chk}", "build_s": round(build_s, 1),
            }
        except Exception as e:  # noqa: BLE001 — sweep survives OOM configs
            row = {
                "engine": engine, "df": df, "d_tile": d_tile,
                "error": f"{type(e).__name__}: {str(e)[:120]}",
            }
        finally:
            TfidfRanker.FUSED_LIGHT_MAX_DOCS = saved_gate
        log(row)
        rows.append(row)

    print(json.dumps({"docs": index.num_docs, "batch": B, "rows": rows}))


if __name__ == "__main__":
    main()
