"""Probe: select+rescore vs exact staged engine at 1M docs, alternating.

Cross-process A/Bs on this shared host are 3-8x load-noisy (CLAUDE.md);
this probe alternates the two arms INSIDE ONE PROCESS on the SAME ranker
(``select_rescore`` is read per call as a static jit arg, so flipping the
attribute switches between two already-compiled programs with zero other
state change — same device index, same query batch, same host phases).
Reports per-arm best / median over N alternating blocks.

Run from the repo root: ``python scripts/probe_select_rescore.py
[--docs 1000000] [--blocks 6] [--n-cand 16]``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--terms", type=int, default=96)
    ap.add_argument("--vocab", type=int, default=2_000_000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--n-cand", type=int, default=16)
    ap.add_argument("--d-tile", type=int, default=512)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ircl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench_scale import synth_index
    from ircl_tpu.index.build import CountIndex
    from ircl_tpu.index.ranker import TfidfRanker
    from ircl_tpu.index.tfidf import idf_vector

    HASH_SIZE = 1 << 24
    B, K = args.batch, 5
    cache = f"/tmp/ircl_scale_{args.docs}_{args.terms}_{args.vocab}.npz"
    t0 = time.time()
    if os.path.exists(cache):
        index = CountIndex.load(cache)
    else:
        index = synth_index(args.docs, args.terms, args.vocab, HASH_SIZE)
        index.save(cache)
    log(f"index ready in {time.time()-t0:.0f}s: {index.nnz} postings")

    rng = np.random.default_rng(7)
    occupied = np.flatnonzero(index.doc_freqs)
    qb = occupied[rng.integers(0, len(occupied), size=(B, 24))].astype(
        np.int32
    )
    idfs = idf_vector(index.doc_freqs, index.num_docs)
    qw = (np.log1p(1.0) * idfs[qb]).astype(np.float32)

    t0 = time.time()
    ranker = TfidfRanker(
        index, mode="hybrid", df_threshold=256, width_buckets=2,
        precision="high", fixed_max_terms=24, d_tile=args.d_tile,
        select_rescore=args.n_cand,
    )
    log(f"device index built in {time.time()-t0:.0f}s")

    # compile + warm both arms (also pays the lazy-upload stall once)
    for sr in (args.n_cand, 0):
        ranker.select_rescore = sr
        t0 = time.time()
        s, i = ranker.hybrid_from_vectors(qb, qw, K)
        log(f"arm sr={sr}: first batch (compile) {time.time()-t0:.0f}s")

    # quick cross-arm agreement check (both exact modulo fp / containment)
    ranker.select_rescore = args.n_cand
    s_sel, i_sel = ranker.hybrid_from_vectors(qb, qw, K)
    ranker.select_rescore = 0
    s_ex, i_ex = ranker.hybrid_from_vectors(qb, qw, K)
    bad = 0
    for b in range(B):
        if not np.allclose(
            np.sort(s_sel[b]), np.sort(s_ex[b]), rtol=1e-4, atol=1e-6
        ):
            bad += 1
    log(f"cross-arm agreement: {B - bad}/{B}")

    results = {0: [], args.n_cand: []}
    for blk in range(args.blocks):
        for sr in (0, args.n_cand) if blk % 2 == 0 else (args.n_cand, 0):
            ranker.select_rescore = sr
            t0 = time.time()
            outs = [
                ranker.hybrid_from_vectors_async(qb, qw, K)
                for _ in range(args.reps)
            ]
            import jax as _j

            _j.block_until_ready(outs)
            np.asarray(outs[-1][0])
            qps = args.reps * B / (time.time() - t0)
            results[sr].append(qps)
            log(f"block {blk} sr={sr}: {qps:.0f} q/s")

    for sr, xs in results.items():
        xs_s = sorted(xs)
        log(
            f"ARM sr={sr}: best {xs_s[-1]:.0f}  median {xs_s[len(xs_s)//2]:.0f}"
            f"  all {[f'{x:.0f}' for x in xs]}"
        )
    import json

    print(
        json.dumps(
            {
                "metric": "probe_select_rescore_1M",
                "best_exact": round(max(results[0]), 1),
                "best_select": round(max(results[args.n_cand]), 1),
                "agreement": B - bad,
                "batch": B,
            }
        )
    )


if __name__ == "__main__":
    main()
