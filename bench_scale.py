"""Secondary benchmark: hybrid sparse scoring at 1M documents.

The corpus-scaling story: a synthetic 1M-doc hashed-bigram index (Zipf
document frequencies, built directly as postings — text generation at this
scale is pointless for a scoring benchmark), scored by the hybrid df-split
engine vs the reference-style scipy CPU matvec. Top-k score parity is
checked on a query subset before timing.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synth_index(num_docs: int, terms_per_doc: int, vocab: int, hash_size: int, seed=0):
    """Synthetic CountIndex: per doc, ``terms_per_doc`` distinct terms drawn
    Zipf-ish from a vocab of hashed bucket ids; counts 1-3."""
    from ircl_tpu.index.build import assemble_csr
    from ircl_tpu.index.tfidf import tfidf_transform

    rng = np.random.default_rng(seed)
    bucket_ids = rng.choice(hash_size, size=vocab, replace=False).astype(np.int64)
    ranks = np.arange(1, vocab + 1)
    probs = (1.0 / ranks) / np.sum(1.0 / ranks)

    # sample per-doc term sets (with replacement across docs)
    draws = rng.choice(vocab, size=(num_docs, terms_per_doc), p=probs)
    # dedup within doc via sort+unique trick per row: keep first occurrence
    rows = []
    cols = []
    vals = []
    srt = np.sort(draws, axis=1)
    keep = np.concatenate(
        [np.ones((num_docs, 1), bool), srt[:, 1:] != srt[:, :-1]], axis=1
    )
    counts = rng.integers(1, 4, size=srt.shape).astype(np.int32)
    doc_of = np.broadcast_to(np.arange(num_docs)[:, None], srt.shape)
    rows = bucket_ids[srt[keep]]
    cols = doc_of[keep].astype(np.int32)
    vals = counts[keep]
    index = assemble_csr(
        rows, cols, vals, hash_size, 2, [str(i) for i in range(num_docs)]
    )
    return tfidf_transform(index)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    # staged-path slab doc tile (round-2 measured best 512 at 1M; 1024 is
    # the 50K fused winner — A/B with this flag)
    ap.add_argument("--d-tile", type=int, default=512)
    ap.add_argument("--terms", type=int, default=96)
    ap.add_argument("--vocab", type=int, default=2_000_000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument(
        "--chunk-docs", type=int, default=1_000_000,
        help="doc-range chunk size when docs exceed one staged pass",
    )
    ap.add_argument(
        "--split-cache", type=str, default=None,
        help="chunked path only: dir of per-chunk split artifacts "
        "(load-or-build-and-save) — repeated big-corpus runs skip the "
        "chunk re-splits",
    )
    ap.add_argument(
        "--select-rescore", type=int, default=0,
        help="staged engine: >0 selects this many candidates/query from a "
        "1-pass bf16 scores matmul and rescores them exactly (halves the "
        "[B, N] HBM traffic). Approximate selection — the parity gate "
        "below certifies (or fails) every run",
    )
    ap.add_argument(
        "--parity-queries", type=int, default=256,
        help="queries checked against the scipy reference (capped at "
        "--batch; 32 are also used to time the CPU baseline)",
    )
    args = ap.parse_args(argv)

    from ircl_tpu.utils.benchtime import probe_backend, unavailable_line

    if not probe_backend():
        tag = "1M" if args.docs == 1_000_000 else f"{args.docs/1e6:.1f}M"
        unavailable_line(f"sparse_hybrid_qps_per_chip_{tag}_docs", "queries/s")
        return

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ircl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import scipy.sparse as sp

    from ircl_tpu.index.build import CountIndex, to_scipy
    from ircl_tpu.index.ranker import TfidfRanker
    from ircl_tpu.index.tfidf import idf_vector

    NUM_DOCS = args.docs
    TERMS_PER_DOC = args.terms
    VOCAB = args.vocab
    HASH_SIZE = 1 << 24
    B, K = args.batch, 5
    # chunk when the corpus exceeds one staged pass's HBM budget (~1.5M
    # docs at B=1024) OR the user asked for smaller chunks explicitly
    chunked = NUM_DOCS > min(1_500_000, args.chunk_docs)

    import os

    cache = f"/tmp/ircl_scale_{NUM_DOCS}_{TERMS_PER_DOC}_{VOCAB}.npz"
    t0 = time.time()
    if os.path.exists(cache):
        index = CountIndex.load(cache)
        log(f"index loaded from cache in {time.time()-t0:.0f}s: {index.nnz} postings")
    else:
        index = synth_index(NUM_DOCS, TERMS_PER_DOC, VOCAB, HASH_SIZE)
        index.save(cache)
        log(f"index synthesized in {time.time()-t0:.0f}s: {index.nnz} postings")

    # synthetic queries: ~24 terms drawn from the same Zipf vocab; weights
    # follow the reference query formula (log1p(tf)*idf).
    rng = np.random.default_rng(7)
    occupied = np.flatnonzero(index.doc_freqs)
    # bias queries toward real terms across the df spectrum
    qb = occupied[rng.integers(0, len(occupied), size=(B, 24))].astype(np.int32)
    idfs = idf_vector(index.doc_freqs, index.num_docs)
    qw = (np.log1p(1.0) * idfs[qb]).astype(np.float32)

    # CPU baseline (reference pipeline): per-query scipy matvec
    mat = to_scipy(index)
    n_cpu = 32

    def cpu_closest(b):
        nz = qw[b] != 0
        spvec = sp.csr_matrix(
            (qw[b][nz], qb[b][nz], [0, int(nz.sum())]), shape=(1, HASH_SIZE)
        )
        res = spvec * mat
        o = np.argpartition(-res.data, min(K, max(len(res.data) - 1, 0)))[:K]
        o = o[np.argsort(-res.data[o])]
        return res.indices[o], res.data[o]

    t0 = time.time()
    cpu_results = [cpu_closest(i) for i in range(n_cpu)]
    cpu_qps = n_cpu / (time.time() - t0)
    log(f"cpu baseline: {cpu_qps:.1f} q/s")
    # widen the parity reference beyond the timed subset (untimed; a tiny
    # subset gate can pass by margin luck — RESULTS.md round-3 audit)
    n_par = min(max(args.parity_queries, n_cpu), B)
    cpu_results += [cpu_closest(i) for i in range(n_cpu, n_par)]

    # TPU hybrid path: the ranker's serving prep (C++ pool gather, sorted
    # queries/pools) + the staged bucketed engine; past one staged pass's
    # HBM budget (~1.5M docs at B=1024) the corpus is chunked.
    t0 = time.time()
    if chunked:
        from ircl_tpu.index.chunked import ChunkedHybridRanker

        ranker = ChunkedHybridRanker(
            index, chunk_docs=args.chunk_docs, df_threshold=256,
            width_buckets=2, precision="high", fixed_max_terms=24,
            d_tile=args.d_tile, split_cache_dir=args.split_cache,
            select_rescore=args.select_rescore,
        )
        log(
            f"chunked device index built in {time.time()-t0:.0f}s "
            f"({len(ranker.chunks)} chunks)"
        )
    else:
        ranker = TfidfRanker(
            index, mode="hybrid", df_threshold=256, width_buckets=2,
            precision="high", fixed_max_terms=24, d_tile=args.d_tile,
            select_rescore=args.select_rescore,
        )
        log(f"device index built in {time.time()-t0:.0f}s (K_h={ranker._split.heavy.k_width})")

    t0 = time.time()
    s, i = ranker.hybrid_from_vectors(qb, qw, K)
    log(f"first batch (compile) {time.time()-t0:.0f}s")

    mismatches = 0
    for b in range(n_par):
        ref_ids, ref_scores = cpu_results[b]
        n = min(len(ref_ids), int((i[b] >= 0).sum()))
        if not np.allclose(
            np.sort(ref_scores[:n]), np.sort(s[b][:n]), rtol=1e-4
        ):
            mismatches += 1
    log(f"parity: {n_par - mismatches}/{n_par}")
    if mismatches:
        raise SystemExit(f"parity failed on {mismatches}")

    reps = 5 if not chunked else 2
    best = 0.0
    for r in range(6):
        t0 = time.time()
        if chunked:
            for _ in range(reps):
                ranker.hybrid_from_vectors(qb, qw, K)
        else:
            outs = [
                ranker.hybrid_from_vectors_async(qb, qw, K) for _ in range(reps)
            ]
            jax.block_until_ready(outs)
            np.asarray(outs[-1][0])
        dt = time.time() - t0
        qps = reps * B / dt
        best = max(best, qps)
        log(f"steady round {r}: {qps:.0f} q/s")
    qps = best
    tag = (
        "1M" if NUM_DOCS == 1_000_000 else f"{NUM_DOCS/1e6:.1f}M"
    )
    print(
        json.dumps(
            {
                "metric": f"sparse_hybrid_qps_per_chip_{tag}_docs",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / cpu_qps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
