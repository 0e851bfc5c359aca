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


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ircl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import scipy.sparse as sp

    from ircl_tpu.index.build import to_scipy
    from ircl_tpu.index.ranker import TfidfRanker
    from ircl_tpu.index.tfidf import idf_vector

    NUM_DOCS = 1_000_000
    TERMS_PER_DOC = 96
    VOCAB = 2_000_000
    HASH_SIZE = 1 << 24
    B, K = 1024, 5

    t0 = time.time()
    index = synth_index(NUM_DOCS, TERMS_PER_DOC, VOCAB, HASH_SIZE)
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

    # TPU hybrid path, driven through the ranker internals with prebuilt
    # query vectors (queries are synthetic buckets, not text).
    from ircl_tpu.index.split import gather_light_pools
    from ircl_tpu.ops.hybrid import hybrid_topk_bucketed
    from ircl_tpu.ops.membership_pallas import pad_for_slab
    import jax.numpy as jnp

    t0 = time.time()
    ranker = TfidfRanker(
        index, mode="hybrid", df_threshold=256, width_buckets=2
    )
    log(f"device index built in {time.time()-t0:.0f}s (K_h={ranker._split.heavy.k_width})")

    heavy_q = ranker._split.doc_freqs[qb] > ranker._split.df_threshold
    hw = np.where(heavy_q, qw, 0.0).astype(np.float32)
    u_pad = ranker._union_slots(qb, hw, floor=512)
    qb_t, qw_t = pad_for_slab(
        np.ascontiguousarray(qb.T), np.ascontiguousarray(hw.T), d_tile=128
    )
    ld, lc, pool = gather_light_pools(ranker._split, qb, qw)
    log(f"U_h={len(u_pad)}, light pool width={pool}")

    ldp = ranker._bucketed.old2pos[np.minimum(ld, NUM_DOCS)]

    def run():
        return hybrid_topk_bucketed(
            *ranker._heavy_a,
            *ranker._heavy_b,
            jnp.asarray(u_pad),
            jnp.asarray(qb_t),
            jnp.asarray(qw_t),
            jnp.asarray(ldp),
            jnp.asarray(lc),
            k=K,
        )

    t0 = time.time()
    s, i = run()
    s = np.asarray(s)
    i = np.asarray(i)
    log(f"first batch (compile) {time.time()-t0:.0f}s")

    pos2old = ranker._bucketed.pos2old
    mismatches = 0
    for b in range(n_cpu):
        ref_ids, ref_scores = cpu_results[b]
        n = min(len(ref_ids), int((i[b] >= 0).sum()))
        if not np.allclose(
            np.sort(ref_scores[:n]), np.sort(s[b][:n]), rtol=1e-4
        ):
            mismatches += 1
    log(f"parity: {n_cpu - mismatches}/{n_cpu}")
    if mismatches:
        raise SystemExit(f"parity failed on {mismatches}")

    reps = 5
    t0 = time.time()
    outs = [run() for _ in range(reps)]
    jax.block_until_ready(outs)
    np.asarray(outs[-1][0])
    dt = time.time() - t0
    qps = reps * B / dt
    log(f"steady {qps:.0f} q/s")
    print(
        json.dumps(
            {
                "metric": "sparse_hybrid_qps_per_chip_1M_docs",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / cpu_qps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
