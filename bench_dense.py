"""Secondary benchmark: exhaustive dense retrieval QPS on one chip.

Stage-2 scoring as production systems run it at scale: exact cosine top-k of
query embeddings against a corpus embedding matrix (BASELINE.json config 3/5
single-chip slice). Prints one JSON line; the primary judged bench is
``bench.py`` (sparse stage-1).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ircl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from ircl_tpu.dense.scorer import (
        cosine_topk,
        cosine_topk_scan,
        cosine_topk_twophase,
    )

    M, D, B, K = 1_000_000, 128, 1024, 5
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(M, D)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.normal(size=(B, D)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    corpus_d = jax.device_put(corpus)
    q_d = jax.device_put(queries)

    t0 = time.time()
    s, i = cosine_topk(q_d, corpus_d, k=K)
    jax.block_until_ready((s, i))
    log(f"first call (compile) {time.time()-t0:.1f}s")

    # numpy spot parity on 4 queries
    ref = queries[:4] @ corpus.T
    for b in range(4):
        order = np.argsort(-ref[b])[:K]
        np.testing.assert_allclose(
            np.asarray(s)[b], ref[b][order], rtol=5e-3
        )
    log("parity ok")

    def steady(fn, label, reps=20):
        t0 = time.time()
        outs = [fn() for _ in range(reps)]
        jax.block_until_ready(outs)
        _ = np.asarray(outs[-1][0][:1])  # real transfer (axon timing rule)
        dt = time.time() - t0
        qps = reps * B / dt
        log(f"{label}: {qps:.0f} q/s over {M} docs ({dt/reps*1000:.1f} ms/batch)")
        return qps

    qps_flat = steady(lambda: cosine_topk(q_d, corpus_d, k=K), "flat topk")

    # two-phase chunked top-k (dense/scorer.py). precision="highest" keeps
    # the whole path f32 — EXACT vs the numpy reference (the flat baseline's
    # default-precision dot is bf16-input on TPU, so it only tracks numpy to
    # ~5e-3 and can swap near-tied indices).
    s2, i2 = cosine_topk_twophase(
        q_d, corpus_d, k=K, chunk=128, precision="highest"
    )
    s2, i2 = np.asarray(s2), np.asarray(i2)
    n_chk = 32
    ref_chk = queries[:n_chk] @ corpus.T
    for b in range(n_chk):
        order = np.argsort(-ref_chk[b], kind="stable")[:K]
        np.testing.assert_allclose(s2[b], ref_chk[b][order], rtol=1e-5)
        assert set(i2[b].tolist()) == set(order.tolist()), b
    log(f"two-phase(highest) exact vs numpy f32 on {n_chk} queries")
    qps_two = steady(
        lambda: cosine_topk_twophase(
            q_d, corpus_d, k=K, chunk=128, precision="highest"
        ),
        "two-phase f32-exact",
    )
    warm = cosine_topk_twophase(
        q_d, corpus_d, k=K, chunk=128, precision="default"
    )
    jax.block_until_ready(warm)  # compile outside the timed loop
    qps_two_fast = steady(
        lambda: cosine_topk_twophase(
            q_d, corpus_d, k=K, chunk=128, precision="default"
        ),
        "two-phase bf16 (same numerics class as flat)",
    )

    # scanned phase-1 (H never materialized); chunk=64 and block=200K
    # divide 1M exactly
    s3, i3 = cosine_topk_scan(
        q_d, corpus_d, k=K, chunk=64, block=200_000, precision="highest"
    )
    s3, i3 = np.asarray(s3), np.asarray(i3)
    for b in range(n_chk):
        order = np.argsort(-ref_chk[b], kind="stable")[:K]
        np.testing.assert_allclose(s3[b], ref_chk[b][order], rtol=1e-5)
        assert set(i3[b].tolist()) == set(order.tolist()), b
    log(f"scan(highest) exact vs numpy f32 on {n_chk} queries")
    qps_scan = steady(
        lambda: cosine_topk_scan(
            q_d, corpus_d, k=K, chunk=64, block=200_000, precision="highest"
        ),
        "scan f32-exact",
    )

    # fused Pallas phase-1 (dot + chunk-max epilogue in VMEM; scores never
    # reach HBM). fold epilogue = interleaved chunk partition reduced by
    # log2(chunk) full-width pairwise maxima instead of m_tile/chunk small
    # strided reductions — 3-4x the loop epilogue in-session; 8192/32 is the
    # measured plateau (scripts/probe_dense_tiles.py: chunk 32 ~118-125K,
    # chunk 64 ~102K, 16384/32 within noise). First compile ~10 min through
    # the remote compile service; cached persistently afterwards.
    from ircl_tpu.ops.dense_topk_pallas import cosine_topk_fused, pad_corpus_t

    ct, m_real = pad_corpus_t(corpus, m_tile=8192)
    ct_d = jax.device_put(ct)
    s4, i4 = cosine_topk_fused(
        q_d, ct_d, k=K, chunk=32, m_tile=8192, m_real=m_real, epilogue="fold"
    )
    s4, i4 = np.asarray(s4), np.asarray(i4)
    for b in range(n_chk):
        order = np.argsort(-ref_chk[b], kind="stable")[:K]
        np.testing.assert_allclose(s4[b], ref_chk[b][order], rtol=1e-5)
        assert set(i4[b].tolist()) == set(order.tolist()), b
    log(f"fused(pallas) exact vs numpy f32 on {n_chk} queries")
    qps_fused = steady(
        lambda: cosine_topk_fused(
            q_d, ct_d, k=K, chunk=32, m_tile=8192, m_real=m_real,
            epilogue="fold",
        ),
        "fused pallas f32-exact (fold)",
    )

    qps = max(qps_flat, qps_two, qps_two_fast, qps_scan, qps_fused)
    print(
        json.dumps(
            {
                "metric": "dense_exhaustive_topk_qps_per_chip_1M_docs",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
