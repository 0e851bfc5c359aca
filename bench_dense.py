"""Secondary benchmark: exhaustive dense retrieval QPS on one chip.

Stage-2 scoring as production systems run it at scale: exact cosine top-k of
query embeddings against a corpus embedding matrix (BASELINE.json config 3/5
single-chip slice). Prints one JSON line; the primary judged bench is
``bench.py`` (sparse stage-1).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _topk_ref_blocked(queries, corpus, k, block=125_000):
    """Exact numpy f32 top-k over the full query batch, corpus-blocked so
    the score matrix transient stays ~0.5GB. Returns (sorted scores [B,k],
    list of B id sets)."""
    B = queries.shape[0]
    m = corpus.shape[0]
    best_s = np.full((B, k), -np.inf, np.float32)
    best_i = np.full((B, k), -1, np.int64)
    for lo in range(0, m, block):
        s = queries @ corpus[lo : lo + block].T  # [B, <=block]
        part = np.argpartition(-s, k - 1, axis=1)[:, :k]
        ps = np.take_along_axis(s, part, axis=1)
        cat_s = np.concatenate([best_s, ps], axis=1)
        cat_i = np.concatenate([best_i, part + lo], axis=1)
        sel = np.argpartition(-cat_s, k - 1, axis=1)[:, :k]
        best_s = np.take_along_axis(cat_s, sel, axis=1)
        best_i = np.take_along_axis(cat_i, sel, axis=1)
    order = np.argsort(-best_s, axis=1, kind="stable")
    best_s = np.take_along_axis(best_s, order, axis=1)
    best_i = np.take_along_axis(best_i, order, axis=1)
    return best_s, [set(row.tolist()) for row in best_i]


def main():
    from ircl_tpu.utils.benchtime import probe_backend, unavailable_line

    if not probe_backend():
        unavailable_line("dense_exhaustive_topk_qps_per_chip_1M_docs", "queries/s")
        return

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ircl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from ircl_tpu.dense.scorer import (
        cosine_topk,
        cosine_topk_scan,
        cosine_topk_twophase,
    )
    from ircl_tpu.utils.benchtime import log, steady as _steady

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

    # numpy spot parity on 4 queries (advisory; flat runs the bf16-input
    # default dot, never a headline candidate)
    ref = queries[:4] @ corpus.T
    flat_bad = sum(
        not np.allclose(
            np.asarray(s)[b], ref[b][np.argsort(-ref[b])[:K]], rtol=5e-3
        )
        for b in range(4)
    )
    log(f"flat spot parity {4 - flat_bad}/4")

    def steady(fn, label, reps=20):
        return _steady(fn, label, batch=B, reps=reps)

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

    def spot_check(sv, iv, label):
        # Advisory: a miss here flags the engine but must not abort the
        # bench — the FULL-batch gate below decides headline eligibility
        # and falls back across engines on any failure.
        bad = 0
        for b in range(n_chk):
            order = np.argsort(-ref_chk[b], kind="stable")[:K]
            bad += not (
                np.allclose(sv[b], ref_chk[b][order], rtol=1e-5)
                and set(iv[b].tolist()) == set(order.tolist())
            )
        log(
            f"{label} spot-check {n_chk - bad}/{n_chk}"
            + (" (full-batch gate decides)" if bad else "")
        )

    spot_check(s2, i2, "two-phase(highest)")
    qps_two = steady(
        lambda: cosine_topk_twophase(
            q_d, corpus_d, k=K, chunk=128, precision="highest"
        ),
        "two-phase f32-exact",
    )
    qps_two_fast = steady(  # compile absorbed by steady()'s warm-up calls
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
    spot_check(s3, i3, "scan(highest)")
    qps_scan = steady(
        lambda: cosine_topk_scan(
            q_d, corpus_d, k=K, chunk=64, block=200_000, precision="highest"
        ),
        "scan f32-exact",
    )

    # fused Pallas phase-1 (dot + chunk-max epilogue in VMEM; scores never
    # reach HBM). fold epilogue = interleaved chunk partition reduced by
    # log2(chunk) full-width pairwise maxima instead of m_tile/chunk small
    # strided reductions; 8192/32 is the measured plateau
    # (scripts/probe_dense_tiles.py). precision="high3" = manual in-kernel
    # bf16_3x (~1e-6): the default None dot is bf16 1-pass (~1.6e-2) and
    # MEASURABLY drops true top-5 docs on this corpus (985/1024 full-batch
    # parity at 124K q/s — timed below for the record, never headline);
    # high3 measures 1024/1024 at 92K (docs/DESIGN.md). First compile
    # ~minutes through the remote compile service; cached persistently.
    from ircl_tpu.ops.dense_topk_pallas import cosine_topk_fused, pad_corpus_t

    ct, m_real = pad_corpus_t(corpus, m_tile=8192)
    ct_d = jax.device_put(ct)
    # Explicit f32 rescore rows: without them phase 2 falls back to
    # corpus_t.T INSIDE jit, re-materializing a [M_pad, D] transpose every
    # call — measured +16% from passing them (94.4K -> 109.5K same-session)
    rows = np.zeros((ct.shape[1], D), np.float32)
    rows[:M] = corpus
    rows_d = jax.device_put(rows)
    s4, i4 = cosine_topk_fused(
        q_d, ct_d, k=K, chunk=32, m_tile=8192, m_real=m_real,
        epilogue="fold", precision="high3", corpus_rows=rows_d,
    )
    s4, i4 = np.asarray(s4), np.asarray(i4)
    spot_check(s4, i4, "fused(pallas, high3)")
    qps_fused = steady(
        lambda: cosine_topk_fused(
            q_d, ct_d, k=K, chunk=32, m_tile=8192, m_real=m_real,
            epilogue="fold", precision="high3", corpus_rows=rows_d,
        ),
        "fused pallas bf16_3x (fold/high3)",
    )
    steady(  # informational only: bf16-1-pass selection, NOT exact here
        lambda: cosine_topk_fused(
            q_d, ct_d, k=K, chunk=32, m_tile=8192, m_real=m_real,
            epilogue="fold", precision=None, corpus_rows=rows_d,
        ),
        "fused fold/None (inexact on this corpus; informational)",
    )

    # Headline = fastest engine whose results are VERIFIED exact vs numpy
    # f32 on the FULL batch below, every run. qps_flat and qps_two_fast run
    # the default-precision (bf16-input) dot and only track numpy to ~5e-3
    # — never headline candidates. The fused/high3 selection error is
    # ~1e-6-class (measured 1024/1024 here), but exactness is still gated
    # per-run rather than assumed.
    candidates = [
        (qps_fused, "fused_fold_high3", lambda: cosine_topk_fused(
            q_d, ct_d, k=K, chunk=32, m_tile=8192, m_real=m_real,
            epilogue="fold", precision="high3", corpus_rows=rows_d)),
        (qps_two, "twophase_highest", lambda: cosine_topk_twophase(
            q_d, corpus_d, k=K, chunk=128, precision="highest")),
        (qps_scan, "scan_highest", lambda: cosine_topk_scan(
            q_d, corpus_d, k=K, chunk=64, block=200_000,
            precision="highest")),
    ]
    candidates.sort(key=lambda c: -c[0])
    t0 = time.time()
    # The corpus/queries are seed-deterministic, so the exact reference is
    # cacheable across runs (~5 min of single-core BLAS otherwise).
    cache_path = f"/tmp/ircl_dense_ref_{M}x{D}_B{B}_K{K}_seed0.npz"
    try:
        z = np.load(cache_path)
        ref_s, ref_i = z["s"], z["i"]
        log(f"full-batch numpy reference loaded from {cache_path}")
    except Exception:
        ref_s, ref_sets_list = _topk_ref_blocked(queries, corpus, K)
        ref_i = np.array(
            [sorted(s) for s in ref_sets_list], dtype=np.int64
        )
        np.savez(cache_path, s=ref_s, i=ref_i)
        log(f"full-batch numpy reference in {time.time()-t0:.1f}s")
    ref_sets = [set(row.tolist()) for row in ref_i]
    qps = name = None
    for c_qps, c_name, fn in candidates:
        sw, iw = (np.asarray(a) for a in fn())
        bad_s = bad_i = 0
        for b in range(B):
            bad_s += not np.allclose(sw[b], ref_s[b], rtol=1e-5)
            bad_i += set(iw[b].tolist()) != ref_sets[b]
        # Gate on the sorted top-5 SCORES (id-set diffs with matching
        # scores are f32-resolution ties — counted, not failed).
        log(
            f"{c_name}: FULL-batch score parity {B - bad_s}/{B}"
            f" (id-set tie swaps: {bad_i})"
        )
        if bad_s == 0:
            qps, name = c_qps, c_name
            break
        log(f"{c_name} failed full-batch exactness — falling back")
    assert qps is not None, "no dense engine passed full-batch exactness"
    log(f"headline engine: {name}")
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
