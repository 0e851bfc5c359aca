"""Probe 3: fold-epilogue tile/chunk grid at the SERVING precision (high3).

probe_dense_tiles.py picked 8192/32 — but at precision=None (bf16 1-pass).
The headline engine runs high3 (manual in-kernel bf16_3x: 3 one-pass MXU
dots), which triples the dot work per tile and so can move the optimum:
the epilogue (log2(chunk) full-width maxima per m_tile) is a fixed cost
per tile that the bigger dot amortizes differently. Re-sweep at high3 with
corpus_rows threaded (the +16% phase-2 fix bench_dense.py uses).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ircl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ircl_tpu.ops.dense_topk_pallas import cosine_topk_fused, pad_corpus_t
    from ircl_tpu.utils.benchtime import check_topk, log, steady as _steady

    M, D, B, K = 1_000_000, 128, 1024, 5
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(M, D)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.normal(size=(B, D)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    q_d = jax.device_put(queries)

    n_chk = 64
    ref = queries[:n_chk] @ corpus.T

    def steady(fn, label, reps=20):
        return _steady(fn, label, batch=B, reps=reps)

    # First entry repeats the incumbent as a throwaway warm-up (first
    # steady() in a fresh process reads ~3x slow: lazy uploads), then the
    # incumbent again for its real number, then the grid.
    grid = [
        (8192, 32), (8192, 32), (8192, 16), (8192, 64), (8192, 8),
        (16384, 32), (16384, 16), (16384, 64),
    ]
    results = []
    cache = {}
    for m_tile, chunk in grid:
        label = f"fold/high3 {m_tile}/{chunk}"
        t0 = time.time()
        # The try spans pad->device_put->first call->steady: the 16384
        # VMEM-spill failure (131MB of register spill slots: the hi/lo
        # split triples live values) can surface at ANY of those points
        # (deferred compile inside the timing loop killed a prior sweep).
        try:
            if m_tile not in cache:
                ct, m_real = pad_corpus_t(corpus, m_tile=m_tile)
                rows = np.zeros((ct.shape[1], D), np.float32)
                rows[:M] = corpus
                cache[m_tile] = (
                    jax.device_put(ct), jax.device_put(rows), m_real
                )
            ct_d, rows_d, m_real = cache[m_tile]
            s, i = cosine_topk_fused(
                q_d, ct_d, k=K, chunk=chunk, m_tile=m_tile, m_real=m_real,
                epilogue="fold", precision="high3", corpus_rows=rows_d,
            )
            jax.block_until_ready((s, i))
            log(f"{label}: first call {time.time()-t0:.1f}s")
            ok = check_topk(s, i, ref, K, label)
            qps = steady(
                lambda ct_d=ct_d, rows_d=rows_d, m_real=m_real,
                m_tile=m_tile, chunk=chunk:
                cosine_topk_fused(
                    q_d, ct_d, k=K, chunk=chunk, m_tile=m_tile,
                    m_real=m_real, epilogue="fold", precision="high3",
                    corpus_rows=rows_d,
                ),
                label,
            )
        except Exception as e:  # VMEM OOM etc: record and keep sweeping
            log(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}")
            results.append((label, 0.0, False))
            continue
        results.append((label, qps, ok))

    for label, qps, ok in results:
        print(f"{label}: {qps:.0f} q/s parity_ok={ok}")


if __name__ == "__main__":
    main()
