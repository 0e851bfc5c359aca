"""Probe 2: fold-epilogue fused dense top-k — tile/chunk grid at 1M x 128.

Follow-up to probe_dense_precision.py (fold/f32 won: 101K q/s vs 31K for
the round-3 loop epilogue in the same session; bf16 + slack chunks lost its
kernel gain to the tripled phase-2 gather). Here: does a larger m_tile
(fits since the 100MB scoped-vmem raise) or a different chunk move it?
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

    def check(s, i, label):
        return check_topk(s, i, ref, K, label)

    def steady(fn, label, reps=20):
        return _steady(fn, label, batch=B, reps=reps)

    # First entry is a throwaway warm-up: the first steady() in a fresh
    # process absorbs lazy uploads / allocator warm-up and reads ~3x slow
    # (measured: identical 8192/64 config 31K first-in-run, 101-103K later).
    grid = [
        (16384, 128), (8192, 32), (16384, 32), (8192, 16), (8192, 64),
    ]
    results = {}
    cache = {}
    for m_tile, chunk in grid:
        if m_tile not in cache:
            ct, m_real = pad_corpus_t(corpus, m_tile=m_tile)
            cache[m_tile] = (jax.device_put(ct), m_real)
        ct_d, m_real = cache[m_tile]
        label = f"fold {m_tile}/{chunk}"
        t0 = time.time()
        # precision=None explicitly: this sweep's recorded numbers are the
        # bf16-1-pass fast mode (the kernel default is now "high3")
        s, i = cosine_topk_fused(
            q_d, ct_d, k=K, chunk=chunk, m_tile=m_tile, m_real=m_real,
            epilogue="fold", precision=None,
        )
        jax.block_until_ready((s, i))
        log(f"{label}: first call {time.time()-t0:.1f}s")
        ok = check(s, i, label)
        qps = steady(
            lambda ct_d=ct_d, m_real=m_real, m_tile=m_tile, chunk=chunk:
            cosine_topk_fused(
                q_d, ct_d, k=K, chunk=chunk, m_tile=m_tile, m_real=m_real,
                epilogue="fold", precision=None,
            ),
            label,
        )
        results[label] = (qps, ok)

    for label, (qps, ok) in results.items():
        print(f"{label}: {qps:.0f} q/s parity_ok={ok}")


if __name__ == "__main__":
    main()
