"""Probe: fused dense top-k kernel epilogue/precision at 1M x 128, B=1024.

The round-3 fused kernel (82.9K q/s) runs its in-kernel dot at Mosaic's
default precision — later measured (chunk=1 probe, see
ops/dense_topk_pallas.py docstring) to be the bf16-input 1-pass, NOT a
multi-pass f32 dot as this probe originally assumed. Variants measured
(chunk=64; the production config later moved to chunk=32 via
probe_dense_tiles.py):

  A  loop epilogue, f32 corpus      (round-3 baseline)
  E  fold epilogue, f32 corpus      (interleaved chunk partition, log2(chunk)
                                     full-width pairwise maxima — the winner)
  F  fold, bf16-stored corpus + extra_chunks=8 slack + f32 rescore rows
  D  loop, bf16-stored corpus + extra_chunks=8 slack + f32 rescore rows

``precision="high"`` (bf16_3x, the sparse engine's trick) is NOT probed:
Mosaic rejects Precision.HIGH on the in-kernel dot (CLAUDE.md). Each
variant's top-k is checked against numpy f32 on 64 queries (scores rtol
1e-5 AND exact index-set agreement — the rescore is f32 HIGHEST, so any
superset miss shows up as an index mismatch).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

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

    ct, m_real = pad_corpus_t(corpus, m_tile=8192)
    q_d = jax.device_put(queries)
    ct_d = jax.device_put(ct)
    ct_bf16_d = jax.device_put(ct.astype(jnp.bfloat16))
    rows_f32 = np.ascontiguousarray(ct.T)  # [M_pad, D] f32 rescore rows
    rows_d = jax.device_put(rows_f32)

    n_chk = 64
    ref = queries[:n_chk] @ corpus.T

    def check(s, i, label):
        return check_topk(s, i, ref, K, label)

    def steady(fn, label, reps=20):
        return _steady(fn, label, batch=B, reps=reps)

    variants = [
        ("A loop/f32", dict(precision=None, extra_chunks=0), ct_d, None),
        ("E fold/f32", dict(precision=None, extra_chunks=0, epilogue="fold"),
         ct_d, None),
        ("F fold/bf16+8", dict(precision=None, extra_chunks=8,
                               epilogue="fold"), ct_bf16_d, rows_d),
        ("D loop/bf16+8", dict(precision=None, extra_chunks=8),
         ct_bf16_d, rows_d),
    ]
    results = {}
    for label, kw, ctv, rowsv in variants:
        t0 = time.time()
        s, i = cosine_topk_fused(
            q_d, ctv, k=K, chunk=64, m_tile=8192, m_real=m_real,
            corpus_rows=rowsv, **kw,
        )
        jax.block_until_ready((s, i))
        log(f"{label}: first call {time.time()-t0:.1f}s")
        ok = check(s, i, label)
        qps = steady(
            lambda ctv=ctv, rowsv=rowsv, kw=kw: cosine_topk_fused(
                q_d, ctv, k=K, chunk=64, m_tile=8192, m_real=m_real,
                corpus_rows=rowsv, **kw,
            ),
            label,
        )
        results[label] = (qps, ok)

    for label, (qps, ok) in results.items():
        print(f"{label}: {qps:.0f} q/s parity_ok={ok}")


if __name__ == "__main__":
    main()
