"""Probe: fused dense top-k kernel precision ladder at 1M x 128, B=1024.

The round-3 fused kernel (82.9K q/s) runs its in-kernel dot at Mosaic's
default f32 handling; per-cell time (~101us) decomposes as ~64us multi-pass
f32 MXU dot + ~30us chunk-max epilogue, so precision — not HBM or the MXU
roofline — is the binding constraint. This probe measures:

  A  precision=None       (round-3 baseline, reproduces 82.9K)
  B  precision="high"     bf16_3x dot (~1e-6 rel err, sparse engine's trick)
  C  precision="default"  1-pass bf16 dot + extra_chunks slack
  D  bf16-stored corpus   halves the HBM read too + f32 rescore rows

Each variant's top-k is checked against numpy f32 on 64 queries (scores
rtol 1e-5 AND exact index-set agreement — the rescore is f32 HIGHEST, so
any superset miss shows up as an index mismatch).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ircl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ircl_tpu.ops.dense_topk_pallas import cosine_topk_fused, pad_corpus_t

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
        s, i = np.asarray(s), np.asarray(i)
        bad = 0
        for b in range(n_chk):
            order = np.argsort(-ref[b], kind="stable")[:K]
            ok_s = np.allclose(s[b], ref[b][order], rtol=1e-5)
            ok_i = set(i[b].tolist()) == set(order.tolist())
            bad += not (ok_s and ok_i)
        log(f"{label}: parity {n_chk - bad}/{n_chk}")
        return bad == 0

    def steady(fn, label, reps=20):
        t0 = time.time()
        outs = [fn() for _ in range(reps)]
        jax.block_until_ready(outs)
        _ = np.asarray(outs[-1][0][:1])
        dt = time.time() - t0
        qps = reps * B / dt
        log(f"{label}: {qps:.0f} q/s ({dt/reps*1000:.2f} ms/batch)")
        return qps

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
