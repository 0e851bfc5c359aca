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
    from ircl_tpu.dense.scorer import cosine_topk

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

    reps = 20
    t0 = time.time()
    outs = [cosine_topk(q_d, corpus_d, k=K) for _ in range(reps)]
    jax.block_until_ready(outs)
    dt = time.time() - t0
    qps = reps * B / dt
    log(f"steady {qps:.0f} q/s over {M} docs")
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
