"""Decompose the 41.5 ms fused light/select stage into primitives.

probe_chunkmax measured current-kernel, kernel+pallas-final, and the
chunk-max+merge redesign all at ~41.5 ms in ONE jit — the earlier
per-stage numbers (48.9 + 13.6 ms) were inflated by per-dispatch tunnel
overhead. This probe times each primitive alone (same h_t/pools inputs)
to find the real floor:

  read        h_t.max(axis=0)               — pure HBM read bound
  chunkmax    reshape-max to [n_chunks, B]  — same read, strided write
  kernel      light_add_topk_t (1024 tile)  — the current selection
  pallas_topk topk_rows on [1600, B]        — empty-pool kernel top-k
  lax_topk    lax.top_k on [B, 400]         — the current final stage
  gather      take_along_axis [160, B] rows from h_t
  run_totals  compensated pool run totals [B, 128]
  dup         [160, 128, B] candidate-dedup compare

Run from the repo root: ``python scripts/probe_light_decomp.py``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ircl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ircl_tpu.ops import hybrid as hy
    from ircl_tpu.ops.light_add_pallas import light_add_topk_t

    B, N, P, K, CH = 4096, 51200, 128, 5, 32
    rng = np.random.default_rng(0)
    # Generate the big arrays ON DEVICE: a device_put of the 840MB h_t
    # through the axon tunnel stalls many minutes (lazy upload). Values are
    # irrelevant to primitive timing; pools are doc-sorted ascending.
    kx = jax.random.PRNGKey(0)

    @jax.jit
    def gen():
        return jax.random.uniform(
            kx, (N, B), jnp.float32, 0.0, 8.0
        )

    h_t = gen()
    pool_docs = np.sort(
        rng.integers(0, N, size=(P, B), dtype=np.int32), axis=0
    )
    pool_vals = rng.gamma(1.5, 1.0, size=(P, B)).astype(np.float32)
    sd_t = jax.device_put(pool_docs)
    sv_t = jax.device_put(pool_vals)
    flat_idx = jax.device_put(
        rng.integers(0, N, size=(K * CH, B), dtype=np.int32)
    )
    jax.block_until_ready((h_t, sd_t, sv_t, flat_idx))

    n_chunks = N // CH

    def topk_rows(x, k):
        R = x.shape[0]
        empty_d = jnp.full((8, x.shape[1]), R, jnp.int32)
        empty_v = jnp.zeros((8, x.shape[1]), jnp.float32)
        s, i = light_add_topk_t(
            x, empty_d, empty_v, k=k, b_tile=128, d_tile=R
        )
        return s[:k], i[:k]

    cm = jax.jit(
        lambda h: h.reshape(n_chunks, CH, B).max(axis=1)
    )(h_t)
    small = jax.device_put(
        rng.normal(size=(B, 400)).astype(np.float32)
    )
    jax.block_until_ready((cm, small))

    cases = {
        "read_max": jax.jit(lambda: h_t.max(axis=0)),
        "chunkmax": jax.jit(
            lambda: h_t.reshape(n_chunks, CH, B).max(axis=1)
        ),
        "kernel_1024": jax.jit(
            lambda: light_add_topk_t(
                h_t, sd_t, sv_t, k=K, b_tile=128, d_tile=1024
            )
        ),
        "kernel_nopool_1024": jax.jit(
            lambda: light_add_topk_t(
                h_t,
                jnp.full((8, B), N, jnp.int32),
                jnp.zeros((8, B), jnp.float32),
                k=K, b_tile=128, d_tile=1024,
            )
        ),
        "pallas_topk_1600": jax.jit(lambda: topk_rows(cm, K)),
        "lax_topk_400": jax.jit(lambda: jax.lax.top_k(small, K)),
        "lax_topk_1600T": jax.jit(lambda: jax.lax.top_k(cm.T, K)),
        "gather_160": jax.jit(
            lambda: jnp.take_along_axis(h_t, flat_idx, axis=0)
        ),
        "run_totals": jax.jit(lambda: hy._run_totals(sd_t.T, sv_t.T)),
        "dup_compare": jax.jit(
            lambda: jnp.any(
                flat_idx[:, None, :] == sd_t[None, :, :], axis=1
            )
        ),
    }

    results = {}
    for name, fn in cases.items():
        try:
            out = fn()
            jax.block_until_ready(out)
            _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
            reps = 10
            t0 = time.time()
            for _ in range(reps):
                out = fn()
            jax.block_until_ready(out)
            _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
            t = (time.time() - t0) / reps
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        log(f"{name}: {t*1000:.2f} ms")
        results[name] = round(t * 1000, 2)

    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
