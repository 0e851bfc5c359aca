"""Tile sweep for the windowed membership-slab kernel at the bench shape.

profile_50k: narrow-bucket doc slab 34.2 ms over a (16, 127) grid of
[512, 256] tiles, wide bucket 28.9 ms over (16, 69) — ~15-25 us/grid-step
against a ~1-2 ms VPU + ~1 ms HBM-write bound, the same per-step-overhead
signature the light_add_topk sweep exposed. Sweeps the doc-axis d_tile
(u_tile is pinned by the union width) with exact output equality checked
against the incumbent on every point (the slab is a deterministic fill —
no tie ambiguity).

Run from the repo root: ``python scripts/probe_slab_tiles.py``.
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

    from ircl_tpu.corpus.store import MemoryDocStore
    from ircl_tpu.corpus.synthetic import generate
    from ircl_tpu.index.build import build_count_index
    from ircl_tpu.index.ranker import TfidfRanker, vectorize_queries
    from ircl_tpu.index.tfidf import tfidf_transform
    from ircl_tpu.ops import hybrid as hy
    from ircl_tpu.ops.membership_pallas import (
        membership_slab_windowed,
        pad_for_slab,
    )

    HASH_SIZE = 1 << 24
    B = 4096
    t0 = time.time()
    wiki = generate(num_docs=50_000, num_claims=B, seed=11)
    claims = [c.claim for c in wiki.claims]
    store = MemoryDocStore({d: r["text"] for d, r in wiki.docs.items()})
    index = tfidf_transform(
        build_count_index(store, ngram=2, hash_size=HASH_SIZE)
    )
    log(f"bench corpus + index in {time.time()-t0:.0f}s")

    ranker = TfidfRanker(
        index, mode="hybrid", df_threshold=24, width_buckets=2,
        fixed_union_cap=4096, fixed_max_terms=64, precision="high",
        union_round=512,
    )
    buckets, weights = vectorize_queries(
        claims, HASH_SIZE, 2, index.doc_freqs, index.num_docs, max_terms=64,
    )
    split = ranker._split
    heavy_q = split.doc_freqs[buckets] > split.df_threshold
    hw = np.where(heavy_q, weights, 0.0).astype(np.float32)
    u_pad = ranker._union_slots(
        buckets, hw, floor=ranker.fixed_union_cap or 512
    )
    u_sorted = jnp.asarray(u_pad)
    u_tile = hy._u_tile(u_pad.shape[0])
    ta, va = ranker._heavy_a  # device arrays, pad_tile-aligned (256)
    tb, vb = ranker._heavy_b
    ta_h, va_h = np.asarray(ta), np.asarray(va)
    tb_h, vb_h = np.asarray(tb), np.asarray(vb)
    log(f"U={u_pad.shape[0]} u_tile={u_tile} "
        f"narrow {ta_h.shape} wide {tb_h.shape}")

    def run(terms_h, vals_h, d_tile, u_t, reps=8):
        # re-pad the k-major arrays to this d_tile's multiple
        t_p, v_p = pad_for_slab(terms_h, vals_h, d_tile=d_tile)
        t_d, v_d = jnp.asarray(t_p), jnp.asarray(v_p)
        fn = jax.jit(lambda u, t, v: membership_slab_windowed(
            u, t, v, u_tile=u_t, d_tile=d_tile))
        out = fn(u_sorted, t_d, v_d)
        jax.block_until_ready(out)
        _ = np.asarray(out[:1, :1])
        t0 = time.time()
        for _ in range(reps):
            out = fn(u_sorted, t_d, v_d)
        jax.block_until_ready(out)
        _ = np.asarray(out[:1, :1])
        return (time.time() - t0) / reps, out

    results = []
    # (d_tile, u_tile) pairs — u_tile trades grid cells against window
    # width (wider u value range per tile -> more k iterations)
    cfgs = [
        (256, u_tile), (256, u_tile), (512, u_tile), (1024, u_tile),
        (2048, u_tile), (1024, u_tile), (1024, 1024), (1024, 256),
        (512, 1024), (1024, u_tile), (256, u_tile),
    ]
    doc_sections = (
        () if "--query-only" in sys.argv
        else (("narrow", (ta_h, va_h)), ("wide", (tb_h, vb_h)))
    )
    for name, (t_h, v_h) in doc_sections:
        ref = None
        n_real = t_h.shape[1]
        for d_tile, u_t in cfgs:
            label = f"{name} u_tile={u_t} d_tile={d_tile}"
            if u_pad.shape[0] % u_t:
                log(f"skip {label}: u mismatch")
                continue
            try:
                t, out = run(t_h, v_h, d_tile, u_t)
            except Exception as e:
                log(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}")
                continue
            m = np.asarray(out)[:, :n_real]
            if ref is None:
                ref = m
                log(f"{label}: {t*1000:.1f} ms (reference)")
                ok = True
            else:
                ok = bool((m == ref).all())
                log(f"{label}: {t*1000:.1f} ms exact={ok}")
            results.append((label, round(t * 1000, 2), ok))

    # query slab: [U, B] fill — the b-axis tile is the same d_tile knob.
    # Mirror the engine's sorted query ELL prep (profile_50k.py).
    key = np.where(hw != 0.0, buckets, np.int32(2**31 - 1))
    order = np.argsort(key, axis=1, kind="stable")
    sb = np.take_along_axis(buckets, order, axis=1).astype(np.int32)
    sw = np.take_along_axis(hw, order, axis=1)
    sb = np.where(sw != 0.0, sb, -1)
    qb_h = np.ascontiguousarray(sb.T)
    qw_h = np.ascontiguousarray(sw.T)
    ref = None
    for b_t, u_t in ((128, u_tile), (128, u_tile), (512, u_tile),
                     (1024, u_tile), (512, 1024), (128, u_tile)):
        label = f"query b_tile={b_t} u_tile={u_t}"
        if u_pad.shape[0] % u_t or qb_h.shape[1] % b_t:
            log(f"skip {label}")
            continue
        try:
            t, out = run(qb_h, qw_h, b_t, u_t)
        except Exception as e:
            log(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}")
            continue
        m = np.asarray(out)
        if ref is None:
            ref = m
            log(f"{label}: {t*1000:.1f} ms (reference)")
            ok = True
        else:
            ok = bool((m[:, : ref.shape[1]] == ref).all())
            log(f"{label}: {t*1000:.1f} ms exact={ok}")
        results.append((label, round(t * 1000, 2), ok))

    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
