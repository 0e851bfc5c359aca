"""Probe: can the heavy matmul run bf16 1-pass with slack + exact rescore?

The 50K fused pipeline is 132.8 ms with a 52.3 ms bf16_3x (precision
"high") matmul floor; DEFAULT (bf16 1-pass) would cut that floor to
~17 ms. Selection through bf16 scores is approximate (the dense fold/None
audit: 39/1024 top-5 misses at 1M), so the design would be: select
candidates from the fast scores, rescore them exactly, final top-k —
valid only if the TRUE top-5 always survives inside the candidate slack.

Measures, on the real bench corpus in ONE jit each:
  1. slabs+matmul at high vs default (the actual saving)
  2. full pipeline (current kernel selection) on default scores:
     how many queries' top-5 ids differ from the high path's
  3. containment: is the high top-5 id set inside the default path's
     top-C candidates for C in {8, 16, 32}? (the slack needed for an
     exact select+rescore design)

Run from the repo root: ``python scripts/probe_bf16_select.py``.
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
    from ircl_tpu.index.split import gather_light_pools
    from ircl_tpu.index.tfidf import tfidf_transform
    from ircl_tpu.ops import hybrid as hy
    from ircl_tpu.ops.light_add_pallas import light_add_topk_t
    from ircl_tpu.ops.membership_pallas import pad_for_slab

    HASH_SIZE = 1 << 24
    B, K = 4096, 5
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
    split = ranker._split
    buckets, weights = vectorize_queries(
        claims, HASH_SIZE, 2, index.doc_freqs, index.num_docs, max_terms=64,
    )
    heavy_q = split.doc_freqs[buckets] > split.df_threshold
    hw = np.where(heavy_q, weights, 0.0).astype(np.float32)
    u_pad = ranker._union_slots(
        buckets, hw, floor=ranker.fixed_union_cap or 512
    )
    key = np.where(hw != 0.0, buckets, np.int32(2**31 - 1))
    order = np.argsort(key, axis=1, kind="stable")
    sb = np.take_along_axis(buckets, order, axis=1).astype(np.int32)
    sw = np.take_along_axis(hw, order, axis=1)
    sb = np.where(sw != 0.0, sb, -1)
    qb_t, qw_t = pad_for_slab(
        np.ascontiguousarray(sb.T), np.ascontiguousarray(sw.T), d_tile=128
    )
    ld, lc, _ = gather_light_pools(
        split, buckets, weights, old2pos=ranker._bucketed.old2pos,
        sort_pools=True, pad_doc=len(ranker._bucketed.pos2old),
    )
    ta, va = ranker._heavy_a
    tb, vb = ranker._heavy_b
    d_tile_slab = ranker.d_tile
    u_sorted = jnp.asarray(u_pad)
    qb_j, qw_j = jnp.asarray(qb_t), jnp.asarray(qw_t)
    sd, sv = hy._sorted_pools(jnp.asarray(ld), jnp.asarray(lc), True)
    sd_t, sv_t = sd.T, sv.T
    jax.block_until_ready((sd_t, sv_t))

    def scores_fn(precision):
        prec = hy._PREC[precision]

        @jax.jit
        def f(u, ta, va, tb, vb, qb_t, qw_t):
            m, ut = hy._bucketed_membership(
                u, ta, va, tb, vb, d_tile_slab, False
            )
            wt = hy._query_slab(u, qb_t, qw_t, ut, False, True)
            return jax.lax.dot_general(
                m, wt, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )

        return f

    def timed(fn, *args, reps=8):
        out = fn(*args)
        jax.block_until_ready(out)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        return (time.time() - t0) / reps, out

    results = {}
    slab_args = (u_sorted, ta, va, tb, vb, qb_j, qw_j)
    for prec in ("high", "default", "highest"):
        t, h = timed(scores_fn(prec), *slab_args)
        log(f"slabs+matmul [{prec}]: {t*1000:.1f} ms")
        results[f"slabs_matmul_{prec}_ms"] = round(t * 1000, 2)
        if prec == "high":
            h_high = h
        elif prec == "default":
            h_def = h
    n_pad = h_high.shape[0]
    light_dt = next(t for t in (1024, 512, 256) if n_pad % t == 0)

    def select(h_t, k):
        tile_s, tile_i = light_add_topk_t(
            h_t, sd_t, sv_t, k=k, b_tile=128, d_tile=light_dt
        )
        top_s, top_pos = jax.lax.top_k(
            tile_s.T, min(k * (n_pad // light_dt), 64)
        )
        return top_s, jnp.take_along_axis(tile_i.T, top_pos, axis=1)

    sel5 = jax.jit(lambda h: select(h, K))
    sel16 = jax.jit(lambda h: select(h, 16))

    _, (s_hi, i_hi) = timed(sel5, h_high, reps=2)
    s_hi, i_hi = np.asarray(s_hi)[:, :K], np.asarray(i_hi)[:, :K]
    _, (s_df, i_df) = timed(sel5, h_def, reps=2)
    s_df, i_df = np.asarray(s_df)[:, :K], np.asarray(i_df)[:, :K]

    # top-5 id agreement (set-wise, tie-blind lower bound)
    miss_q = sum(
        1 for b in range(B) if set(i_hi[b]) != set(i_df[b])
    )
    log(f"default top-5 id set differs on {miss_q}/{B} queries")
    results["def_top5_set_miss_queries"] = miss_q

    # containment of true top-5 inside default's top-C (C from the k=16
    # per-tile selection's global candidates)
    _, (s_c, i_c) = timed(sel16, h_def, reps=2)
    i_c = np.asarray(i_c)  # [B, 64]
    for C in (8, 16, 32, 64):
        missing = 0
        for b in range(B):
            if not set(i_hi[b]).issubset(set(i_c[b, :C])):
                missing += 1
        log(f"true top-5 outside default top-{C}: {missing}/{B} queries")
        results[f"outside_top{C}"] = missing

    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
