"""Stage breakdown of the FUSED hybrid engine at the bench.py shape.

profile_1m.py decomposes the staged bucketed engine (1M docs); this does
the same for the 50K fused path the headline bench serves: doc slabs,
query slab, heavy matmul, the light_add_topk_t Pallas kernel, the final
winner top-k — against the measured full program. Uses the REAL bench
corpus (synthetic.generate seed 11) and the bench serving config
(df=24, B=4096, max_terms=64, union_cap 4096, union_round 512, high),
so the stage times add up to the serving batch the headline reports.

Run from the repo root: ``python scripts/profile_50k.py``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args, reps=4):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0][:1])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0][:1])
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--df-threshold", type=int, default=24)
    ap.add_argument("--union-round", type=int, default=512)
    args = ap.parse_args()

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
    from ircl_tpu.ops.membership_pallas import (
        membership_slab_windowed,
        pad_for_slab,
    )

    HASH_SIZE = 1 << 24
    B = args.batch
    t0 = time.time()
    wiki = generate(num_docs=args.docs, num_claims=B, seed=11)
    claims = [c.claim for c in wiki.claims]
    store = MemoryDocStore({d: r["text"] for d, r in wiki.docs.items()})
    index = tfidf_transform(
        build_count_index(store, ngram=2, hash_size=HASH_SIZE)
    )
    log(f"bench corpus + index in {time.time()-t0:.0f}s ({index.nnz} postings)")

    ranker = TfidfRanker(
        index, mode="hybrid", df_threshold=args.df_threshold,
        width_buckets=2, fixed_union_cap=4096, fixed_max_terms=64,
        precision="high", union_round=args.union_round,
    )
    d_tile = ranker.d_tile

    # --- replicate hybrid_from_vectors_async's host prep, timed ---------
    t0 = time.time()
    buckets, weights = vectorize_queries(
        claims, HASH_SIZE, 2, index.doc_freqs, index.num_docs,
        max_terms=64,
    )
    host_vec_s = time.time() - t0
    split = ranker._split
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
    t0 = time.time()
    ld, lc, _ = gather_light_pools(
        split, buckets, weights,
        old2pos=ranker._bucketed.old2pos,
        sort_pools=True,
        pad_doc=len(ranker._bucketed.pos2old),
    )
    host_gather_s = time.time() - t0

    ta, va = ranker._heavy_a
    tb, vb = ranker._heavy_b
    U = u_pad.shape[0]
    u_tile = hy._u_tile(U, d_tile)  # the ENGINE's pick (256 at d_tile 1024)
    prec = hy._PREC["high"]
    res = {
        "B": B, "U": int(U), "u_tile": int(u_tile), "d_tile": int(d_tile),
        "P": int(ld.shape[1]),
        "K_a": int(ta.shape[0]), "Na": int(ta.shape[1]),
        "K_b": int(tb.shape[0]), "Nb": int(tb.shape[1]),
        "host_vectorize_ms": round(host_vec_s * 1000, 1),
        "host_pool_gather_ms": round(host_gather_s * 1000, 1),
    }
    log(json.dumps(res))

    u_sorted = jnp.asarray(u_pad)
    qb_j, qw_j = jnp.asarray(qb_t), jnp.asarray(qw_t)
    ld_j, lc_j = jnp.asarray(ld), jnp.asarray(lc)

    slab_doc = jax.jit(lambda u, t, v: membership_slab_windowed(
        u, t, v, u_tile=u_tile, d_tile=d_tile))
    # mirror _query_slab's batch-tile pick (512 when the padded batch
    # admits it) so the stage time matches the serving kernel
    q_b_tile = 512 if qb_t.shape[1] % 512 == 0 else 128
    slab_q = jax.jit(lambda u, t, v: membership_slab_windowed(
        u, t, v, u_tile=u_tile, d_tile=q_b_tile))

    @jax.jit
    def scores_t(u, ta, va, tb, vb, qb_t, qw_t):
        m, ut = hy._bucketed_membership(u, ta, va, tb, vb, d_tile, False)
        wt = hy._query_slab(u, qb_t, qw_t, ut, False, True)
        return jax.lax.dot_general(
            m, wt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    @jax.jit
    def light_stage(h_t, ld, lc):
        b_pad = -(-B // 128) * 128
        sd, sv = hy._sorted_pools(ld, lc, True)
        if b_pad != B:
            sd = jnp.pad(sd, ((0, b_pad - B), (0, 0)))
            sv = jnp.pad(sv, ((0, b_pad - B), (0, 0)))
        # mirror hybrid_topk_bucketed_fused's adaptive doc-tile pick
        light_dt = next(
            t for t in (1024, 512, 256) if h_t.shape[0] % t == 0
        )
        return light_add_topk_t(
            h_t[:, :b_pad], sd.T, sv.T, k=5, b_tile=128, d_tile=light_dt,
        )

    @jax.jit
    def final_topk(tile_s, tile_i):
        top_s, top_pos = jax.lax.top_k(
            tile_s.T[:B], min(5, tile_s.shape[0])
        )
        return top_s, jnp.take_along_axis(tile_i.T[:B], top_pos, axis=1)

    full = jax.jit(lambda u, ta, va, tb, vb, q1, q2, ld, lc:
                   hy.hybrid_topk_bucketed_fused(
                       ta, va, tb, vb, u, q1, q2, ld, lc, k=5,
                       precision="high", queries_sorted=True,
                       pools_sorted=True, d_tile=d_tile))

    t = timed(slab_doc, u_sorted, ta, va)
    res["slab_narrow_ms"] = round(t * 1000, 1)
    log(f"doc slab (narrow bucket): {t*1000:.1f} ms")
    t = timed(slab_doc, u_sorted, tb, vb)
    res["slab_wide_ms"] = round(t * 1000, 1)
    log(f"doc slab (wide bucket): {t*1000:.1f} ms")
    t = timed(slab_q, u_sorted, qb_j, qw_j)
    res["query_slab_ms"] = round(t * 1000, 1)
    log(f"query slab: {t*1000:.1f} ms")

    t = timed(scores_t, u_sorted, ta, va, tb, vb, qb_j, qw_j)
    res["slabs_plus_matmul_ms"] = round(t * 1000, 1)
    log(f"slabs + heavy matmul -> h_t: {t*1000:.1f} ms")

    h_t = scores_t(u_sorted, ta, va, tb, vb, qb_j, qw_j)
    jax.block_until_ready(h_t)
    t = timed(light_stage, h_t, ld_j, lc_j)
    res["light_add_topk_ms"] = round(t * 1000, 1)
    log(f"light_add_topk_t kernel: {t*1000:.1f} ms")

    ts_, ti_ = light_stage(h_t, ld_j, lc_j)
    jax.block_until_ready((ts_, ti_))
    t = timed(final_topk, ts_, ti_)
    res["final_topk_ms"] = round(t * 1000, 1)
    log(f"final winner top-k: {t*1000:.1f} ms")

    t = timed(full, u_sorted, ta, va, tb, vb, qb_j, qw_j, ld_j, lc_j)
    res["full_pipeline_ms"] = round(t * 1000, 1)
    res["full_pipeline_qps"] = round(B / t, 0)
    log(f"full fused program: {t*1000:.1f} ms ({B/t:.0f} q/s)")

    # matmul-only floor at this precision/pad for context
    n_pad = ta.shape[1] + tb.shape[1]
    passes = {"highest": 6, "high": 3}.get("high", 1)
    flops = 2 * passes * B * U * n_pad
    res["heavy_matmul_floor_ms"] = round(flops / 197e12 * 1000, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
