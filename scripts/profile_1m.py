"""Stage breakdown of the staged bucketed hybrid at 1M docs.

Times the serving pipeline's device stages as separate jitted programs
(cached 1M synthetic index, pinned query batch): doc slabs, query slab,
scores matmul, flat top-k, and the full merge — to locate where the
~180ms/batch goes before attempting any further kernel work. Timings are
end-to-end with a real host transfer (axon's block_until_ready can return
early).

Run from the repo root: ``python scripts/profile_1m.py [--docs N]``.
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
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--d-tile", type=int, default=None,
                    help="doc-axis slab tile; default = the ranker's "
                         "auto-resolved serving value")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ircl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench_scale import synth_index
    from ircl_tpu.index.build import CountIndex
    from ircl_tpu.index.ranker import TfidfRanker
    from ircl_tpu.index.split import gather_light_pools
    from ircl_tpu.index.tfidf import idf_vector
    from ircl_tpu.ops import hybrid as hy
    from ircl_tpu.ops.membership_pallas import pad_for_slab

    cache = f"/tmp/ircl_scale_{args.docs}_96_2000000.npz"
    t0 = time.time()
    if os.path.exists(cache):
        index = CountIndex.load(cache)
    else:
        index = synth_index(args.docs, 96, 2_000_000, 1 << 24)
        index.save(cache)
    log(f"index ready in {time.time()-t0:.0f}s ({index.nnz} postings)")

    ranker = TfidfRanker(
        index, mode="hybrid", df_threshold=256, width_buckets=2,
        precision="high", fixed_max_terms=24, d_tile=args.d_tile,
    )
    d_tile = ranker.d_tile  # profile the ACTUAL serving tile, not a constant
    log(f"d_tile={d_tile}")
    B = args.batch
    rng = np.random.default_rng(7)
    occupied = np.flatnonzero(index.doc_freqs)
    qb = occupied[rng.integers(0, len(occupied), size=(B, 24))].astype(np.int32)
    idfs = idf_vector(index.doc_freqs, index.num_docs)
    qw = (np.log1p(1.0) * idfs[qb]).astype(np.float32)

    # replicate the ranker's query prep (hybrid_from_vectors_async)
    split = ranker._split
    heavy_q = split.doc_freqs[qb] > split.df_threshold
    hw = np.where(heavy_q, qw, 0.0).astype(np.float32)
    u_pad = ranker._union_slots(qb, hw, floor=ranker.fixed_union_cap or 512)
    key = np.where(hw != 0.0, qb, np.int32(2**31 - 1))
    order = np.argsort(key, axis=1, kind="stable")
    sb = np.take_along_axis(qb, order, axis=1).astype(np.int32)
    sw = np.take_along_axis(hw, order, axis=1)
    sb = np.where(sw != 0.0, sb, -1)
    qb_t, qw_t = pad_for_slab(
        np.ascontiguousarray(sb.T), np.ascontiguousarray(sw.T), d_tile=128
    )
    t0 = time.time()
    ld, lc, _ = gather_light_pools(
        split, qb, qw,
        old2pos=ranker._bucketed.old2pos,
        sort_pools=True,
        pad_doc=len(ranker._bucketed.pos2old),
    )
    host_gather_s = time.time() - t0
    log(f"host pool gather: {host_gather_s*1000:.1f} ms  (P={ld.shape[1]})")

    u_sorted = jnp.asarray(u_pad)
    qb_j, qw_j = jnp.asarray(qb_t), jnp.asarray(qw_t)
    ld_j, lc_j = jnp.asarray(ld), jnp.asarray(lc)
    ta, va = ranker._heavy_a
    tb, vb = ranker._heavy_b
    U = u_pad.shape[0]
    u_tile = hy._u_tile(U)
    prec = hy._PREC["high"]
    log(f"U={U}, u_tile={u_tile}, K_a={ta.shape[0]}, Na={ta.shape[1]}, "
        f"K_b={tb.shape[0]}, Nb={tb.shape[1]}")

    from ircl_tpu.ops.membership_pallas import membership_slab_windowed

    slab_a = jax.jit(lambda u, t, v: membership_slab_windowed(
        u, t, v, u_tile=u_tile, d_tile=d_tile))
    slab_q = jax.jit(lambda u, t, v: membership_slab_windowed(
        u, t, v, u_tile=u_tile, d_tile=128))

    @jax.jit
    def scores_only(u, ta, va, tb, vb, qb_t, qw_t):
        ma = membership_slab_windowed(u, ta, va, u_tile=u_tile, d_tile=d_tile)
        mb = membership_slab_windowed(u, tb, vb, u_tile=u_tile, d_tile=d_tile)
        wt = membership_slab_windowed(u, qb_t, qw_t, u_tile=u_tile, d_tile=128)
        m = jnp.concatenate([ma, mb], axis=1)
        return jax.lax.dot_general(
            wt, m, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )[:B]

    @jax.jit
    def topk_only(h):
        return jax.lax.top_k(h, 5)

    @jax.jit
    def merge_only(h, ld, lc):
        return hy._merge_light(h, ld, lc, 5, h.shape[1])

    full = jax.jit(lambda u, ta, va, tb, vb, q1, q2, ld, lc:
                   hy.hybrid_topk_bucketed(
                       ta, va, tb, vb, u, q1, q2, ld, lc, k=5,
                       precision="high", queries_sorted=True,
                       d_tile=d_tile))

    res = {"host_pool_gather_ms": round(host_gather_s * 1000, 1),
           "U": int(U), "P": int(ld.shape[1]), "d_tile": int(d_tile)}

    t = timed(slab_a, u_sorted, ta, va)
    res["slab_narrow_ms"] = round(t * 1000, 1)
    log(f"doc slab (narrow bucket): {t*1000:.1f} ms")
    t = timed(slab_a, u_sorted, tb, vb)
    res["slab_wide_ms"] = round(t * 1000, 1)
    log(f"doc slab (wide bucket): {t*1000:.1f} ms")
    t = timed(slab_q, u_sorted, qb_j, qw_j)
    res["query_slab_ms"] = round(t * 1000, 1)
    log(f"query slab: {t*1000:.1f} ms")

    t = timed(scores_only, u_sorted, ta, va, tb, vb, qb_j, qw_j)
    res["slabs_plus_matmul_ms"] = round(t * 1000, 1)
    log(f"slabs + matmul -> h: {t*1000:.1f} ms")

    h = scores_only(u_sorted, ta, va, tb, vb, qb_j, qw_j)
    jax.block_until_ready(h)
    t = timed(topk_only, h)
    res["flat_topk_ms"] = round(t * 1000, 1)
    log(f"flat top-k over h: {t*1000:.1f} ms")
    t = timed(merge_only, h, ld_j, lc_j)
    res["merge_light_ms"] = round(t * 1000, 1)
    log(f"full light merge: {t*1000:.1f} ms")

    t = timed(full, u_sorted, ta, va, tb, vb, qb_j, qw_j, ld_j, lc_j)
    res["full_pipeline_ms"] = round(t * 1000, 1)
    res["full_pipeline_qps"] = round(B / t, 0)
    log(f"full fused program: {t*1000:.1f} ms ({B/t:.0f} q/s)")

    print(json.dumps(res))


if __name__ == "__main__":
    main()
