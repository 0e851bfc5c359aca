"""Probe: chunk-max + candidate-merge replacement for the fused light stage.

The fused path's cost after the 1024-tile fix is light_add_topk 48.9 ms +
final lax.top_k 13.6 ms (profile_50k). Both are selection overhead: the
kernel runs 5 argmax/mask rounds over EVERY [1024, 128] tile, and XLA's
TopK costs ~8.5 ns/element even at [4096, 400].

This probe times the exact alternative built from the dense engine's
superset argument plus the staged engine's light merge:

  1. chunk maxima of h alone (XLA reshape-max, one h_t read)
  2. top-k CHUNKS per query via the light_add kernel with an EMPTY pool
     and a single doc tile (a [n_chunks, B] global top-k in one pass)
  3. gather the k*chunk chunk-member h values (per-column gather)
  4. light candidates = pool run-ends (compensated _run_totals) + h at
     those docs; heavy entries duplicated in the pool are masked
  5. one more empty-pool kernel top-k over the [~288, B] candidates

Exactness: light contributions are non-negative, so any true top-k doc
either has no pool entry (then its total IS h, covered by the top-k
chunks of h: >=k chunks with higher max would mean >=k docs with higher
totals) or is a pool run-end candidate with its exact total. Scores can
differ from the in-kernel sequential adds by f32 rounding (the run totals
are dd-compensated); ids can churn on exact ties.

Run from the repo root: ``python scripts/probe_chunkmax.py``.
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
    B = 4096
    K = 5
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
    prec = hy._PREC["high"]
    num_real = len(ranker._bucketed.pos2old)

    @jax.jit
    def scores_t(u, ta, va, tb, vb, qb_t, qw_t):
        m, ut = hy._bucketed_membership(
            u, ta, va, tb, vb, d_tile_slab, False
        )
        wt = hy._query_slab(u, qb_t, qw_t, ut, False, True)
        return jax.lax.dot_general(
            m, wt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    u_sorted = jnp.asarray(u_pad)
    h_t = scores_t(
        u_sorted, ta, va, tb, vb, jnp.asarray(qb_t), jnp.asarray(qw_t)
    )
    sd, sv = hy._sorted_pools(jnp.asarray(ld), jnp.asarray(lc), True)
    sd_t, sv_t = sd.T, sv.T  # [P, B]
    jax.block_until_ready((h_t, sd_t, sv_t))
    n_pad = h_t.shape[0]
    P = sd_t.shape[0]
    log(f"h_t {h_t.shape}, pools {sd_t.shape}, num_real={num_real}")

    # empty pool for pure-top-k kernel calls: doc=n_pad (never matches a
    # tile range), contrib 0 — window bounds collapse to lo=hi=0
    def topk_rows(x, k):
        """Global (score, row) top-k of a [R, B] matrix via the Pallas
        kernel with one doc tile and an empty pool."""
        R = x.shape[0]
        empty_d = jnp.full((8, x.shape[1]), R, jnp.int32)
        empty_v = jnp.zeros((8, x.shape[1]), jnp.float32)
        s, i = light_add_topk_t(
            x, empty_d, empty_v, k=k, b_tile=128, d_tile=R
        )
        return s[:k], i[:k]  # [k, B]

    CH = 32

    @jax.jit
    def chunkmax_stage(h_t, sd_t, sv_t):
        n_chunks = n_pad // CH
        cm = h_t.reshape(n_chunks, CH, B).max(axis=1)  # [n_chunks, B]
        _, ci = topk_rows(cm, K)  # [K, B] winning chunk ids
        flat = (
            ci[:, None, :] * CH
            + jnp.arange(CH, dtype=jnp.int32)[None, :, None]
        ).reshape(K * CH, B)  # [K*CH, B] doc rows
        h_cand = jnp.take_along_axis(h_t, flat, axis=0)  # [K*CH, B]

        # light candidates: run-end totals at pool docs
        is_end, l_tot = hy._run_totals(sd_t.T, sv_t.T)  # [B, P]
        real = sd_t < num_real  # [P, B]
        h_at_light = jnp.take_along_axis(
            h_t, jnp.clip(sd_t, 0, n_pad - 1), axis=0
        )  # [P, B]
        light_cand = jnp.where(
            is_end.T & real, h_at_light + l_tot.T, -jnp.inf
        )

        # mask heavy entries whose doc also appears in the pool (the pool
        # entry carries the exact total; the heavy one undercounts)
        sd_real = jnp.where(real, sd_t, -2)
        dup = jnp.any(
            flat[:, None, :] == sd_real[None, :, :], axis=1
        )  # [K*CH, B]
        h_cand = jnp.where(dup, -jnp.inf, h_cand)

        all_s = jnp.concatenate([h_cand, light_cand], axis=0)
        all_i = jnp.concatenate([flat, sd_t], axis=0)  # [R, B]
        R = all_s.shape[0]
        r_pad = -(-R // 8) * 8
        if r_pad != R:
            all_s = jnp.pad(
                all_s, ((0, r_pad - R), (0, 0)), constant_values=-jnp.inf
            )
            all_i = jnp.pad(all_i, ((0, r_pad - R), (0, 0)))
        ts, tr = topk_rows(all_s, K)  # [K, B]
        ti = jnp.take_along_axis(all_i, tr, axis=0)
        empty = (ts <= 0.0) | (ti >= num_real) | ~jnp.isfinite(ts)
        return (
            jnp.where(empty, 0.0, ts).T,
            jnp.where(empty, -1, ti).T,
        )  # [B, K]

    # ---- reference: the current fused light stage + final top-k ---------
    light_dt = next(t for t in (1024, 512, 256) if n_pad % t == 0)

    @jax.jit
    def current_stage(h_t, sd_t, sv_t):
        tile_s, tile_i = light_add_topk_t(
            h_t, sd_t, sv_t, k=K, b_tile=128, d_tile=light_dt
        )
        top_s, top_pos = jax.lax.top_k(tile_s.T, K)
        top_i = jnp.take_along_axis(tile_i.T, top_pos, axis=1)
        empty = top_s <= 0.0
        return (
            jnp.where(empty, 0.0, top_s),
            jnp.where(empty, -1, top_i),
        )

    # ---- current stage but with the Pallas final top-k (quick win) ------
    @jax.jit
    def current_pallas_final(h_t, sd_t, sv_t):
        tile_s, tile_i = light_add_topk_t(
            h_t, sd_t, sv_t, k=K, b_tile=128, d_tile=light_dt
        )
        ts, tr = topk_rows(tile_s, K)
        ti = jnp.take_along_axis(tile_i, tr, axis=0)
        empty = ts <= 0.0
        return (
            jnp.where(empty, 0.0, ts).T,
            jnp.where(empty, -1, ti).T,
        )

    def timed(fn, reps=8):
        out = fn(h_t, sd_t, sv_t)
        jax.block_until_ready(out)
        _ = np.asarray(out[0][:1])
        t0 = time.time()
        for _ in range(reps):
            out = fn(h_t, sd_t, sv_t)
        jax.block_until_ready(out)
        _ = np.asarray(out[0][:1])
        return (time.time() - t0) / reps, out

    results = {}
    t_cur, (rs, ri) = timed(current_stage)
    rs, ri = np.asarray(rs), np.asarray(ri)
    log(f"current (kernel + lax.top_k): {t_cur*1000:.1f} ms")
    results["current_ms"] = round(t_cur * 1000, 2)

    for name, fn in (
        ("current+pallas_final", current_pallas_final),
        ("chunkmax", chunkmax_stage),
    ):
        try:
            t, (s, i) = timed(fn)
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            continue
        s, i = np.asarray(s), np.asarray(i)
        s_ok = np.allclose(s, rs, rtol=1e-5, atol=1e-6)
        id_mm = int((i != ri).sum())
        # tie-tolerant id check: mismatches are benign where the score at
        # that rank matches (exact ties pick different winners)
        bad = int(
            ((i != ri) & ~np.isclose(s, rs, rtol=1e-5, atol=1e-6)).sum()
        )
        log(
            f"{name}: {t*1000:.1f} ms scores_ok={s_ok} "
            f"id_mismatch={id_mm} bad={bad} "
            f"max|ds|={float(np.abs(s - rs).max()):.3e}"
        )
        results[name] = {
            "ms": round(t * 1000, 2), "scores_ok": bool(s_ok),
            "id_mismatch": id_mm, "bad": bad,
        }

    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
