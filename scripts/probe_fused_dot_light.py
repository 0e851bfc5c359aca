"""Probe: fuse the heavy dot into the light_add+topk kernel (h stays in VMEM).

Current fused path: XLA dot (m [U,N] @ wt [U,B] -> h_t [N,B] in HBM, bf16_3x
"high") then the Pallas light_add_topk kernel re-reads h_t. The h round
trip is ~1.7GB of HBM traffic and the two stages measure ~52 + ~41 ms.

This kernel does, per (d-tile, b-tile) grid cell:
  dot: 3 one-pass bf16 MXU dots over PRE-SPLIT hi/lo inputs (the dense
       engine's "high3" decomposition, split OUTSIDE the kernel: in-kernel
       splits of a [8192, 1024] tile are ~50MB of live temporaries — the
       dense kernel's 16384-tile register-spill failure mode)
  light add: pool window broadcast-compare adds (same as light_add_topk)
  epilogue: k rounds of max/argmax/mask -> per-tile top-k

Differences from the round-2 one-pass NEGATIVE (ops/fused_hybrid_pallas):
the slab is PREBUILT (no in-kernel slab fill), the contraction is one
dot_general over the whole union axis (no in-kernel u-tile loop), and the
grid is d-outer/b-inner so each m tile is read from HBM once.

Run from the repo root: ``python scripts/probe_fused_dot_light.py``.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_NEG = -3.4e38


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/ircl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ircl_tpu.corpus.store import MemoryDocStore
    from ircl_tpu.corpus.synthetic import generate
    from ircl_tpu.index.build import build_count_index
    from ircl_tpu.index.ranker import TfidfRanker, vectorize_queries
    from ircl_tpu.index.split import gather_light_pools
    from ircl_tpu.index.tfidf import tfidf_transform
    from ircl_tpu.ops import hybrid as hy
    from ircl_tpu.ops.light_add_pallas import (
        _window_bounds,
        light_add_topk_t,
    )
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
    sd_t, sv_t = jnp.asarray(sd.T), jnp.asarray(sv.T)
    jax.block_until_ready((sd_t, sv_t))

    # ---- build m and wt once (the slab fills are common to both paths) ---
    @jax.jit
    def slabs(u, ta, va, tb, vb, qb_t, qw_t):
        m, ut = hy._bucketed_membership(
            u, ta, va, tb, vb, d_tile_slab, False
        )
        wt = hy._query_slab(u, qb_t, qw_t, ut, False, True)
        return m, wt

    m, wt = slabs(u_sorted, ta, va, tb, vb, qb_j, qw_j)
    jax.block_until_ready((m, wt))
    U, n_pad = m.shape
    log(f"m {m.shape}, wt {wt.shape}, pools {sd_t.shape}")

    @jax.jit
    def hilo(x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    m_hi, m_lo = hilo(m)
    w_hi, w_lo = hilo(wt)
    jax.block_until_ready((m_hi, m_lo, w_hi, w_lo))

    # ---- the fused kernel ------------------------------------------------
    def _kernel(
        lo_ref, hi_ref, mh_ref, ml_ref, wh_ref, wl_ref,
        docs_ref, contribs_ref, s_ref, i_ref, *, k: int,
    ):
        i = pl.program_id(0)  # d tile (outer: m tiles read once)
        j = pl.program_id(1)  # b tile (inner)
        d_t = mh_ref.shape[1]
        b_t = wh_ref.shape[1]
        d0 = i * d_t
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = dot(mh_ref[:, :], wh_ref[:, :])
        acc = acc + dot(ml_ref[:, :], wh_ref[:, :])
        acc = acc + dot(mh_ref[:, :], wl_ref[:, :])
        # acc [d_t, b_t]: d sublanes, b lanes — light_add_topk's layout
        lo = lo_ref[i * pl.num_programs(1) + j]
        hi = hi_ref[i * pl.num_programs(1) + j]
        d_iota = d0 + jax.lax.broadcasted_iota(jnp.int32, (d_t, b_t), 0)

        def body(p, a):
            docs = docs_ref[p, :]
            vals = contribs_ref[p, :]
            eq = (docs[None, :] == d_iota).astype(jnp.float32)
            return a + eq * vals[None, :]

        acc = jax.lax.fori_loop(lo, hi, body, acc)

        local_iota = jax.lax.broadcasted_iota(jnp.int32, (d_t, b_t), 0)
        k8 = s_ref.shape[0]
        for r in range(k8):
            if r < k:
                mx = jnp.max(acc, axis=0)
                am = jnp.max(
                    jnp.where(acc == mx[None, :], local_iota, -1), axis=0
                )
                s_ref[r, :] = mx
                i_ref[r, :] = d0 + am
                acc = jnp.where(local_iota == am[None, :], _NEG, acc)
            else:
                s_ref[r, :] = jnp.full((b_t,), _NEG, jnp.float32)
                i_ref[r, :] = jnp.full((b_t,), -1, jnp.int32)

    def fused(mh, ml, wh, wl, docs_t, contribs_t, k, b_tile, d_tile):
        n_dt = n_pad // d_tile
        n_bt = B // b_tile
        k8 = -(-k // 8) * 8
        P = docs_t.shape[0]
        lo, hi = _window_bounds(docs_t, n_pad, d_tile, b_tile)
        return pl.pallas_call(
            functools.partial(_kernel, k=k),
            grid=(n_dt, n_bt),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (U, d_tile), lambda i, j: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (U, d_tile), lambda i, j: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (U, b_tile), lambda i, j: (0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (U, b_tile), lambda i, j: (0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (P, b_tile), lambda i, j: (0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (P, b_tile), lambda i, j: (0, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(
                pl.BlockSpec(
                    (k8, b_tile), lambda i, j: (i, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (k8, b_tile), lambda i, j: (i, j),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_dt * k8, B), jnp.float32),
                jax.ShapeDtypeStruct((n_dt * k8, B), jnp.int32),
            ),
        )(lo, hi, mh, ml, wh, wl, docs_t, contribs_t)

    light_dt = next(t for t in (1024, 512, 256) if n_pad % t == 0)
    prec = hy._PREC["high"]

    @jax.jit
    def current(m, wt, sd_t, sv_t):
        h_t = jax.lax.dot_general(
            m, wt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        tile_s, tile_i = light_add_topk_t(
            h_t, sd_t, sv_t, k=K, b_tile=128, d_tile=light_dt
        )
        top_s, top_pos = jax.lax.top_k(tile_s.T, K)
        return top_s, jnp.take_along_axis(tile_i.T, top_pos, axis=1)

    def make_fused(b_tile, d_tile):
        @jax.jit
        def f(mh, ml, wh, wl, sd_t, sv_t):
            tile_s, tile_i = fused(
                mh, ml, wh, wl, sd_t, sv_t, K, b_tile, d_tile
            )
            top_s, top_pos = jax.lax.top_k(tile_s.T, K)
            return top_s, jnp.take_along_axis(tile_i.T, top_pos, axis=1)

        return f

    def timed(fn, args, reps=8):
        out = fn(*args)
        jax.block_until_ready(out)
        _ = np.asarray(out[0][:1])
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        _ = np.asarray(out[0][:1])
        return (time.time() - t0) / reps, out

    results = {}
    t_cur, (rs, ri) = timed(current, (m, wt, sd_t, sv_t))
    rs, ri = np.asarray(rs), np.asarray(ri)
    log(f"current (XLA high dot + kernel): {t_cur*1000:.1f} ms")
    results["current_ms"] = round(t_cur * 1000, 2)

    fargs = (m_hi, m_lo, w_hi, w_lo, sd_t, sv_t)
    for b_tile, d_tile in ((128, 512), (128, 1024), (256, 512),
                           (128, 256)):
        if n_pad % d_tile or B % b_tile:
            continue
        label = f"fused b{b_tile}/d{d_tile}"
        try:
            t, (s, i) = timed(make_fused(b_tile, d_tile), fargs)
        except Exception as e:
            log(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        s, i = np.asarray(s), np.asarray(i)
        # high3 vs XLA HIGH agree to ~1e-6 rel; ids may churn on near-ties
        s_ok = np.allclose(s, rs, rtol=2e-5, atol=1e-5)
        bad = int(
            ((i != ri) & ~np.isclose(s, rs, rtol=2e-5, atol=1e-5)).sum()
        )
        log(
            f"{label}: {t*1000:.1f} ms scores_ok={s_ok} bad_ids={bad} "
            f"max|ds|={float(np.abs(s - rs).max()):.3e}"
        )
        results[label] = {
            "ms": round(t * 1000, 2), "scores_ok": bool(s_ok), "bad": bad,
        }

    # ---- discriminate the 0.4-max score error: dot precision vs light
    # windowing. Empty pools remove the light add from BOTH paths; a
    # pure-XLA 3-dot hi/lo sum isolates the decomposition itself.
    empty_d = jnp.full((8, B), n_pad, jnp.int32)
    empty_v = jnp.zeros((8, B), jnp.float32)
    t, (s0, i0) = timed(current, (m, wt, empty_d, empty_v), reps=2)
    s0 = np.asarray(s0)
    t, (s1, i1) = timed(make_fused(128, 1024),
                        (m_hi, m_lo, w_hi, w_lo, empty_d, empty_v),
                        reps=2)
    s1 = np.asarray(s1)
    log(
        f"empty-pool parity: max|ds|="
        f"{float(np.abs(s1 - s0).max()):.3e} "
        f"(dot-only error; light windowing excluded)"
    )
    results["empty_pool_max_ds"] = float(np.abs(s1 - s0).max())

    @jax.jit
    def xla_high3(mh, ml, wh, wl):
        dd = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dd(mh, wh) + dd(ml, wh) + dd(mh, wl)

    @jax.jit
    def xla_high(m, wt):
        return jax.lax.dot_general(
            m, wt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    h3 = np.asarray(xla_high3(m_hi, m_lo, w_hi, w_lo)[:, :64])
    hh = np.asarray(xla_high(m, wt)[:, :64])
    log(
        f"XLA high3-sum vs XLA HIGH (64 cols): max|dh|="
        f"{float(np.abs(h3 - hh).max()):.3e}"
    )
    results["xla_high3_vs_high_max"] = float(np.abs(h3 - hh).max())

    # timing context: the slab fills these paths share
    t_slab, _ = timed(
        jax.jit(lambda *a: slabs(*a)),
        (u_sorted, ta, va, tb, vb, qb_j, qw_j),
        reps=4,
    )
    log(f"slab fills alone: {t_slab*1000:.1f} ms")
    results["slabs_ms"] = round(t_slab * 1000, 2)

    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
