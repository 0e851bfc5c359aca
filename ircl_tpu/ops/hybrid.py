"""Hybrid heavy/light exact top-k: small membership slab + light pools.

Device-side combine for ``index/split.py``:

    H[b, d] = heavy-term scores   (Pallas membership slab, small union/width)
    L[b, d] = light-term scores   (host-gathered pools, segment-summed here)

Exactness: H, L >= 0 elementwise, so every doc in top-k(H + L) is either in
top-k(H) or has L > 0. The kernel returns top-k over
{masked heavy top-k} ∪ {light candidates with exact H + L totals}; heavy
entries whose doc also appears in the light pool are masked (their exact
total lives in the candidate list), so no doc is double-counted or
underestimated.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ircl_tpu.ops.membership_pallas import (
    membership_slab,
    membership_slab_windowed,
    slab_xla_reference,
)


_TOPK_BLK = 8192  # blocked top-k tile; tests shrink it to force the path


def _topk_wide(h: jnp.ndarray, kk: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over wide rows, blocked two-stage. MEASURED NEGATIVE
    at 1M docs — kept as a reference implementation, not on the hot path.

    Hypothesis was that XLA's flat TopK at ~1M-wide rows pays a sort-like
    cost; measured the opposite: swapping this into ``_merge_light`` dropped
    bench_scale 1M from 4-6K to 1.1K q/s (exact parity held) — XLA lowers
    the 3-D per-block TopK far worse than the flat partial-sort, and the
    -inf pad adds a full copy of ``h``. Exactness/tie-break semantics match
    flat TopK (lowest index wins): block winners concatenate in block order,
    so equal scores resolve to the earlier block, then the lower index.
    """
    B, n = h.shape
    blk = _TOPK_BLK
    if n <= 2 * blk:
        return jax.lax.top_k(h, kk)
    nb = -(-n // blk)
    hp = jnp.pad(h, ((0, 0), (0, nb * blk - n)), constant_values=-jnp.inf)
    s, i = jax.lax.top_k(hp.reshape(B, nb, blk), kk)  # [B, nb, kk]
    base = (jnp.arange(nb, dtype=jnp.int32) * blk)[None, :, None]
    s2 = s.reshape(B, nb * kk)
    i2 = (i.astype(jnp.int32) + base).reshape(B, nb * kk)
    ts, tp = jax.lax.top_k(s2, kk)
    return ts, jnp.take_along_axis(i2, tp, axis=1)


_TWOPHASE_MIN = 131_072  # below this width XLA's flat TopK is already cheap
_TWOPHASE_CHUNK = 32


def _topk_twophase(
    h: jnp.ndarray, kk: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over very wide rows: chunk-max reduce -> narrow top-k
    over chunk maxima -> gather + re-top-k of the kk*chunk candidates — the
    dense engine's trick (``dense/scorer.py::cosine_topk_twophase``) applied
    to the already-materialized sparse score matrix. The flat TopK over
    [1024, 1M] costs ~53ms/batch (docs/DESIGN.md stage table); this replaces
    it with a minor-dim max reduce (one read of h) + a 32x narrower TopK.

    NOT the ``_topk_wide`` negative above: that lowered a 3-D per-block
    ``lax.top_k`` (4x WORSE than flat); this reduces with a plain max and
    keeps every TopK narrow. Superset argument: the true top-kk live in at
    most kk chunks, each with max >= the kk-th value. Index tie-breaks can
    differ from flat TopK across equal scores (chunk rank orders the
    candidate gather); scores are identical."""
    B, n = h.shape
    chunk = _TWOPHASE_CHUNK
    if n % chunk or kk > n // chunk:
        return jax.lax.top_k(h, kk)
    nc = n // chunk
    cmax = h.reshape(B, nc, chunk).max(axis=-1)
    _, cidx = jax.lax.top_k(cmax, kk)  # [B, kk] winning chunks
    flat = (
        cidx[:, :, None] * chunk + jnp.arange(chunk, dtype=jnp.int32)
    ).reshape(B, kk * chunk)
    cand = jnp.take_along_axis(h, flat, axis=1)
    s, si = jax.lax.top_k(cand, kk)
    return s, jnp.take_along_axis(flat, si, axis=1)


def _two_sum(a, b):
    """Knuth two-sum: s + e == a + b exactly (s = fl(a+b), e the rounding
    error). XLA does not reassociate floating point, so this holds on TPU."""
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _dd_add(x, y):
    """Double-float (hi, lo) addition for ``associative_scan``: keeps the
    pool prefix sums accurate to ~2^-48 relative, so run totals computed as
    prefix differences cannot cancel away. A plain f32 cumsum carries
    ulp(prefix) absolute error — a run whose true total is below the ulp of
    the accumulated pool mass would round to 0.0 and be dropped entirely by
    the score filter (TPU has no hardware f64; this is the TPU-native way
    to get f64-class prefix sums)."""
    hi, e = _two_sum(x[0], y[0])
    lo = e + (x[1] + y[1])
    return _two_sum(hi, lo)


def _sorted_pools(light_docs, light_contribs, pools_sorted: bool):
    """Doc-ascending pools (the one shared copy: pad/sort semantics must
    stay identical between the staged merge and the fused kernel). The C++
    gather pre-sorts (sort_pools=True); otherwise one device argsort."""
    if pools_sorted:
        return light_docs, light_contribs
    order = jnp.argsort(light_docs, axis=1)
    return (
        jnp.take_along_axis(light_docs, order, axis=1),
        jnp.take_along_axis(light_contribs, order, axis=1),
    )


def _bucketed_membership(
    u_sorted, terms_a, vals_a, terms_b, vals_b, d_tile, interpret
):
    """Twin width-bucket membership slabs concatenated along docs: the one
    shared copy for the staged and fused bucketed engines (only the final
    dot orientation differs between them)."""
    u_tile = _u_tile(u_sorted.shape[0], d_tile)
    ma = membership_slab_windowed(
        u_sorted, terms_a, vals_a, u_tile=u_tile, d_tile=d_tile,
        interpret=interpret,
    )
    mb = membership_slab_windowed(
        u_sorted, terms_b, vals_b, u_tile=u_tile, d_tile=d_tile,
        interpret=interpret,
    )
    return jnp.concatenate([ma, mb], axis=1), u_tile  # [U, Na_pad + Nb_pad]


def _run_totals(sd: jnp.ndarray, sv: jnp.ndarray):
    """Per-run totals of doc-sorted pools: (is_end [B, P], l_tot [B, P]).

    ``l_tot`` is valid at run ends (``is_end``). The ONE shared copy of the
    compensated run-reduction used by the staged hybrid merge and the
    ragged engine (``ops/ragged.segment_topk``): double-float prefix sums
    (``_dd_add``) so run totals computed as prefix differences cannot
    cancel against the accumulated pool mass — a plain f32 cumsum carries
    ulp(prefix) absolute error, which can exceed (and zero out) a small
    run's entire total.
    """
    P = sd.shape[1]
    csum, csum_lo = jax.lax.associative_scan(
        _dd_add, (sv, jnp.zeros_like(sv)), axis=1
    )
    nxt = jnp.concatenate([sd[:, 1:], jnp.full_like(sd[:, :1], -1)], axis=1)
    is_end = sd != nxt
    idxs = jnp.arange(P, dtype=jnp.int32)
    prev_boundary = jnp.where(
        jnp.concatenate(
            [jnp.zeros_like(is_end[:, :1]), is_end[:, :-1]], axis=1
        ),
        idxs[None, :] - 1,
        jnp.iinfo(jnp.int32).min,
    )
    prev_boundary = jax.lax.associative_scan(
        jnp.maximum, prev_boundary, axis=1
    )
    safe_prev = jnp.maximum(prev_boundary, 0)
    started = prev_boundary >= 0
    prev_csum = jnp.where(
        started, jnp.take_along_axis(csum, safe_prev, axis=1), 0.0
    )
    prev_lo = jnp.where(
        started, jnp.take_along_axis(csum_lo, safe_prev, axis=1), 0.0
    )
    # hi difference first (Sterbenz-exact for close prefixes), then the
    # compensation difference
    return is_end, (csum - prev_csum) + (csum_lo - prev_lo)


def _merge_light(
    h: jnp.ndarray,  # [B, N_pad] exact heavy scores
    light_docs: jnp.ndarray,  # [B, P] int32 (pads: any in-range id, contrib 0)
    light_contribs: jnp.ndarray,  # [B, P] f32
    k: int,
    num_real_docs: int,
    pools_sorted: bool = False,  # pools already doc-ascending (host gather)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    B, P = light_docs.shape
    n_pad = h.shape[1]
    kk = min(k, n_pad)
    if n_pad >= _TWOPHASE_MIN:
        h_s, h_i = _topk_twophase(h, kk)
    else:
        h_s, h_i = jax.lax.top_k(h, kk)

    # ---- light segment totals (per-row sort by doc, run-end reduction) -----
    sd, sv = _sorted_pools(light_docs, light_contribs, pools_sorted)
    is_end, l_tot = _run_totals(sd, sv)  # compensated; valid at run ends

    # Pool padding may carry any in-range doc id with zero contribution: its
    # candidate total collapses to H[d] + 0, and the duplicate mask below
    # removes the heavy-only entry for that doc, so totals stay exact and
    # zero-score rows are filtered at the end.
    real = sd < num_real_docs
    h_at_light = jnp.take_along_axis(
        h, jnp.clip(sd, 0, n_pad - 1), axis=1
    )  # [B, P]
    cand = jnp.where(is_end & real, h_at_light + l_tot, -jnp.inf)

    # ---- mask heavy entries that also appear in the light pool -------------
    dup = jnp.any(
        h_i[:, :, None] == jnp.where(real, sd, -2)[:, None, :], axis=2
    )  # [B, kk]
    h_s = jnp.where(dup, -jnp.inf, h_s)

    all_s = jnp.concatenate([h_s, cand], axis=1)
    all_i = jnp.concatenate([h_i, sd], axis=1)
    top_s, top_pos = jax.lax.top_k(all_s, min(k, all_s.shape[1]))
    top_i = jnp.take_along_axis(all_i, top_pos, axis=1)

    empty = (top_s <= 0.0) | (top_i >= num_real_docs) | ~jnp.isfinite(top_s)
    return (
        jnp.where(empty, 0.0, top_s),
        jnp.where(empty, -1, top_i.astype(jnp.int32)),
    )


def _light_total_at(sd, l_tot, cand):
    """Exact light run totals for candidate docs: per-row binary search over
    the doc-ascending pools. ``l_tot`` is valid at run ends, and the last
    occurrence of a doc in a sorted row IS its run end, so
    ``searchsorted(side="right") - 1`` lands exactly there. Docs absent from
    a row's pool contribute 0."""
    pos = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="right"))(
        sd, cand
    )
    pos = jnp.maximum(pos - 1, 0)
    hit = jnp.take_along_axis(sd, pos, axis=1) == cand
    return jnp.where(hit, jnp.take_along_axis(l_tot, pos, axis=1), 0.0)


def _select_rescore_topk(
    m: jnp.ndarray,  # [U, N_pad] membership slab (still live in this jit)
    wt: jnp.ndarray,  # [U, B_pad] query slab
    h_sel: jnp.ndarray,  # [B, N_pad] bf16 selection scores (1-pass MXU)
    light_docs: jnp.ndarray,
    light_contribs: jnp.ndarray,
    k: int,
    n_cand: int,
    num_real_docs: int,
    pools_sorted: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select+rescore top-k: pick ``n_cand`` candidate docs per query from
    the cheap bf16 scores (heavy top-C ∪ light run-ends, the same candidate
    union as ``_merge_light``), then recompute those candidates' totals
    EXACTLY — heavy part as an f32-HIGHEST contraction over the gathered
    slab columns, light part from the compensated run totals — and take the
    final top-k over exact values.

    This halves the [B, N] score traffic (bf16 write + read instead of f32)
    and runs the big MXU contraction 1-pass instead of 3-pass (bf16_3x) /
    6-pass (f32). The candidate step is approximate: a true top-k doc could
    in principle fall outside the bf16 top-``n_cand`` heavy candidates
    (probe_bf16_select: true top-5 ⊆ bf16 top-16 on 4096/4096 bench
    queries; light candidates are unaffected — their selection already uses
    exact l_tot). Callers that need certified results run the full-batch
    parity gate (bench_scale does every run).
    """
    B, n_pad = h_sel.shape
    kk = min(n_cand, n_pad)
    if n_pad >= _TWOPHASE_MIN:
        h_s, h_i = _topk_twophase(h_sel, kk)
    else:
        h_s, h_i = jax.lax.top_k(h_sel, kk)
    h_s = h_s.astype(jnp.float32)

    sd, sv = _sorted_pools(light_docs, light_contribs, pools_sorted)
    is_end, l_tot = _run_totals(sd, sv)
    real = sd < num_real_docs
    h_at_light = jnp.take_along_axis(
        h_sel, jnp.clip(sd, 0, n_pad - 1), axis=1
    ).astype(jnp.float32)
    cand_l = jnp.where(is_end & real, h_at_light + l_tot, -jnp.inf)
    dup = jnp.any(
        h_i[:, :, None] == jnp.where(real, sd, -2)[:, None, :], axis=2
    )
    h_s = jnp.where(dup, -jnp.inf, h_s)

    all_s = jnp.concatenate([h_s, cand_l], axis=1)
    all_i = jnp.concatenate([h_i, sd], axis=1)
    n_sel = min(n_cand, all_s.shape[1])
    sel_s, sel_pos = jax.lax.top_k(all_s, n_sel)
    cand = jnp.take_along_axis(all_i, sel_pos, axis=1)  # [B, n_sel]
    # Finite-selected candidates are distinct docs (heavy top-k ids are
    # distinct, light run-ends are one-per-doc, cross-duplicates masked);
    # -inf slots carry junk ids (possibly repeats) — zero them after rescore
    # so no doc's exact total can enter the final top-k twice.
    valid = jnp.isfinite(sel_s)
    safe = jnp.clip(cand, 0, n_pad - 1)

    mc = jnp.take(m, safe.reshape(-1), axis=1)  # [U, B * n_sel] column gather
    h_exact = jnp.einsum(
        "ub,ubc->bc",
        wt[:, :B],
        mc.reshape(m.shape[0], B, n_sel),
        precision=jax.lax.Precision.HIGHEST,
    )
    total = jnp.where(valid, h_exact + _light_total_at(sd, l_tot, safe), 0.0)
    top_s, tp = jax.lax.top_k(total, min(k, n_sel))
    top_i = jnp.take_along_axis(safe, tp, axis=1)
    empty = (top_s <= 0.0) | (top_i >= num_real_docs)
    return (
        jnp.where(empty, 0.0, top_s),
        jnp.where(empty, -1, top_i.astype(jnp.int32)),
    )


def _u_tile(u: int, d_tile: int = 256) -> int:
    """At least 4 u-tiles when the union allows it, so the value-range
    windows can skip work even for small heavy unions (e.g. 512 at 1M docs).
    Clamped to u itself: a union narrower than 128 slots (fixed_union_cap
    below 128) must tile at its own width or the slab's u % u_tile == 0
    assertion trips at serving time. The cap is 256 when d_tile >= 1024
    (50K fused config: the narrower value windows beat the extra grid
    cells once the 1024 doc tiles amortize them — narrow slab 22.7 ->
    20.1 ms, probe_slab_tiles) and the round-2 512 otherwise (the 1M
    staged path runs d_tile=512 and the 256 combo is unmeasured there)."""
    cap = 256 if d_tile >= 1024 else 512
    return min(u, max(128, min(cap, u // 4)))


_PREC_TABLE = {
    "highest": jax.lax.Precision.HIGHEST,  # f32 (6-pass) — bit-level parity
    "high": jax.lax.Precision.HIGH,  # bf16_3x — ~1e-6 rel err, ~2x faster
    "default": jax.lax.Precision.DEFAULT,  # bf16 — ~4e-3 rel err, fastest
}


class _PrecDict(dict):
    def __missing__(self, key):
        raise ValueError(
            f"unknown precision {key!r}: expected one of {sorted(_PREC_TABLE)}"
        )


_PREC = _PrecDict(_PREC_TABLE)


def _query_slab(u_sorted, qb_t, qw_t, u_tile, interpret, queries_sorted,
                slab_impl="pallas"):
    """Query-side slab. When each query's terms are sorted ascending with
    pads (-1) trailing (the ranker pre-sorts on host), the value-range
    windowed kernel applies to queries too — same ~n_ut-fold compare cut as
    the doc side."""
    if slab_impl == "xla":
        return slab_xla_reference(u_sorted, qb_t, qw_t)
    # batch-axis tile: 512 when the padded batch admits it (grid overhead
    # measured -15% on the query fill at B=4096, probe_slab_tiles
    # --query-only: 8.5 -> 7.2 ms), else the universal 128
    b_tile = 512 if qb_t.shape[1] % 512 == 0 else 128
    if queries_sorted:
        return membership_slab_windowed(
            u_sorted, qb_t, qw_t, u_tile=u_tile, d_tile=b_tile,
            interpret=interpret,
        )
    return membership_slab(
        u_sorted, qb_t, qw_t, u_tile=u_tile, d_tile=b_tile,
        interpret=interpret,
    )


def _heavy_scores(
    u_sorted, terms_t, vals_t, qb_t, qw_t, interpret, prec, b,
    queries_sorted=False, d_tile=256, slab_impl="pallas",
):
    u_tile = _u_tile(u_sorted.shape[0], d_tile)
    if slab_impl == "xla":
        # CPU-mesh validation path at scale (see slab_xla_reference)
        m = slab_xla_reference(u_sorted, terms_t, vals_t)
    else:
        # doc-side slab: value-range windowed (rows sorted ascending), exact
        m = membership_slab_windowed(
            u_sorted, terms_t, vals_t, u_tile=u_tile, d_tile=d_tile,
            interpret=interpret,
        )  # [U_h, N_pad]
    wt = _query_slab(
        u_sorted, qb_t, qw_t, u_tile, interpret, queries_sorted, slab_impl
    )
    return jax.lax.dot_general(
        wt, m, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )[:b]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "num_real_docs", "interpret", "precision", "queries_sorted",
        "pools_sorted", "d_tile", "slab_impl",
    ),
)
def hybrid_topk(
    heavy_terms_t: jnp.ndarray,  # [K_h, N_pad] int32 (pad -1)
    heavy_vals_t: jnp.ndarray,  # [K_h, N_pad] f32
    u_sorted: jnp.ndarray,  # [U_h] int32 heavy union slots (sentinel pad)
    qb_t: jnp.ndarray,  # [T8, B_pad] int32 heavy query buckets
    qw_t: jnp.ndarray,  # [T8, B_pad] f32 heavy query weights
    light_docs: jnp.ndarray,  # [B, P] int32 light posting docs
    light_contribs: jnp.ndarray,  # [B, P] f32 light w*val contributions
    k: int,
    num_real_docs: int,
    interpret: bool = False,
    precision: str = "highest",  # see _PREC
    queries_sorted: bool = False,
    pools_sorted: bool = False,  # light pools pre-sorted by doc on host
    d_tile: int = 256,  # doc-axis slab tile; 512 wins past ~1M docs
    slab_impl: str = "pallas",  # "xla": non-Pallas slab (CPU-mesh scale)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    prec = _PREC[precision]
    h = _heavy_scores(
        u_sorted, heavy_terms_t, heavy_vals_t, qb_t, qw_t, interpret, prec,
        light_docs.shape[0], queries_sorted, d_tile, slab_impl,
    )
    return _merge_light(
        h, light_docs, light_contribs, k, num_real_docs,
        pools_sorted=pools_sorted,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "interpret", "precision", "queries_sorted", "pools_sorted",
        "d_tile",
    ),
)
def hybrid_topk_bucketed_fused(
    terms_a: jnp.ndarray,
    vals_a: jnp.ndarray,
    terms_b: jnp.ndarray,
    vals_b: jnp.ndarray,
    u_sorted: jnp.ndarray,
    qb_t: jnp.ndarray,
    qw_t: jnp.ndarray,
    light_docs: jnp.ndarray,  # [B, P] ids in the PERMUTED doc space
    light_contribs: jnp.ndarray,
    k: int,
    interpret: bool = False,
    precision: str = "highest",
    queries_sorted: bool = False,
    pools_sorted: bool = False,  # light pools pre-sorted by doc on host
    d_tile: int = 256,  # slab tile only; the light-add kernel picks its own
    #   doc tile (largest of 1024/512/256 dividing the padded doc count)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fully fused variant: scores stay transposed ([N, B]), the light pools
    are added straight into them and per-tile top-k emitted by the
    ``light_add_topk_t`` Pallas kernel — no gather, no candidate merge, and
    the [N, B] score matrix never round-trips HBM for a global sort. Exact
    totals; the final top-k runs over n_tiles * k per-tile winners."""
    from ircl_tpu.ops.light_add_pallas import light_add_topk_t

    prec = _PREC[precision]
    m, u_tile = _bucketed_membership(
        u_sorted, terms_a, vals_a, terms_b, vals_b, d_tile, interpret
    )
    wt = _query_slab(u_sorted, qb_t, qw_t, u_tile, interpret, queries_sorted)
    h_t = jax.lax.dot_general(
        m, wt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # [N_pad, B_pad]

    B = light_docs.shape[0]
    b_pad = -(-B // 128) * 128
    sd, sv = _sorted_pools(light_docs, light_contribs, pools_sorted)
    if b_pad != B:
        sd = jnp.pad(sd, ((0, b_pad - B), (0, 0)))
        sv = jnp.pad(sv, ((0, b_pad - B), (0, 0)))
    h_t = h_t[:, :b_pad]

    # Largest doc tile the padded doc count admits: the kernel's cost is
    # ~6us/grid-step of fixed overhead on top of a tile-size-independent
    # VPU floor (measured sweep, scripts/probe_light_tiles.py: 68.4 ms at
    # 256 -> 40.6 ms at 1024 for the 50K bench shape, scores bit-equal;
    # only exact-tie winner ids can differ across tilings). The ranker pads
    # buckets to lcm(d_tile, 1024) so this resolves to 1024 in serving.
    if h_t.shape[0] % 256:
        raise ValueError(
            f"padded doc count {h_t.shape[0]} is not a multiple of 256 — "
            "pad buckets with pad_for_slab(d_tile=lcm(d_tile, 1024)) as "
            "TfidfRanker does"
        )
    light_dt = next(
        t for t in (1024, 512, 256) if h_t.shape[0] % t == 0
    )
    tile_s, tile_i = light_add_topk_t(
        h_t, sd.T, sv.T, k=k, b_tile=128, d_tile=light_dt,
        interpret=interpret,
    )  # [n_dt * k8, b_pad] scores / global doc positions

    top_s, top_pos = jax.lax.top_k(
        tile_s.T[:B], min(k, tile_s.shape[0])
    )  # [B, k]
    top_i = jnp.take_along_axis(tile_i.T[:B], top_pos, axis=1)
    empty = top_s <= 0.0
    return (
        jnp.where(empty, 0.0, top_s),
        jnp.where(empty, -1, top_i.astype(jnp.int32)),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "interpret", "precision", "queries_sorted", "pools_sorted",
        "d_tile", "select_rescore",
    ),
)
def hybrid_topk_bucketed(
    terms_a: jnp.ndarray,  # [K_a, Na_pad] narrow-doc bucket (k-major)
    vals_a: jnp.ndarray,
    terms_b: jnp.ndarray,  # [K_b, Nb_pad] wide-doc bucket
    vals_b: jnp.ndarray,
    u_sorted: jnp.ndarray,
    qb_t: jnp.ndarray,
    qw_t: jnp.ndarray,
    light_docs: jnp.ndarray,  # [B, P] ids in the PERMUTED doc space
    light_contribs: jnp.ndarray,
    k: int,
    interpret: bool = False,
    precision: str = "highest",
    queries_sorted: bool = False,
    pools_sorted: bool = False,  # pools doc-ascending in PERMUTED space
    d_tile: int = 256,  # doc-axis slab tile; 512 cuts slab time ~25% at 1M
    select_rescore: int = 0,  # >0: bf16 1-pass selection of this many
    #   candidates/query + exact f32 rescore (see _select_rescore_topk);
    #   `precision` is ignored on this path (selection runs DEFAULT,
    #   rescore HIGHEST). 0: exact full-score path (default).
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Width-bucketed heavy slab: docs sorted by heavy width and split into a
    narrow bucket (small K_a — the bulk) and a wide bucket, eliminating most
    ELL padding compares. Returned ids live in the permuted space (positions
    into [bucket_a | bucket_b]); callers map back through the permutation.
    Padding positions score 0 and are filtered; real-doc masking is by score,
    not position."""
    prec = _PREC[precision]
    m, u_tile = _bucketed_membership(
        u_sorted, terms_a, vals_a, terms_b, vals_b, d_tile, interpret
    )
    wt = _query_slab(u_sorted, qb_t, qw_t, u_tile, interpret, queries_sorted)
    B = light_docs.shape[0]
    if select_rescore:
        # one MXU pass; the convert fuses into the dot epilogue so only
        # bf16 ([B, N] halved) ever hits HBM
        h_sel = jax.lax.dot_general(
            wt, m, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )[:B].astype(jnp.bfloat16)
        return _select_rescore_topk(
            m, wt, h_sel, light_docs, light_contribs, k,
            n_cand=max(select_rescore, k),  # at least k candidates
            num_real_docs=h_sel.shape[1],
            pools_sorted=pools_sorted,
        )
    h = jax.lax.dot_general(
        wt, m, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )[:B]
    # positional real-mask is meaningless in permuted space; zero-score
    # filtering inside _merge_light handles pads.
    return _merge_light(
        h, light_docs, light_contribs, k, h.shape[1],
        pools_sorted=pools_sorted,
    )
