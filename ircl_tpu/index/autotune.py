"""Build-time autotuning of the hybrid ranker's df_threshold.

The df split (``index/split.py``) trades heavy-slab work against light-pool
work: raising the threshold shrinks the heavy union (fewer slab compares,
smaller scores matmul) but grows each query's light posting pool. The knee
depends on the df histogram AND the serving batch profile, which is why a
single hand-tuned constant (32 at 50K docs, 256 at 1M in round 2) cannot
transfer across corpora.

Model, per batch of B queries:

    cost(t) = slab_nk(t) * u_pad(t) / R_SLAB         # windowed slab compares
            + u_pad(t) * n_pad * B  / R_MM           # scores matmul (MACs)
            + B * p_pad(t) * NS_LIGHT                # light pool entries

- ``slab_nk(t)``: sum over width buckets of N_pad * K_pad — the same padded
  objective ``bucket_heavy`` minimizes, computed from the per-doc heavy
  width histogram at threshold t.
- ``u_pad(t)``: expected heavy union of the batch, from a real or synthetic
  query sample, padded to the ranker's power-of-two bucketing.
- ``p_pad(t)``: per-query light pool entries (sum of light-term dfs),
  padded like ``gather_light_pools``.

Terms are estimated in milliseconds with three measured rates (defaults
calibrated on the v5e via scripts/profile_1m.py + scripts/sweep_df.py):

- R_SLAB: nominal windowed-slab compares/s (the window skip factor is
  folded in; ~242G/s at the 1M profile point),
- R_MM: MXU MACs/s at precision="high" (bf16_3x, ~60T/s),
- NS_LIGHT: ns per padded light pool entry end-to-end (host C++ gather +
  tunnel transfer + device merge). 230ns reproduces BOTH measured sweep
  orderings (scripts/sweep_df.py round 3: 50K/B=2048 fused 32 > 64 > 128;
  1M/B=1024 staged 256 > 128 > 512); the 1M stage profile alone suggested
  ~65ns, which inverts the 50K ordering — the light path costs more per
  entry at large B x T (single-core host assembly + tunnel latency).

The absolute scale is irrelevant — only argmin over t matters — so the
model survives hardware noise as long as the *ratios* hold.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

# Calibrated on TPU v5e (see module docstring); overridable per call.
R_SLAB = 242e9  # nominal slab compares/s (window skip folded in)
R_MM = 60e12  # MXU MACs/s at precision="high"
NS_LIGHT = 230.0  # ns per padded light pool entry (gather+transfer+merge)

DEFAULT_CANDIDATES = (16, 32, 64, 128, 256, 512, 1024)


def _pow2(n: int, floor: int = 16) -> int:
    """Next power-of-two bucket >= n, starting from ``floor``. The canonical
    implementation shared with ``TfidfRanker._pow2`` — the cost model below
    must mirror the engine's padding exactly, so there is only one copy."""
    c = floor
    while c < n:
        c *= 2
    return c


def _padded(x: int, m: int = 256) -> int:
    return -(-max(int(x), 1) // m) * m


def _bucketed_slab_nk(widths_sorted: np.ndarray, pad_tile: int = 1024) -> int:
    """min over bucket cuts of Na_pad*Ka_pad + Nb_pad*Kb_pad — mirrors
    ``bucket_heavy``'s objective (index/split.py). pad_tile mirrors the
    ranker's lcm(d_tile, 1024) bucket padding (the light-add kernel's
    1024 doc tile)."""
    n = len(widths_sorted)
    best = None
    for q in (0.5, 0.65, 0.8, 0.9, 0.95, 1.0):
        cut = min(max(int(n * q), 1), n)
        ka = int(widths_sorted[cut - 1])
        kb = int(widths_sorted[-1]) if cut < n else 0
        c = _padded(cut, pad_tile) * max(-(-max(ka, 1) // 8) * 8, 8)
        if cut < n:
            c += _padded(n - cut, pad_tile) * max(-(-kb // 8) * 8, 8)
        if best is None or c < best:
            best = c
    return int(best)


def synthesize_query_sample(
    doc_freqs: np.ndarray,
    batch: int = 1024,
    max_terms: int = 24,
    model: str = "occupied",
    seed: int = 7,
) -> Tuple[np.ndarray, np.ndarray]:
    """A [B, T] bucket sample standing in for serving queries when none are
    available: ``occupied`` draws uniformly over live buckets (the synthetic
    bench profile), ``mass`` draws proportionally to posting mass (Zipf text
    profile — common words appear in queries as often as in docs)."""
    rng = np.random.default_rng(seed)
    occupied = np.flatnonzero(doc_freqs)
    if model == "mass":
        p = doc_freqs[occupied].astype(np.float64)
        p /= p.sum()
        qb = occupied[rng.choice(len(occupied), size=(batch, max_terms), p=p)]
    else:
        qb = occupied[rng.integers(0, len(occupied), size=(batch, max_terms))]
    return qb.astype(np.int64), np.ones((batch, max_terms), np.float32)


def auto_df_threshold(
    index,
    batch: int = 1024,
    max_terms: int = 24,
    query_sample: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    candidates: Sequence[int] = DEFAULT_CANDIDATES,
    query_model: str = "occupied",
    r_slab: float = R_SLAB,
    r_mm: float = R_MM,
    ns_light: float = NS_LIGHT,
    union_floor: int = 512,
    union_round: Optional[int] = None,  # mirror TfidfRanker(union_round=...):
    #   ceil-to-multiple union padding instead of pow2
    pool_floor: int = 128,
    return_costs: bool = False,
):
    """Pick the df threshold minimizing the modeled batch cost.

    ``index``: a CountIndex (weighted or not). ``query_sample``: optional
    ([B, T] buckets, [B, T] weights) from real traffic; synthesized from the
    df histogram otherwise (``max_terms`` sets its per-query term count —
    callers should pass their serving profile). ``union_floor``/``pool_floor``
    must mirror the serving engine's padding floors (TfidfRanker passes
    ``fixed_union_cap or 512``; ``gather_light_pools`` pads from 128). ONE
    pass over the postings covers every candidate (seconds at 1M; the
    flattened histogram key is the peak transient, ~8 bytes/posting).
    """
    df = index.doc_freqs
    n = index.num_docs
    n_pad = _padded(n)
    candidates = sorted(candidates)
    # One pass over the postings for ALL candidates: df per posting comes
    # straight from repeating doc_freqs by row length (no hash_size-wide
    # arange or gather), each posting is binned by its df against the
    # candidate ladder, and a single [N, n_bins] histogram + suffix-sum
    # yields the per-doc heavy width at every threshold. Peak transient is
    # the in-place-built int64 histogram key + the int8 bins (~9
    # bytes/posting; df_post is freed before the key is built) — ~4GB at
    # the 447M-posting full-wiki scale on the single-core host.
    df_post = np.repeat(
        df.astype(np.int32), np.diff(index.indptr).astype(np.int64)
    )
    bins = np.searchsorted(
        np.asarray(candidates, np.int32), df_post, side="left"
    ).astype(np.int8)  # bin b: candidates[b-1] < df <= candidates[b]
    del df_post
    n_bins = len(candidates) + 1
    key = index.post_docs.astype(np.int64)
    key *= n_bins  # in-place: no extra 8B/posting temporary
    key += bins
    del bins
    hist = np.bincount(key, minlength=n * n_bins).reshape(n, n_bins)
    del key
    # widths at threshold candidates[i] = postings with df > candidates[i]
    # = bins strictly greater than i (side="left": df == cand -> bin i)
    widths_at = np.cumsum(hist[:, ::-1], axis=1)[:, ::-1]  # suffix sums
    del hist
    if query_sample is None:
        qb, qw = synthesize_query_sample(
            df, batch, max_terms=max_terms, model=query_model
        )
    else:
        qb, qw = query_sample
        qb = qb.astype(np.int64)
    live = qw != 0.0

    costs = {}
    for i, t in enumerate(candidates):
        widths = widths_at[:, i + 1]
        slab_nk = _bucketed_slab_nk(np.sort(widths))

        heavy_q = (df[qb] > t) & live
        u = len(np.unique(qb[heavy_q])) if heavy_q.any() else 0
        if union_round is not None:
            u_pad = -(-max(u, union_floor, 1) // union_round) * union_round
        else:
            u_pad = _pow2(max(u, 1), union_floor)

        pool = np.where(live & ~(df[qb] > t), df[qb], 0).sum(axis=1)
        p_pad = _pow2(max(int(pool.max(initial=0)), 1), pool_floor)

        costs[t] = (  # milliseconds
            float(slab_nk) * u_pad / r_slab * 1e3
            + u_pad * n_pad * len(qb) / r_mm * 1e3
            + len(qb) * p_pad * ns_light * 1e-6
        )
    best = min(costs, key=costs.get)
    if return_costs:
        return best, costs
    return best
