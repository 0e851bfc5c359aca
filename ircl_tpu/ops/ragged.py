"""Ragged posting-list scoring: the TPU-native inverted-index query engine.

The reference scores a query by a scipy sparse matvec over a (2^24 x N) CSR
term-document matrix (``preprocessing/drqa/retriever/tfidf_doc_ranker.py:65``)
followed by ``np.argpartition`` top-k. That formulation is a CPU pointer-chase.
Re-designed for TPU/XLA (static shapes, no data-dependent control flow, no
scatter):

1. **Ragged gather** — each query touches the posting segments of its (padded)
   term list. Segment starts/lengths come from two ``indptr`` gathers; a
   vectorized searchsorted over the exclusive cumsum of segment lengths turns
   a flat position j in [0, NNZ) into (term slot, offset) so every query's
   postings concatenate into a dense [B, NNZ] pool. Work is proportional to
   true posting mass (padded only up to the batch's static NNZ bucket), never
   to the 2^24 hash space.

2. **Sort + segment-sum** — postings are sorted by doc id per query; runs of
   equal doc ids are reduced with a cumsum-difference (no scatter-add, which
   serializes on TPU). Padding sorts to the end under doc id ``N``.

3. **top-k** — ``jax.lax.top_k`` over the per-run totals, returning (doc id,
   score) pairs. Exact: equal to the dense matvec result for every doc.

All three stages are dense XLA ops (gather / bitonic sort / cumsum / top_k)
that tile onto the VPU; the whole pipeline jits as one fusion group.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _searchsorted_right(cum: jnp.ndarray, j: jnp.ndarray) -> jnp.ndarray:
    """Vectorized searchsorted(cum, j, side='right') - 1 per batch row.

    cum: [B, T+1] nondecreasing; j: [NNZ]. Returns [B, NNZ] term slots.
    """
    # j >= cum[t]  <=>  term slot >= t ; count how many cum entries <= j.
    # [B, NNZ, T+1] would be large; use jnp.searchsorted with vmap instead.
    return jax.vmap(lambda c: jnp.searchsorted(c, j, side="right") - 1)(cum)


@functools.partial(jax.jit, static_argnames=("nnz_cap",))
def gather_postings(
    indptr: jnp.ndarray,  # [H+1] int32 posting offsets per hash bucket
    post_docs: jnp.ndarray,  # [NNZ_total] int32 doc ids (term-major CSR)
    post_vals: jnp.ndarray,  # [NNZ_total] float32 index values
    q_buckets: jnp.ndarray,  # [B, T] int32 hash buckets (padded with 0)
    q_weights: jnp.ndarray,  # [B, T] float32 query weights (0 on padding)
    nnz_cap: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Concatenate each query's weighted postings into a [B, nnz_cap] pool.

    Returns (doc_ids [B, nnz_cap] int32, contribs [B, nnz_cap] f32,
    total [B] int32 true posting counts). Positions beyond total[b] carry
    doc id INT32_MAX and contribution 0.
    """
    starts = indptr[q_buckets]  # [B, T]
    lens = indptr[q_buckets + 1] - starts  # [B, T]
    # Padded term slots (weight 0) contribute nothing: zero their length so
    # they occupy no posting positions.
    lens = jnp.where(q_weights != 0.0, lens, 0)

    cum = jnp.cumsum(lens, axis=1)  # inclusive
    cum_ex = jnp.concatenate([jnp.zeros_like(cum[:, :1]), cum], axis=1)  # [B, T+1]
    total = cum_ex[:, -1]

    j = jnp.arange(nnz_cap, dtype=jnp.int32)
    t_of_j = _searchsorted_right(cum_ex, j)  # [B, NNZ]
    t_of_j = jnp.clip(t_of_j, 0, q_buckets.shape[1] - 1)

    within = j[None, :] - jnp.take_along_axis(cum_ex, t_of_j, axis=1)
    idx = jnp.take_along_axis(starts, t_of_j, axis=1) + within  # [B, NNZ]
    valid = j[None, :] < total[:, None]
    idx = jnp.where(valid, idx, 0)

    docs = post_docs[idx]
    vals = post_vals[idx]
    w = jnp.take_along_axis(q_weights, t_of_j, axis=1)

    docs = jnp.where(valid, docs, jnp.iinfo(jnp.int32).max)
    contribs = jnp.where(valid, w * vals, 0.0)
    return docs, contribs, total


@functools.partial(jax.jit, static_argnames=("k",))
def segment_topk(
    docs: jnp.ndarray,  # [B, NNZ] int32 doc ids (padding = INT32_MAX)
    contribs: jnp.ndarray,  # [B, NNZ] f32 per-posting contributions
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact per-doc totals + top-k without scatter.

    Sorts (doc, contrib) by doc per row, reduces equal-doc runs via
    cumsum-difference at run boundaries, then top-k over run totals.
    Returns (scores [B, k] f32, doc_ids [B, k] int32); empty slots have
    score 0 and doc id -1 (ranked after any positive score).
    """
    order = jnp.argsort(docs, axis=1)
    sdocs = jnp.take_along_axis(docs, order, axis=1)
    svals = jnp.take_along_axis(contribs, order, axis=1)

    # Shared compensated run reduction (ops/hybrid._run_totals): double-
    # float prefix sums so a small run's total cannot cancel against the
    # accumulated prefix; totals are valid at run ends.
    from ircl_tpu.ops.hybrid import _run_totals

    is_end, l_tot = _run_totals(sdocs, svals)
    totals = jnp.where(is_end, l_tot, -jnp.inf)
    # Mask padding runs (doc id INT32_MAX).
    totals = jnp.where(sdocs == jnp.iinfo(jnp.int32).max, -jnp.inf, totals)

    top_vals, top_idx = jax.lax.top_k(totals, k)
    top_docs = jnp.take_along_axis(sdocs, top_idx, axis=1)
    empty = top_vals == -jnp.inf
    return (
        jnp.where(empty, 0.0, top_vals),
        jnp.where(empty, -1, top_docs),
    )


@functools.partial(jax.jit, static_argnames=("num_docs",))
def dense_scores(
    docs: jnp.ndarray,  # [B, NNZ] int32 (padding = INT32_MAX)
    contribs: jnp.ndarray,  # [B, NNZ] f32
    num_docs: int,
) -> jnp.ndarray:
    """Dense [B, num_docs] score matrix via segment_sum (validation path)."""
    clipped = jnp.minimum(docs, num_docs)  # padding falls into an extra bin
    out = jax.vmap(
        lambda d, c: jax.ops.segment_sum(c, d, num_segments=num_docs + 1)
    )(clipped, contribs)
    return out[:, :num_docs]


def choose_nnz_cap(total_postings: int, floor: int = 1024) -> int:
    """Round a batch's max posting count up to the next power of two (static
    shape bucketing keeps recompiles to O(log) distinct sizes)."""
    cap = floor
    while cap < total_postings:
        cap *= 2
    return cap
