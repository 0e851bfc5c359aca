"""Pallas kernel: add per-query light posting pools into dense scores.

Completes the hybrid engine without any gather/scatter: instead of gathering
``H`` at light-candidate positions and merging candidate lists
(``ops/hybrid._merge_light``), this kernel adds every light contribution
directly into the dense score matrix:

    H'[d, b] = H[d, b] + sum_p contribs[p, b] * (docs[p, b] == d)

Scores are batch-on-lanes (``H_T [N, B]``) so the dynamic pool index ``p``
lands on the sublane axis (Mosaic cannot index lanes dynamically). Pools are
doc-sorted per query; for a d-tile covering [d0, d0 + D) only the pool
window [#(doc < d0), #(doc < d0 + D)) can match, so an XLA searchsorted
pre-pass supplies per-(d-tile, b-tile) window bounds and the kernel loops
only that (tiny, ~pool*D/N) window doing [D, B_T] broadcast-compare adds.
Top-k over H'^T then yields exact totals with no candidate bookkeeping.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _window_bounds(docs_t, n_pad: int, d_tile: int, b_tile: int):
    """Per-(d-tile, b-tile) pool window bounds, flattened for SMEM.

    Pools are doc-ascending along P (a kernel precondition), so the count of
    docs below each tile boundary IS a binary search: a vmapped
    ``searchsorted`` over the B columns costs O(B * n_dt * log P) instead of
    the O(P * B * n_dt) broadcast-compare (at the 200K-doc fused gate with
    P=8192, B=2048 that compare was ~13e9 int ops per batch). Tile min/max
    then widen each bound to cover its whole b-tile.
    """
    P, B = docs_t.shape
    n_dt = n_pad // d_tile
    n_bt = B // b_tile
    bounds = jnp.arange(0, n_pad + 1, d_tile, dtype=jnp.int32)  # [n_dt + 1]
    counts = jax.vmap(
        lambda col: jnp.searchsorted(col, bounds, side="left"), in_axes=1
    )(docs_t).astype(jnp.int32)  # [B, n_dt + 1]
    lo = counts[:, :-1].reshape(n_bt, b_tile, n_dt).min(axis=1)  # [n_bt, n_dt]
    hi = counts[:, 1:].reshape(n_bt, b_tile, n_dt).max(axis=1)
    return lo.T.reshape(-1), hi.T.reshape(-1)  # [n_dt * n_bt]


_NEG = -3.4e38  # plain float: a jnp scalar would be a captured const


def _light_add_topk_kernel(
    lo_ref, hi_ref, docs_ref, contribs_ref, h_ref, s_ref, i_ref, *, k: int
):
    """light_add + per-tile top-k epilogue: the [D, B_T] score tile never
    leaves VMEM — only the k per-tile winners (score + global doc position)
    are written. k rounds of (max over the sublane axis, argmax via iota,
    mask) — pure VPU reductions."""
    j = pl.program_id(0)  # b tile (outer; pool block resident — see above)
    i = pl.program_id(1)  # d tile (inner)
    d_t = h_ref.shape[0]
    b_t = h_ref.shape[1]
    d0 = i * d_t
    lo = lo_ref[i * pl.num_programs(0) + j]
    hi = hi_ref[i * pl.num_programs(0) + j]

    d_iota = d0 + jax.lax.broadcasted_iota(jnp.int32, (d_t, b_t), 0)

    def body(p, acc):
        docs = docs_ref[p, :]
        vals = contribs_ref[p, :]
        eq = (docs[None, :] == d_iota).astype(jnp.float32)
        return acc + eq * vals[None, :]

    acc = jax.lax.fori_loop(lo, hi, body, h_ref[:, :])

    local_iota = jax.lax.broadcasted_iota(jnp.int32, (d_t, b_t), 0)
    k8 = s_ref.shape[0]
    for r in range(k8):
        if r < k:
            m = jnp.max(acc, axis=0)  # [b_t]
            am = jnp.max(
                jnp.where(acc == m[None, :], local_iota, -1), axis=0
            )  # [b_t] local row of (a) winner; ties pick the largest row
            s_ref[r, :] = m
            i_ref[r, :] = d0 + am
            acc = jnp.where(local_iota == am[None, :], _NEG, acc)
        else:
            s_ref[r, :] = jnp.full((b_t,), _NEG, jnp.float32)
            i_ref[r, :] = jnp.full((b_t,), -1, jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("k", "b_tile", "d_tile", "interpret")
)
def light_add_topk_t(
    h_t: jnp.ndarray,  # [N_pad, B] f32 transposed heavy scores
    docs_t: jnp.ndarray,  # [P, B] int32 pool docs, ascending along P
    contribs_t: jnp.ndarray,  # [P, B] f32
    k: int = 5,
    b_tile: int = 128,
    d_tile: int = 256,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused light-add + hierarchical top-k.

    Returns (scores [n_dt * k8, B], doc positions [n_dt * k8, B]): the top-k
    totals of every d-tile (k8 = k padded to the sublane multiple; padding
    rows carry -3.4e38 / -1). A tiny final ``lax.top_k`` over n_dt * k8
    candidates replaces the global [B, N] sort, and the dense score matrix
    is never written back to HBM."""
    n_pad, B = h_t.shape
    P = docs_t.shape[0]
    assert B % b_tile == 0 and n_pad % d_tile == 0, (B, n_pad, b_tile, d_tile)
    assert k <= d_tile
    n_dt = n_pad // d_tile
    n_bt = B // b_tile
    k8 = -(-k // 8) * 8

    lo, hi = _window_bounds(docs_t, n_pad, d_tile, b_tile)

    return pl.pallas_call(
        functools.partial(_light_add_topk_kernel, k=k),
        grid=(n_bt, n_dt),  # batch outer: pool blocks resident over d sweep
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((P, b_tile), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, b_tile), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (d_tile, b_tile), lambda j, i: (i, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((k8, b_tile), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k8, b_tile), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_dt * k8, B), jnp.float32),
            jax.ShapeDtypeStruct((n_dt * k8, B), jnp.int32),
        ),
        interpret=interpret,
    )(lo, hi, docs_t, contribs_t, h_t)
