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

from ircl_tpu.ops.membership_pallas import membership_slab


@functools.partial(
    jax.jit, static_argnames=("k", "num_real_docs", "interpret", "precision")
)
def hybrid_topk(
    heavy_terms_t: jnp.ndarray,  # [K_h, N_pad] int32 (pad -1)
    heavy_vals_t: jnp.ndarray,  # [K_h, N_pad] f32
    u_sorted: jnp.ndarray,  # [U_h] int32 heavy union slots (sentinel pad)
    qb_t: jnp.ndarray,  # [T8, B_pad] int32 heavy query buckets
    qw_t: jnp.ndarray,  # [T8, B_pad] f32 heavy query weights
    light_docs: jnp.ndarray,  # [B, P] int32 light posting docs (pad = num_real_docs)
    light_contribs: jnp.ndarray,  # [B, P] f32 light w*val contributions
    k: int,
    num_real_docs: int,
    interpret: bool = False,
    precision: str = "highest",  # "highest" (score parity) | "default" (bf16)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    B, P = light_docs.shape
    n_pad = heavy_terms_t.shape[1]
    u_tile = min(512, u_sorted.shape[0])
    prec = (
        jax.lax.Precision.HIGHEST
        if precision == "highest"
        else jax.lax.Precision.DEFAULT
    )

    # ---- heavy dense scores ------------------------------------------------
    m = membership_slab(
        u_sorted, heavy_terms_t, heavy_vals_t, u_tile=u_tile, d_tile=256,
        interpret=interpret,
    )  # [U_h, N_pad]
    wt = membership_slab(
        u_sorted, qb_t, qw_t, u_tile=u_tile, d_tile=128, interpret=interpret
    )  # [U_h, B_pad]
    h = jax.lax.dot_general(
        wt, m, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )[:B]  # [B, N_pad]

    kk = min(k, n_pad)
    h_s, h_i = jax.lax.top_k(h, kk)

    # ---- light segment totals (per-row sort by doc, run-end reduction) -----
    order = jnp.argsort(light_docs, axis=1)
    sd = jnp.take_along_axis(light_docs, order, axis=1)
    sv = jnp.take_along_axis(light_contribs, order, axis=1)
    csum = jnp.cumsum(sv, axis=1)
    nxt = jnp.concatenate([sd[:, 1:], jnp.full_like(sd[:, :1], -1)], axis=1)
    is_end = sd != nxt
    idxs = jnp.arange(P, dtype=jnp.int32)
    prev_boundary = jnp.where(
        jnp.concatenate([jnp.zeros_like(is_end[:, :1]), is_end[:, :-1]], axis=1),
        idxs[None, :] - 1,
        jnp.iinfo(jnp.int32).min,
    )
    prev_boundary = jax.lax.associative_scan(jnp.maximum, prev_boundary, axis=1)
    prev_csum = jnp.where(
        prev_boundary >= 0,
        jnp.take_along_axis(csum, jnp.maximum(prev_boundary, 0), axis=1),
        0.0,
    )
    l_tot = csum - prev_csum  # valid at run ends

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
