"""One-pass fused hybrid scoring: slab -> MXU -> light add -> top-k in VMEM.

The scale engine for large corpora. The staged hybrid pipeline
(``ops/hybrid.py``) materializes the membership slab M [U, N] and the score
matrix H [N, B] in HBM — at 5.4M docs (the reference's full FEVER wiki,
``preprocessing/drqa/build_tfidf.py:86-126``) M alone would be ~22GB. This
kernel never materializes either: each (b-tile, d-tile) grid cell

    1. builds the slab tile M_loc [U, D] in registers via the value-range
       windowed compare loop (ELL rows sorted ascending; per (d-tile, u-tile)
       k-windows arrive in SMEM),
    2. contracts it against the resident query slab Wt [U, B_T] on the MXU,
    3. adds the light posting pools for this d-tile's window (pools
       doc-sorted; per (d-tile, b-tile) windows in SMEM),
    4. emits only the per-tile top-k (score, global doc position) pairs.

HBM traffic is the ELL index streamed n_bt times plus tiny winner tiles;
device memory for the whole engine is the [K, N] ELL pair — ~2GB at 5.4M
docs — so full-wiki serving fits a single chip with room to spare.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.4e38


def _fused_kernel(
    u_ref,  # [1, U] sorted union (VMEM, whole)
    ks_ref,  # [n_dt * n_ut] slab window starts (SMEM)
    ke_ref,  # [n_dt * n_ut] slab window ends (SMEM)
    plo_ref,  # [n_dt * n_bt] pool window starts (SMEM)
    phi_ref,  # [n_dt * n_bt] pool window ends (SMEM)
    wt_ref,  # [U, B_T] query slab block
    terms_ref,  # [K, D] ELL terms block (k-major, pad -1)
    vals_ref,  # [K, D] ELL vals block
    docs_ref,  # [P, B_T] pool docs block (ascending along P)
    contribs_ref,  # [P, B_T] pool contribs block
    s_ref,  # [k8, B_T] out: per-tile top-k scores
    i_ref,  # [k8, B_T] out: per-tile top-k global doc positions
    *,
    k: int,
    u_tile: int,
    base: int,
    precision,
):
    j = pl.program_id(0)  # b tile
    i = pl.program_id(1)  # d tile
    n_dt = pl.num_programs(1)
    d_t = terms_ref.shape[1]
    b_t = wt_ref.shape[1]
    u = wt_ref.shape[0]
    n_ut = u // u_tile
    d0 = base + i * d_t

    # --- heavy scores for this tile: windowed slab x resident query slab ----
    h = jnp.zeros((d_t, b_t), jnp.float32)
    for ut in range(n_ut):
        u_vals = u_ref[0, ut * u_tile : (ut + 1) * u_tile]  # [u_tile]
        ks = ks_ref[i * n_ut + ut]
        ke = ke_ref[i * n_ut + ut]

        def body(kk, acc):
            t = terms_ref[kk, :]  # [D]
            v = vals_ref[kk, :]
            eq = (t[None, :] == u_vals[:, None]).astype(jnp.float32)
            return acc + eq * v[None, :]

        m_tile = jax.lax.fori_loop(
            ks, ke, body, jnp.zeros((u_tile, d_t), jnp.float32)
        )  # [u_tile, D]
        h = h + jax.lax.dot_general(
            m_tile,
            wt_ref[ut * u_tile : (ut + 1) * u_tile, :],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # [D, B_T]

    # --- light pool window add ----------------------------------------------
    plo = plo_ref[i * pl.num_programs(0) + j]
    phi = phi_ref[i * pl.num_programs(0) + j]
    d_iota = d0 + jax.lax.broadcasted_iota(jnp.int32, (d_t, b_t), 0)

    def pool_body(p, acc):
        docs = docs_ref[p, :]
        vals = contribs_ref[p, :]
        eq = (docs[None, :] == d_iota).astype(jnp.float32)
        return acc + eq * vals[None, :]

    acc = jax.lax.fori_loop(plo, phi, pool_body, h)

    # --- per-tile top-k epilogue ---------------------------------------------
    local_iota = jax.lax.broadcasted_iota(jnp.int32, (d_t, b_t), 0)
    k8 = s_ref.shape[0]
    for r in range(k8):
        if r < k:
            m = jnp.max(acc, axis=0)
            am = jnp.max(jnp.where(acc == m[None, :], local_iota, -1), axis=0)
            s_ref[r, :] = m
            i_ref[r, :] = d0 + am
            acc = jnp.where(local_iota == am[None, :], _NEG, acc)
        else:
            s_ref[r, :] = jnp.full((b_t,), _NEG, jnp.float32)
            i_ref[r, :] = jnp.full((b_t,), -1, jnp.int32)


def _slab_windows(u_sorted, terms_t, u_tile):
    """Per (d-tile, u-tile) k-window bounds (the membership_slab_windowed
    prepass, reused)."""
    k_width, n = terms_t.shape
    u = u_sorted.shape[0]
    n_ut = u // u_tile
    lo = u_sorted[::u_tile]
    hi = u_sorted[u_tile - 1 :: u_tile]
    real = terms_t >= 0
    lt = jnp.sum(
        (terms_t[:, :, None] < lo[None, None, :]) & real[:, :, None],
        axis=0,
        dtype=jnp.int32,
    )  # [N, n_ut]
    le = jnp.sum(
        (terms_t[:, :, None] <= hi[None, None, :]) & real[:, :, None],
        axis=0,
        dtype=jnp.int32,
    )
    return lt, le, n_ut


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "u_tile", "d_tile", "b_tile", "base", "precision", "interpret"
    ),
)
def fused_hybrid_tile_topk(
    terms_t: jnp.ndarray,  # [K, N_pad] int32 ELL terms (ascending, pad -1)
    vals_t: jnp.ndarray,  # [K, N_pad] f32
    u_sorted: jnp.ndarray,  # [U] int32 union (sentinel pad), U % u_tile == 0
    wt: jnp.ndarray,  # [U, B_pad] f32 query slab
    docs_t: jnp.ndarray,  # [P, B_pad] int32 pools (ascending along P; pads
    #                        carry out-of-range positions)
    contribs_t: jnp.ndarray,  # [P, B_pad] f32
    k: int = 5,
    u_tile: int = 512,
    d_tile: int = 1024,
    b_tile: int = 1024,
    base: int = 0,
    precision: str = "highest",
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tile top-k of (heavy + light) scores over one ELL bucket whose
    docs occupy global positions [base, base + N_pad). Returns
    (scores [n_dt * k8, B_pad], positions [n_dt * k8, B_pad])."""
    from ircl_tpu.ops.hybrid import _PREC

    # Mosaic lowers only DEFAULT/HIGHEST dot precisions; "high" (bf16_3x)
    # promotes to the exact tier inside the kernel.
    kernel_prec = _PREC[precision]
    if kernel_prec == jax.lax.Precision.HIGH:
        kernel_prec = jax.lax.Precision.HIGHEST

    k_width, n = terms_t.shape
    u = u_sorted.shape[0]
    P, B = docs_t.shape
    assert u % u_tile == 0 and n % d_tile == 0 and B % b_tile == 0, (
        u, n, B, u_tile, d_tile, b_tile,
    )
    n_dt = n // d_tile
    n_bt = B // b_tile
    k8 = -(-k // 8) * 8

    lt, le, n_ut = _slab_windows(u_sorted, terms_t, u_tile)
    ks = lt.reshape(n_dt, d_tile, n_ut).min(axis=1).reshape(-1)
    ke = le.reshape(n_dt, d_tile, n_ut).max(axis=1).reshape(-1)

    bounds = jnp.arange(0, n + 1, d_tile, dtype=jnp.int32) + base
    counts = jnp.sum(
        docs_t[:, :, None] < bounds[None, None, :], axis=0, dtype=jnp.int32
    )  # [B, n_dt + 1]
    plo = counts[:, :-1].reshape(n_bt, b_tile, n_dt).min(axis=1)
    phi = counts[:, 1:].reshape(n_bt, b_tile, n_dt).max(axis=1)
    plo = plo.T.reshape(-1)
    phi = phi.T.reshape(-1)

    return pl.pallas_call(
        functools.partial(
            _fused_kernel,
            k=k,
            u_tile=u_tile,
            base=base,
            precision=kernel_prec,
        ),
        grid=(n_bt, n_dt),
        in_specs=[
            pl.BlockSpec((1, u), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((u, b_tile), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (k_width, d_tile), lambda j, i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k_width, d_tile), lambda j, i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((P, b_tile), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, b_tile), lambda j, i: (0, j), memory_space=pltpu.VMEM),
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
    )(
        u_sorted.reshape(1, -1), ks, ke, plo, phi, wt,
        terms_t, vals_t, docs_t, contribs_t,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "u_tile", "d_tile", "b_tile", "precision", "interpret"
    ),
)
def hybrid_topk_onepass(
    terms_a: jnp.ndarray,  # [K_a, Na_pad] narrow width bucket (k-major)
    vals_a: jnp.ndarray,
    terms_b: jnp.ndarray,  # [K_b, Nb_pad] wide bucket
    vals_b: jnp.ndarray,
    u_sorted: jnp.ndarray,  # [U] heavy union, sentinel-padded
    qb_t: jnp.ndarray,  # [T8, B_pad] heavy query buckets, per-query ascending
    qw_t: jnp.ndarray,  # [T8, B_pad]
    light_docs: jnp.ndarray,  # [B, P] PERMUTED positions, ascending per row
    light_contribs: jnp.ndarray,  # [B, P]
    k: int = 5,
    u_tile: int = 512,
    d_tile: int = 1024,
    b_tile: int = 1024,
    precision: str = "highest",
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over a width-bucketed hybrid index without materializing
    slab or scores. Positions are in the permuted doc space
    [bucket_a | bucket_b]; callers map back through ``pos2old``. Query terms
    and light pools must be pre-sorted (the ranker's host prep does both)."""
    from ircl_tpu.ops.hybrid import _u_tile
    from ircl_tpu.ops.membership_pallas import membership_slab_windowed

    B = light_docs.shape[0]
    b_pad = -(-B // b_tile) * b_tile
    qt = _u_tile(u_sorted.shape[0])
    wt = membership_slab_windowed(
        u_sorted, qb_t, qw_t, u_tile=qt, d_tile=128, interpret=interpret
    )  # [U, B_qpad]
    if wt.shape[1] < b_pad:
        wt = jnp.pad(wt, ((0, 0), (0, b_pad - wt.shape[1])))
    wt = wt[:, :b_pad]
    # union axis padded to u_tile granularity for the fused kernel
    u = u_sorted.shape[0]
    if u % u_tile:
        pad = u_tile - u % u_tile
        u_sorted = jnp.pad(u_sorted, (0, pad), constant_values=u_sorted[-1])
        wt = jnp.pad(wt, ((0, pad), (0, 0)))

    sd = light_docs
    sv = light_contribs
    if b_pad != B:
        sd = jnp.pad(sd, ((0, b_pad - B), (0, 0)), constant_values=2**31 - 1)
        sv = jnp.pad(sv, ((0, b_pad - B), (0, 0)))
    sd_t = sd.T
    sv_t = sv.T

    def fit_tile(n):
        # largest tile <= d_tile that divides the (256-multiple) bucket width
        for t in (d_tile, 512, 256):
            if t <= d_tile and n % t == 0:
                return t
        return 256

    na = terms_a.shape[1]
    sa, ia = fused_hybrid_tile_topk(
        terms_a, vals_a, u_sorted, wt, sd_t, sv_t,
        k=k, u_tile=u_tile, d_tile=fit_tile(na), b_tile=b_tile,
        base=0, precision=precision, interpret=interpret,
    )
    sb, ib = fused_hybrid_tile_topk(
        terms_b, vals_b, u_sorted, wt, sd_t, sv_t,
        k=k, u_tile=u_tile, d_tile=fit_tile(terms_b.shape[1]),
        b_tile=b_tile, base=na, precision=precision, interpret=interpret,
    )
    all_s = jnp.concatenate([sa, sb], axis=0).T[:B]  # [B, cands]
    all_i = jnp.concatenate([ia, ib], axis=0).T[:B]
    top_s, top_pos = jax.lax.top_k(all_s, min(k, all_s.shape[1]))
    top_i = jnp.take_along_axis(all_i, top_pos, axis=1)
    empty = top_s <= 0.0
    return (
        jnp.where(empty, 0.0, top_s),
        jnp.where(empty, -1, top_i.astype(jnp.int32)),
    )
