"""Pallas kernels: fused membership-slab scoring for the sparse index.

Exact inverted-index scoring re-expressed with zero gather/scatter/sort.
For a query batch with (sorted, sentinel-padded) union term set ``U``:

    M[u, d] = sum_k vals[d, k]  * (terms[d, k] == u_sorted[u])   (index slab)
    Wt[u, b] = sum_t qw[b, t]   * (qb[b, t]    == u_sorted[u])   (query slab)
    scores   = Wt^T @ M                                          (MXU)

Both slabs come from the same kernel: each (u-tile, d-tile) grid cell holds a
VMEM tile of the union values and loops k doing a broadcast-compare + FMA —
pure VPU work at register bandwidth. Raw hashed term ids are compared
directly (no searchsorted, no positional remap): the union tile [512] lives
in VMEM, so membership testing is just vector equality. Doc-side padding
(term -1) and query-side padding (weight 0) drop out naturally.

Scores equal the reference's sparse matvec (``preprocessing/drqa/retriever/
tfidf_doc_ranker.py:65``) for every document, to f32 accumulation.

Inputs are k-major ([K, N]) because the dynamic k loop index must address
the sublane axis (dynamic lane indexing is not supported by Mosaic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _slab_kernel(u_ref, terms_ref, contrib_ref, m_ref):
    """Grid cell (i, j): u-tile i, d-tile j.

    u_ref: [1, U_T] int32 sorted union term ids (sentinel-padded)
    terms_ref: [K, D_T] int32 raw hashed term ids (k-major, pad -1)
    contrib_ref: [K, D_T] f32 values (0 on padding)
    m_ref: [U_T, D_T] f32 output slab tile
    """
    u_vals = u_ref[0, :]  # [U_T]
    k_width = terms_ref.shape[0]
    u_t = m_ref.shape[0]
    d_t = m_ref.shape[1]

    def body(k, acc):
        t = terms_ref[k, :]  # [D_T]
        v = contrib_ref[k, :]  # [D_T]
        eq = (t[None, :] == u_vals[:, None]).astype(jnp.float32)
        return acc + eq * v[None, :]

    m_ref[:, :] = jax.lax.fori_loop(
        0, k_width, body, jnp.zeros((u_t, d_t), jnp.float32)
    )


@functools.partial(
    jax.jit, static_argnames=("u_tile", "d_tile", "interpret")
)
def membership_slab(
    u_sorted: jnp.ndarray,  # [U] int32 sorted union ids, sentinel-padded
    terms_t: jnp.ndarray,  # [K, N] int32 raw term ids (pad -1)
    contrib_t: jnp.ndarray,  # [K, N] f32 values (0 on padding)
    u_tile: int = 512,
    d_tile: int = 256,
    interpret: bool = False,  # CPU/test fallback
):
    """Dense slab M [U, N]. U % u_tile == 0 and N % d_tile == 0 (call
    ``pad_for_slab`` first)."""
    k_width, n = terms_t.shape
    u = u_sorted.shape[0]
    assert u % u_tile == 0 and n % d_tile == 0, (u, n, u_tile, d_tile)
    assert k_width % 8 == 0, k_width

    return pl.pallas_call(
        _slab_kernel,
        grid=(u // u_tile, n // d_tile),
        in_specs=[
            pl.BlockSpec((1, u_tile), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (k_width, d_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k_width, d_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (u_tile, d_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((u, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * u * n * k_width,
            bytes_accessed=(u // u_tile) * n * k_width * 8 + u * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(u_sorted.reshape(1, -1), terms_t, contrib_t)


def _windowed_slab_kernel(u_ref, ks_ref, ke_ref, terms_ref, contrib_ref, m_ref):
    """Windowed variant: ELL rows are sorted ascending (pads trail), so for a
    u-tile covering the value range [lo, hi] only the k-window
    [min-over-tile-docs #(t < lo), max-over-tile-docs #(t <= hi)) can match.
    The (per grid cell) window bounds arrive as SMEM scalars; everything
    outside is skipped — with T total u-tiles each doc term participates in
    exactly one, cutting compare work by ~T/(1 + spread)."""
    u_vals = u_ref[0, :]
    u_t = m_ref.shape[0]
    d_t = m_ref.shape[1]
    i = pl.program_id(0)
    j = pl.program_id(1)
    # tables are flat [n_dt * n_ut] (2-D SMEM arrays pad the lane dim to 128)
    ks = ks_ref[j * pl.num_programs(0) + i]
    ke = ke_ref[j * pl.num_programs(0) + i]

    def body(k, acc):
        t = terms_ref[k, :]
        v = contrib_ref[k, :]
        eq = (t[None, :] == u_vals[:, None]).astype(jnp.float32)
        return acc + eq * v[None, :]

    m_ref[:, :] = jax.lax.fori_loop(
        ks, ke, body, jnp.zeros((u_t, d_t), jnp.float32)
    )


@functools.partial(
    jax.jit, static_argnames=("u_tile", "d_tile", "interpret")
)
def membership_slab_windowed(
    u_sorted: jnp.ndarray,  # [U] int32 sorted union ids (sentinel-padded)
    terms_t: jnp.ndarray,  # [K, N] int32 raw term ids, ascending per doc,
    #                         pads (-1) trailing
    contrib_t: jnp.ndarray,  # [K, N] f32
    u_tile: int = 512,
    d_tile: int = 256,
    interpret: bool = False,
):
    """Value-range-windowed membership slab (exact, faster for K >> K/T)."""
    k_width, n = terms_t.shape
    u = u_sorted.shape[0]
    assert u % u_tile == 0 and n % d_tile == 0, (u, n, u_tile, d_tile)
    assert k_width % 8 == 0, k_width
    n_ut = u // u_tile
    n_dt = n // d_tile

    lo = u_sorted[::u_tile]  # [n_ut]
    hi = u_sorted[u_tile - 1 :: u_tile]  # [n_ut]
    real = terms_t >= 0
    # per-doc window positions within the sorted real-term prefix
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
    ks = lt.reshape(n_dt, d_tile, n_ut).min(axis=1).reshape(-1)  # [n_dt*n_ut]
    ke = le.reshape(n_dt, d_tile, n_ut).max(axis=1).reshape(-1)

    return pl.pallas_call(
        _windowed_slab_kernel,
        grid=(n_ut, n_dt),
        in_specs=[
            pl.BlockSpec((1, u_tile), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            # window tables live whole in SMEM; the kernel indexes by grid ids
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (k_width, d_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k_width, d_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (u_tile, d_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((u, n), jnp.float32),
        interpret=interpret,
    )(u_sorted.reshape(1, -1), ks, ke, terms_t, contrib_t)


def pad_for_slab(terms_t, contrib_t, d_tile: int, k_multiple: int = 8):
    """Host-side padding of k-major arrays to kernel tile multiples."""
    import numpy as np

    k_width, n = terms_t.shape
    k_pad = max(-(-k_width // k_multiple) * k_multiple, k_multiple) - k_width
    n_pad = max(-(-n // d_tile) * d_tile, d_tile) - n  # empty inputs pad to one tile
    if k_pad or n_pad:
        terms_t = np.pad(terms_t, ((0, k_pad), (0, n_pad)), constant_values=-1)
        contrib_t = np.pad(contrib_t, ((0, k_pad), (0, n_pad)), constant_values=0.0)
    return terms_t, contrib_t


@functools.partial(jax.jit, static_argnames=("k", "num_real_docs", "interpret"))
def membership_topk_fused(
    terms_t: jnp.ndarray,  # [K, N_pad] int32 doc terms (pre-padded, -1)
    vals_t: jnp.ndarray,  # [K, N_pad] f32
    u_sorted: jnp.ndarray,  # [U] int32 union slots, sentinel-padded, U % 512 == 0
    qb_t: jnp.ndarray,  # [T8, B_pad] int32 query buckets (pre-padded)
    qw_t: jnp.ndarray,  # [T8, B_pad] f32 query weights (0 on padding)
    k: int,
    num_real_docs: int,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fully fused exact top-k over the ELL index. Returns
    (scores [B_pad, k], ids [B_pad, k]); padded queries yield empty rows."""
    u_tile = min(512, u_sorted.shape[0])
    m = membership_slab(
        u_sorted, terms_t, vals_t, u_tile=u_tile, d_tile=256,
        interpret=interpret,
    )  # [U, N_pad]
    wt = membership_slab(
        u_sorted, qb_t, qw_t, u_tile=u_tile, d_tile=128, interpret=interpret
    )  # [U, B_pad]

    # HIGHEST keeps f32 accumulation exact enough for score parity with the
    # reference CPU pipeline (default TPU f32 matmul rounds through bf16).
    scores = jax.lax.dot_general(
        wt, m, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [B_pad, N_pad]
    kk = min(k, scores.shape[1])
    top_s, top_i = jax.lax.top_k(scores, kk)
    empty = (top_s <= 0.0) | (top_i >= num_real_docs)
    return (
        jnp.where(empty, 0.0, top_s),
        jnp.where(empty, -1, top_i.astype(jnp.int32)),
    )


@jax.jit
def slab_xla_reference(
    u_sorted: jnp.ndarray,  # [U] int32 sorted union ids (sentinel-padded)
    terms_t: jnp.ndarray,  # [K, N] int32 raw term ids (pad -1)
    contrib_t: jnp.ndarray,  # [K, N] f32
) -> jnp.ndarray:
    """XLA (non-Pallas) membership slab, exact same contract as
    ``membership_slab(_windowed)``: M[u, n] = sum_k (terms[k,n] == u[u]) *
    contrib[k,n]. A ``lax.scan`` over k keeps peak memory at one [U, N]
    accumulator. Pads drop out: the union sentinel (hash_size) never matches
    a stored term, and term pads (-1) never match a union slot.

    Purpose: the virtual-CPU-mesh validation path at scale — interpret-mode
    Pallas emulates per grid cell and bounds the practical corpus size to
    ~40K docs, while XLA:CPU compiles this to vectorized native code
    (500K+ docs in seconds per shard). Not used on TPU, where the windowed
    Pallas kernel is strictly faster.
    """

    def body(acc, kv):
        t, v = kv
        return (
            acc
            + jnp.where(
                u_sorted[:, None] == t[None, :], v[None, :], 0.0
            ),
            None,
        )

    acc0 = jnp.zeros(
        (u_sorted.shape[0], terms_t.shape[1]), jnp.float32
    )
    m, _ = jax.lax.scan(body, acc0, (terms_t, contrib_t))
    return m
