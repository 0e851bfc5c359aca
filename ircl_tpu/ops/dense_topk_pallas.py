"""Pallas kernel: dense scores matmul fused with a chunk-max epilogue.

Phase 1 of the two-phase dense top-k (``dense/scorer.py``) is bound by HBM
round-trips of the [B, M] score matrix: XLA materializes every dot output
before the chunk-max reduce reads it back (measured 20.5ms/batch at
[1024,128]x[128,1M] — ~8GB of score traffic against a 512MB corpus read).
This kernel never writes scores to HBM: each grid cell loads one corpus
tile, runs the MXU dot against the VMEM-resident query block, reduces the
[B, m_tile] score tile to per-chunk maxima in VMEM, and writes only the
[B, m_tile/chunk] maxima.

Phase 2 (select top-k chunks, gather their corpus rows, rescore, final
top-k) stays in XLA — it touches k*chunk rows per query, noise next to
phase 1.

Exactness matches ``cosine_topk_twophase``'s argument: the top-k elements
live in at most k distinct chunks, each with max >= the k-th value, so the
top-k chunks by max are a superset of the answer. Kernel and rescore use
f32 dots (HIGHEST) end-to-end.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cmax_kernel(q_ref, c_ref, out_ref, *, chunk: int, m_real: int):
    """Grid cell i: corpus tile i.

    q_ref: [B, D] f32 queries (block index constant -> stays resident)
    c_ref: [D, M_T] f32 corpus tile (transposed: D on sublanes)
    out_ref: [B, M_T // chunk] f32 chunk maxima (-inf over pad columns:
      zero-padded corpus columns score 0, which can outrank real negative
      cosines, so they are masked exactly)
    """
    i = pl.program_id(0)
    s = jnp.dot(
        q_ref[:, :], c_ref[:, :], preferred_element_type=jnp.float32
    )  # [B, M_T] in VMEM
    m_t = s.shape[1]
    col0 = i * m_t
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(cols < m_real, s, -jnp.inf)
    for j in range(m_t // chunk):
        out_ref[:, j] = jnp.max(s[:, j * chunk : (j + 1) * chunk], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("k", "chunk", "m_tile", "m_real", "interpret"),
)
def cosine_topk_fused(
    queries: jnp.ndarray,  # [B, D] f32 L2-normalized
    corpus_t: jnp.ndarray,  # [D, M_pad] f32 transposed corpus (padded)
    k: int,
    chunk: int = 128,
    m_tile: int = 512,
    m_real: int = None,  # true (unpadded) corpus size
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact dense top-k with the fused chunk-max kernel.

    ``corpus_t`` is the [D, M] transpose (prepare once at corpus build; a
    [M, D] layout would put the contraction on lanes), zero-padded to an
    ``m_tile`` multiple by the caller (``pad_corpus_t``); ``m_real`` is the
    true column count — pad columns are masked to -inf inside the kernel
    and in the rescore, so exactness holds even for negative cosines.
    """
    B, d = queries.shape
    m = corpus_t.shape[1]
    if m_real is None:
        m_real = m
    assert m % m_tile == 0 and m_tile % chunk == 0, (m, m_tile, chunk)
    kk = min(k, m_real)
    nc = m // chunk

    cmax = pl.pallas_call(
        functools.partial(_cmax_kernel, chunk=chunk, m_real=m_real),
        grid=(m // m_tile,),
        # raise the 16MB scoped-vmem default: the [B, m_tile] f32 score
        # tile is the working set (32MB at m_tile=8192, 64MB at 16384) and
        # v5e has 128MB of VMEM to spend
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec((B, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (d, m_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, m_tile // chunk), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, nc), jnp.float32),
        interpret=interpret,
    )(queries, corpus_t)

    kc = min(kk, nc)
    _, cidx = jax.lax.top_k(cmax, kc)  # [B, kc] winning chunks
    flat = cidx[:, :, None] * chunk + jnp.arange(chunk, dtype=jnp.int32)
    flat = flat.reshape(B, kc * chunk)  # [B, kc*chunk] global row ids
    rows_sel = corpus_t.T[flat]  # [B, kc*chunk, D] gather
    cand = jax.lax.dot_general(
        queries[:, None, :], rows_sel, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[:, 0, :]
    cand = jnp.where(flat < m_real, cand, -jnp.inf)  # mask pad rows
    s, si = jax.lax.top_k(cand, kk)
    gi = jnp.take_along_axis(flat, si, axis=1)
    return s, gi.astype(jnp.int32)


def pad_corpus_t(corpus: "jnp.ndarray", m_tile: int = 512):
    """[M, D] corpus -> ([D, M_pad] transposed zero-padded array, M)."""
    import numpy as np

    m, d = corpus.shape
    m_pad = -(-m // m_tile) * m_tile
    ct = np.zeros((d, m_pad), np.float32)
    ct[:, :m] = np.asarray(corpus).T
    return ct, m
