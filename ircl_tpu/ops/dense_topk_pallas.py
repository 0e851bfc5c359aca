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
top-k chunks by max are a superset of the answer — and the argument holds
for ANY fixed partition of columns into chunks, which is what the "fold"
epilogue exploits: chunk j = columns ≡ j (mod m_tile/chunk), reducible by
log2(chunk) full-width lane-contiguous pairwise maxima instead of
m_tile/chunk small strided reductions (measured 3-4x the loop epilogue;
the kernel is epilogue-bound, not dot-bound). The phase-2 rescore is f32
HIGHEST, so returned SCORES are f32-exact for the selected docs; the
SELECTION is as good as the phase-1 chunk maxima, whose precision is set
by the in-kernel dot — see ``cosine_topk_fused``'s contract below.

Measured in-kernel dot precision on v5e (chunk=1 probe vs numpy f64,
round 3): ``precision=None`` == XLA DEFAULT == bf16-input 1-pass (mean rel
err ~1.6e-2 on unit-normal data); ``"highest"`` is accepted by Mosaic and
f32-faithful (mean ~2.8e-7); ``"high"`` (bf16_3x) is REJECTED by Mosaic —
``"high3"`` emulates it manually (hi/lo bf16 splits, three 1-pass dots,
~1e-5 abs err on unit cosines). Throughput at [1024,128]x[128,1M],
fold/8192/32, same session, with FULL-1024-batch parity vs numpy f32:
None 124.1K q/s (985/1024 — measurably INEXACT on the bench corpus),
high3 92.2K (1024/1024), None+extra_chunks=8 82K, highest 63.8K
(1024/1024). ``high3`` is the bench's verified-exact headline config.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_PRECISIONS = {
    None: None,
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _cmax_kernel(
    q_ref, c_ref, out_ref, *, chunk: int, m_real: int, precision, epilogue
):
    """Grid cell i: corpus tile i.

    q_ref: [B, D] f32 queries (block index constant -> stays resident)
    c_ref: [D, M_T] corpus tile (transposed: D on sublanes); f32, or bf16
      to halve the HBM read and run the MXU 1-pass (queries are cast to
      match — exactness then rests on ``extra_chunks`` slack + f32 rescore)
    out_ref: [B, M_T // chunk] f32 chunk maxima (-inf over pad columns:
      zero-padded corpus columns score 0, which can outrank real negative
      cosines, so they are masked exactly)

    ``epilogue`` picks the chunk partition AND its reduction shape:
      "loop": chunk j = contiguous columns [j*chunk, (j+1)*chunk) — M_T/chunk
        small strided VPU reductions.
      "fold": chunk j = columns ≡ j (mod M_T/chunk) — log2(chunk) full-width
        pairwise maxima, every op lane-contiguous. Any fixed partition keeps
        the top-k superset argument; phase 2 just maps chunk->rows to match.
    """
    i = pl.program_id(0)
    q = q_ref[:, :]
    c = c_ref[:, :]
    if c.dtype == jnp.bfloat16:
        q = q.astype(jnp.bfloat16)
    if precision == "high3" and c.dtype != jnp.bfloat16:
        # Manual bf16_3x: Mosaic rejects Precision.HIGH on the in-kernel
        # dot, but the same ~1e-6-accurate product is three 1-pass bf16
        # MXU dots over hi/lo splits (lo*lo dropped, ~2^-18 rel — exactly
        # XLA HIGH's decomposition), each accumulated in f32.
        q_hi = q.astype(jnp.bfloat16)
        c_hi = c.astype(jnp.bfloat16)
        q_lo = (q - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        c_lo = (c - c_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = functools.partial(
            jnp.dot, preferred_element_type=jnp.float32
        )
        s = dot(q_hi, c_hi) + (dot(q_lo, c_hi) + dot(q_hi, c_lo))
    else:
        s = jnp.dot(
            q, c, preferred_element_type=jnp.float32,
            precision=_PRECISIONS[precision if precision != "high3" else None],
        )  # [B, M_T] f32 in VMEM
    m_t = s.shape[1]
    col0 = i * m_t
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(cols < m_real, s, -jnp.inf)
    if epilogue == "fold":
        w = m_t
        npt = m_t // chunk
        while w > npt:
            w //= 2
            s = jnp.maximum(s[:, :w], s[:, w : 2 * w])
        out_ref[:, :] = s
    else:
        for j in range(m_t // chunk):
            out_ref[:, j] = jnp.max(s[:, j * chunk : (j + 1) * chunk], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "chunk", "m_tile", "m_real", "precision", "extra_chunks",
        "epilogue", "interpret",
    ),
)
def cosine_topk_fused(
    queries: jnp.ndarray,  # [B, D] f32 L2-normalized
    corpus_t: jnp.ndarray,  # [D, M_pad] transposed corpus (padded); f32/bf16
    k: int,
    chunk: int = 128,
    m_tile: int = 512,
    m_real: int = None,  # true (unpadded) corpus size
    precision: str = "high3",  # in-kernel dot. Default "high3" = manual
    #   bf16_3x (Mosaic rejects HIGH) — ~1e-5-accurate selection, 92K q/s
    #   at 1M. None/"default" = bf16 1-pass fast mode (124K) whose chunk
    #   selection MEASURABLY misses top-5 docs on near-tie margins —
    #   opt-in only, verify on your corpus. "highest" = f32-faithful, 64K.
    extra_chunks: int = 0,  # slack chunks kept past k (for low-precision dots)
    epilogue: str = "loop",  # chunk-max shape: "loop" | "fold" (see kernel)
    corpus_rows: jnp.ndarray = None,  # [M_pad, D] f32 rescore rows — pass
    #   them: the corpus_t.T fallback re-materializes the transpose inside
    #   jit every call (measured -16%: 109.5K vs 94.4K at 1M/high3)
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense top-k with the fused chunk-max kernel.

    ``corpus_t`` is the [D, M] transpose (prepare once at corpus build; a
    [M, D] layout would put the contraction on lanes), zero-padded to an
    ``m_tile`` multiple by the caller (``pad_corpus_t``); ``m_real`` is the
    true column count — pad columns are masked to -inf inside the kernel
    and in the rescore, so correctness holds even for negative cosines.

    Exactness contract (see module docstring for the measured numbers):
    the top-k superset argument needs the true top-k chunks to survive the
    phase-1 chunk-max ranking, which is only as accurate as the in-kernel
    dot. The DEFAULT ``"high3"`` (manual bf16_3x) keeps selection
    ~1e-5-accurate — full-batch-exact on the 1M bench corpus;
    ``"highest"`` is f32-faithful (~1e-7). ``None``/``"default"`` is the
    bf16-1-pass fast path (~35% faster end-to-end) whose selection
    MEASURABLY misses top-5 docs on near-tie margins (39/1024 bench
    queries) — opt-in only: verify on your corpus (``bench_dense.py``
    gates its headline on full-batch numpy parity every run) or keep
    ``extra_chunks`` slack (error must then beat the k-th-to-(k+extra)-th
    chunk-max margin). The phase-2 rescore is f32 HIGHEST over
    ``corpus_rows`` (required when ``corpus_t`` is bf16), so returned
    scores are f32-exact whenever the superset holds.
    """
    B, d = queries.shape
    m = corpus_t.shape[1]
    if m_real is None:
        m_real = m
    assert m % m_tile == 0 and m_tile % chunk == 0, (m, m_tile, chunk)
    if precision is not None and precision not in _PRECISIONS and (
        precision != "high3"
    ):
        raise ValueError(
            f"unknown precision {precision!r}; use None/'default' (bf16 "
            "1-pass fast mode), 'high3' (manual bf16_3x — Mosaic rejects "
            "Precision.HIGH in-kernel), or 'highest' (f32-faithful)"
        )
    if precision == "high":
        raise ValueError(
            "precision='high' cannot lower: Mosaic rejects Precision.HIGH "
            "on the in-kernel dot — use 'high3' (the manual bf16_3x "
            "equivalent, same accuracy class)"
        )
    if corpus_t.dtype == jnp.bfloat16:
        assert corpus_rows is not None, "bf16 corpus_t needs f32 corpus_rows"
        if precision in ("high3", "highest") and extra_chunks == 0:
            # the kernel dot on bf16 inputs is bf16 1-pass no matter what
            # precision names — selection is then measurably inexact
            # (39/1024 top-5 misses on the 1M bench corpus) unless slack
            # chunks absorb the error
            raise ValueError(
                f"precision={precision!r} with a bf16 corpus_t silently "
                "runs the bf16 1-pass dot (inputs are already bf16); pass "
                "extra_chunks>0 for selection slack or keep the corpus f32"
            )
    if epilogue == "fold":
        npt = m_tile // chunk
        assert chunk & (chunk - 1) == 0 and npt & (npt - 1) == 0, (
            "fold epilogue needs power-of-two chunk and m_tile//chunk",
            chunk, npt,
        )
    kk = min(k, m_real)
    nc = m // chunk

    cmax = pl.pallas_call(
        functools.partial(
            _cmax_kernel, chunk=chunk, m_real=m_real, precision=precision,
            epilogue=epilogue,
        ),
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

    kc = min(kk + extra_chunks, nc)
    _, cidx = jax.lax.top_k(cmax, kc)  # [B, kc] winning chunks
    if epilogue == "fold":
        # chunk g covers rows tile*m_tile + (g % npt) + npt*j, j in [0, chunk)
        npt = m_tile // chunk
        base = (cidx // npt) * m_tile + cidx % npt
        flat = base[:, :, None] + npt * jnp.arange(chunk, dtype=jnp.int32)
    else:
        flat = cidx[:, :, None] * chunk + jnp.arange(chunk, dtype=jnp.int32)
    flat = flat.reshape(B, kc * chunk)  # [B, kc*chunk] global row ids
    rows = corpus_rows if corpus_rows is not None else corpus_t.T
    rows_sel = rows[flat]  # [B, kc*chunk, D] gather
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
