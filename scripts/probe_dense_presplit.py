"""Probe: pre-split hi/lo bf16 corpus for the exact dense high3 path.

The shipped ``cosine_topk_fused(precision="high3")`` reads the f32 corpus
tile and splits it in-kernel every call (c_hi = bf16(c); c_lo = bf16(c -
c_hi)) before the three 1-pass MXU dots. This probe pre-splits the corpus
ONCE at build into two bf16 arrays (same 4B/elt total HBM read) and feeds
them to a variant kernel with no per-call VPU split work.

Expectation math (why this may tie): at [1024,128]x[128,1M] the two extra
dots of high3 already account for ~2.7ms of the 2.8ms gap to the 1-pass
mode, leaving <0.1ms for the split VPU work — but the probe is cheap and
the split also shortens the kernel's live-value set (the f32 tile dies
early), which is what caused the 16384-tile VMEM spill. Arms alternate
in-process (load fairness); parity vs numpy f32 on 64 queries per arm.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_presplit_topk():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _kernel(q_ref, chi_ref, clo_ref, out_ref, *, chunk, m_real):
        i = pl.program_id(0)
        q = q_ref[:, :]
        q_hi = q.astype(jnp.bfloat16)
        q_lo = (q - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        c_hi = chi_ref[:, :]
        c_lo = clo_ref[:, :]
        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        s = dot(q_hi, c_hi) + (dot(q_lo, c_hi) + dot(q_hi, c_lo))
        m_t = s.shape[1]
        cols = i * m_t + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(cols < m_real, s, -jnp.inf)
        npt = m_t // chunk
        w = m_t
        while w > npt:
            w //= 2
            s = jnp.maximum(s[:, :w], s[:, w : 2 * w])
        out_ref[:, :] = s

    @functools.partial(
        jax.jit, static_argnames=("k", "chunk", "m_tile", "m_real")
    )
    def topk(queries, ct_hi, ct_lo, corpus_rows, k, chunk, m_tile, m_real):
        B, d = queries.shape
        m = ct_hi.shape[1]
        nc = m // chunk
        cmax = pl.pallas_call(
            functools.partial(_kernel, chunk=chunk, m_real=m_real),
            grid=(m // m_tile,),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            in_specs=[
                pl.BlockSpec((B, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (d, m_tile), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (d, m_tile), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (B, m_tile // chunk), lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((B, nc), jnp.float32),
        )(queries, ct_hi, ct_lo)
        kk = min(k, m_real)
        kc = min(kk, nc)
        _, cidx = jax.lax.top_k(cmax, kc)
        npt = m_tile // chunk
        base = (cidx // npt) * m_tile + cidx % npt
        flat = base[:, :, None] + npt * jnp.arange(chunk, dtype=jnp.int32)
        flat = flat.reshape(B, kc * chunk)
        rows_sel = corpus_rows[flat]
        cand = jax.lax.dot_general(
            queries[:, None, :], rows_sel, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )[:, 0, :]
        cand = jnp.where(flat < m_real, cand, -jnp.inf)
        s, si = jax.lax.top_k(cand, kk)
        gi = jnp.take_along_axis(flat, si, axis=1)
        return s, gi.astype(jnp.int32)

    return topk


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ircl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ircl_tpu.ops.dense_topk_pallas import cosine_topk_fused, pad_corpus_t
    from ircl_tpu.utils.benchtime import check_topk, log, steady as _steady

    M, D, B, K = 1_000_000, 128, 1024, 5
    M_TILE, CHUNK = 8192, 32
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(M, D)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.normal(size=(B, D)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    q_d = jax.device_put(queries)

    n_chk = 64
    ref = queries[:n_chk] @ corpus.T

    ct, m_real = pad_corpus_t(corpus, m_tile=M_TILE)
    rows = np.zeros((ct.shape[1], D), np.float32)
    rows[:M] = corpus
    ct_d = jax.device_put(ct)
    rows_d = jax.device_put(rows)

    # Pre-split ON DEVICE (840MB host splits would stall the tunnel): one
    # jit producing both halves, then drop the f32 copy is NOT possible
    # (the incumbent arm needs it) — both stay resident: 488MB f32 +
    # 2x244MB bf16 + 512MB rows ~ 1.5GB, fine in 16GB HBM.
    @jax.jit
    def split(c):
        hi = c.astype(jnp.bfloat16)
        lo = (c - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    ct_hi, ct_lo = split(ct_d)
    jax.block_until_ready((ct_hi, ct_lo))

    presplit = make_presplit_topk()

    def run_incumbent():
        return cosine_topk_fused(
            q_d, ct_d, k=K, chunk=CHUNK, m_tile=M_TILE, m_real=m_real,
            epilogue="fold", precision="high3", corpus_rows=rows_d,
        )

    def run_presplit():
        return presplit(
            q_d, ct_hi, ct_lo, rows_d, k=K, chunk=CHUNK, m_tile=M_TILE,
            m_real=m_real,
        )

    arms = [("incumbent-warmup", run_incumbent)] + [
        arm
        for _ in range(3)
        for arm in (("high3", run_incumbent), ("presplit", run_presplit))
    ]
    results = {}
    for label, fn in arms:
        t0 = time.time()
        s, i = fn()
        jax.block_until_ready((s, i))
        log(f"{label}: first/steady-entry call {time.time()-t0:.1f}s")
        ok = check_topk(s, i, ref, K, label)
        qps = _steady(fn, label, batch=B, reps=12)
        if label != "incumbent-warmup":
            results.setdefault(label, []).append((qps, ok))

    for label, runs in results.items():
        best = max(q for q, _ in runs)
        med = sorted(q for q, _ in runs)[len(runs) // 2]
        ok = all(o for _, o in runs)
        print(
            f"{label}: best {best:.0f} q/s, median {med:.0f} "
            f"({', '.join(f'{q:.0f}' for q, _ in runs)}) parity_ok={ok}"
        )


if __name__ == "__main__":
    main()
