"""Blockwise ring attention over a named mesh axis (context parallelism).

The reference has no long-context story at all (SURVEY.md §5: max_length=512
truncation, ``src/QA/train.py``); this is new TPU-native surface. The
pattern is Ring Attention (Liu et al., 2023) specialized to the encoder's
non-causal, pad-masked attention:

- the sequence dimension is sharded over a mesh axis (``"seq"``): each
  device holds its local Q block permanently and STREAMS the K/V (and pad
  bias) blocks around the ring with ``lax.ppermute``, so the full [L, L]
  score matrix never materializes on any chip and per-device attention
  memory stays O(L_local * L_local);
- a numerically stable online softmax (running max ``m``, normalizer ``l``,
  weighted accumulator ``acc`` — the flash-attention recurrence) makes the
  streamed result equal full ``softmax(QK^T + bias) V`` over the GLOBAL
  sequence, up to f32 reassociation;
- backward needs nothing special: ``ppermute`` and ``lax.scan`` are
  differentiable, so ``jax.grad`` through the shard_map region derives the
  reverse ring (the same property ``parallel/pp.py`` relies on for the
  pipeline backward).

Must be called inside a ``shard_map`` whose mesh carries ``axis_name``;
``parallel/cp.py`` provides the verdict-transformer wiring and
``models/transformer.py::attention_sublayer`` dispatches here when its
``seq_axis`` argument is set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def ring_attention(
    q: jnp.ndarray,  # [B, H, Lq_local, D] — this shard's query block
    k: jnp.ndarray,  # [B, H, Lk_local, D] — this shard's key block
    v: jnp.ndarray,  # [B, H, Lk_local, D] — this shard's value block
    bias: jnp.ndarray,  # [B, 1, 1, Lk_local] additive pad bias (local block)
    axis_name: str,
) -> jnp.ndarray:
    """Global-sequence attention output for the local Q block.

    Equals ``softmax(Q K_global^T / sqrt(D) + bias_global) V_global`` for
    this shard's rows, computed by rotating (k, v, bias) one hop per step
    for ``n = mesh.shape[axis_name]`` steps. All softmax math runs in f32
    (the XLA path's ``preferred_element_type`` convention); the output is
    cast back to ``q.dtype``.
    """
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    scale = 1.0 / np.sqrt(q.shape[-1])
    # the scan carry mixes device-varying (k/v/bias) and freshly-created
    # accumulators: mark the latter varying over the ring axis up front so
    # every carry component has one VMA type (shard_map scan requirement)
    def _vary(x):
        return jax.lax.pcast(x, (axis_name,), to="varying")

    m0 = _vary(jnp.full(q.shape[:3], -jnp.inf, jnp.float32))  # [B, H, Lq]
    l0 = _vary(jnp.zeros(q.shape[:3], jnp.float32))
    acc0 = _vary(jnp.zeros(q.shape, jnp.float32))

    def step(carry, _):
        k_blk, v_blk, b_blk, m, l, acc = carry
        logits = (
            jnp.einsum(
                "bhqd,bhkd->bhqk", q, k_blk,
                preferred_element_type=jnp.float32,
            )
            * scale
            + b_blk.astype(jnp.float32)  # [B,1,1,Lk] broadcasts over H, Lq
        )
        m_new = jnp.maximum(m, logits.max(axis=-1))
        p = jnp.exp(logits - m_new[..., None])  # [B, H, Lq, Lk]
        corr = jnp.exp(m - m_new)  # 0 on the first step (m = -inf)
        l = l * corr + p.sum(axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        b_blk = jax.lax.ppermute(b_blk, axis_name, perm)
        return (k_blk, v_blk, b_blk, m_new, l, acc), None

    (_, _, _, _, l, acc), _ = jax.lax.scan(
        step, (k, v, bias, m0, l0, acc0), None, length=n
    )
    return (acc / l[..., None]).astype(q.dtype)
