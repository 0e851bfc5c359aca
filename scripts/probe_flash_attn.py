"""Parity probe: flash-attention transformer vs the XLA softmax path.

Same params, same inputs, ``attention="flash"`` vs ``"xla"`` at f32 —
outputs on REAL token rows must agree to f32-matmul tolerance (pad rows
legitimately differ: flash isolates them by segment id instead of
feeding them the -1e9-bias softmax row, and downstream pooling never
reads them). TPU-only (the Pallas kernel has no interpret path here).

Run from the repo root: ``python scripts/probe_flash_attn.py``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ircl_jax_cache")

    from ircl_tpu.models.transformer import (
        TransformerConfig,
        init_transformer_params,
        transformer_apply,
    )

    B, L = 8, 512
    cfg = TransformerConfig(
        vocab_size=1000, hidden=768, layers=2, heads=12,
        intermediate=3072, max_positions=512, dtype=jnp.float32,
    )
    params = init_transformer_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 1000, size=(B, L)), jnp.int32)
    lens = rng.integers(40, L + 1, size=(B,))
    mask = jnp.asarray(
        (np.arange(L)[None, :] < lens[:, None]).astype(np.float32)
    )

    out_x = np.asarray(
        jax.jit(lambda p, i, m: transformer_apply(p, cfg, i, m))(
            params, ids, mask
        )
    )
    cfg_f = dataclasses.replace(cfg, attention="flash")
    out_f = np.asarray(
        jax.jit(lambda p, i, m: transformer_apply(p, cfg_f, i, m))(
            params, ids, mask
        )
    )
    m = np.asarray(mask)[:, :, None].astype(bool)
    diff = np.abs(out_f - out_x)[np.broadcast_to(m, out_x.shape)]
    scale = np.abs(out_x)[np.broadcast_to(m, out_x.shape)].mean()
    print(
        f"real-token rows: max|d|={diff.max():.3e} "
        f"mean|d|={diff.mean():.3e} (mean|x|={scale:.3f})"
    )
    # flash's in-kernel dots are bf16-class even on f32 inputs (Mosaic
    # default dot), so agreement is ~1e-2-relative, not f32-exact —
    # measured max|d| 6.2e-3 at mean|x| 0.8
    ok = diff.max() < 5e-2
    print(f"parity_ok={ok} (bf16-class tolerance)")
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
