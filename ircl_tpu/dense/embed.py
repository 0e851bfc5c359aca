"""Corpus embedding sweep: batched text -> normalized embedding matrix.

Device-side analogue of the reference's ``extract_all_emb`` no-grad loop
(``src/contrastor/utils.py:11-25``), but producing a corpus-side embedding
matrix for retrieval (and for clustering): host tokenizes + batches, device
runs the jitted embed fn, rows come back into one [M, D] float32 array.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax.numpy as jnp
import numpy as np


def embed_corpus(
    embed_fn: Callable,
    params,
    featurizer,
    texts: Sequence[str],
    batch_size: int = 256,
) -> np.ndarray:
    """Embed a text corpus in fixed-size device batches (last batch padded).

    One-deep software pipeline: batch N+1 is tokenized and dispatched
    before batch N's result is pulled to the host, so host encode overlaps
    device execution (JAX async dispatch)."""
    out: List[np.ndarray] = []
    n = len(texts)
    pending = None  # (device_result, real_rows)
    for i in range(0, n, batch_size):
        chunk = list(texts[i : i + batch_size])
        pad = batch_size - len(chunk)
        if pad:
            chunk = chunk + [""] * pad
        ids, mask = featurizer.encode_host(chunk)
        emb_d = embed_fn(params, jnp.asarray(ids), jnp.asarray(mask))
        if pending is not None:
            out.append(np.asarray(pending[0])[: pending[1]])
        pending = (emb_d, batch_size - pad)
    if pending is not None:
        out.append(np.asarray(pending[0])[: pending[1]])
    if not out:
        dim = 0
        return np.empty((0, dim), np.float32)
    return np.concatenate(out, axis=0)
