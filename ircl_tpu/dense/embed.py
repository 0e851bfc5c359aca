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
    mesh=None,
) -> np.ndarray:
    """Embed a text corpus in fixed-size device batches (last batch padded).

    One-deep software pipeline: batch N+1 is tokenized and dispatched
    before batch N's result is pulled to the host, so host encode overlaps
    device execution (JAX async dispatch).

    ``mesh``: optional — shard each batch's rows over the mesh's first axis
    (data parallelism via GSPMD; ``batch_size`` must divide by the axis
    size). Completes the pod-sharded dense pipeline: embed shards ->
    ``sharded_cosine_topk`` -> ICI top-k merge."""
    place = jnp.asarray
    if mesh is not None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        axis = mesh.axis_names[0]
        assert batch_size % mesh.shape[axis] == 0, (batch_size, mesh.shape)
        sh = NamedSharding(mesh, PartitionSpec(axis))
        place = lambda x: jax.device_put(x, sh)
    out: List[np.ndarray] = []
    n = len(texts)
    pending = None  # (device_result, real_rows)
    for i in range(0, n, batch_size):
        chunk = list(texts[i : i + batch_size])
        pad = batch_size - len(chunk)
        if pad:
            chunk = chunk + [""] * pad
        ids, mask = featurizer.encode_host(chunk)
        emb_d = embed_fn(params, place(ids), place(mask))
        if pending is not None:
            out.append(np.asarray(pending[0])[: pending[1]])
        pending = (emb_d, batch_size - pad)
    if pending is not None:
        out.append(np.asarray(pending[0])[: pending[1]])
    if not out:
        dim = 0
        return np.empty((0, dim), np.float32)
    return np.concatenate(out, axis=0)
