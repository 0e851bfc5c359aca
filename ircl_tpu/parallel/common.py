"""Shared building blocks of the corpus-sharded scorers.

``ShardedEllIndex`` and ``ShardedHybridIndex`` share the same layout and the
same merge: doc-major ELL transposed to [K, N], K padded to the sublane
multiple and N to (shards * 256) so every local shard tiles the kernels,
then a local top-k whose (scores, global ids) all-gather over ICI and
re-top-k. One copy here so a padding or merge fix cannot diverge between
the sparse stage-1 paths (it nearly did: the dense scorer's pad-masking fix
had to be mirrored by hand).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pad_and_shard_ell_t(ell_terms, ell_vals, mesh: Mesh, axis: str):
    """[N, K] ELL -> transposed [K_pad, N_pad] arrays device_put doc-sharded.

    Returns (terms_t, vals_t, rows_per_shard). K pads to the f32 sublane
    multiple (8) with -1 sentinels; N pads to shards * 256 with empty docs.
    """
    n_shards = mesh.shape[axis]
    terms_t = np.ascontiguousarray(ell_terms.T)  # [K, N]
    vals_t = np.ascontiguousarray(ell_vals.T)
    k_w, n = terms_t.shape
    k_pad = -(-k_w // 8) * 8 - k_w
    chunk = n_shards * 256
    n_pad = -(-n // chunk) * chunk - n
    terms_t = np.pad(terms_t, ((0, k_pad), (0, n_pad)), constant_values=-1)
    vals_t = np.pad(vals_t, ((0, k_pad), (0, n_pad)), constant_values=0.0)
    sharding = NamedSharding(mesh, P(None, axis))
    return (
        jax.device_put(terms_t, sharding),
        jax.device_put(vals_t, sharding),
        terms_t.shape[1] // n_shards,
    )


def gather_topk_merge(s, gids, k: int, axis: str):
    """Merge per-shard local top-k: all-gather the tiny (scores, global ids)
    pairs over ICI, then one narrow top-k. Runs inside shard_map."""
    all_s = jax.lax.all_gather(s, axis, axis=0)  # [n_shards, B, kk]
    all_i = jax.lax.all_gather(gids, axis, axis=0)
    all_s = jnp.moveaxis(all_s, 0, 1).reshape(s.shape[0], -1)
    all_i = jnp.moveaxis(all_i, 0, 1).reshape(s.shape[0], -1)
    ms, midx = jax.lax.top_k(all_s, min(k, all_s.shape[1]))
    return ms, jnp.take_along_axis(all_i, midx, axis=1)
