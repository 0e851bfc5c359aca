"""Corpus-sharded sparse index scoring over a device mesh.

Scales the membership-matmul scorer (``ops/membership_pallas``) across chips:
ELL rows (documents) shard over the ``corpus`` axis, queries and the batch
union replicate, every chip scores its local doc shard with the same fused
kernel, takes a local top-k, offsets to global doc ids, and all-gathers the
tiny (k scores, k ids) pairs over ICI for the final merge — the same
collective pattern as the dense scorer (``dense/scorer.py``), applied to the
sparse stage-1 index. The full score matrix never leaves any chip.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class ShardedEllIndex:
    """Doc-sharded ELL index + the jitted scoring function."""

    def __init__(self, ell, mesh: Mesh, axis: str = "corpus", interpret=None):
        self.mesh = mesh
        self.axis = axis
        self.num_real_docs = ell.num_docs
        from ircl_tpu.parallel.common import pad_and_shard_ell_t

        self.terms_t, self.vals_t, self.rows_per_shard = pad_and_shard_ell_t(
            ell.terms, ell.vals, mesh, axis
        )
        self.interpret = (
            interpret
            if interpret is not None
            else jax.default_backend() == "cpu"
        )
        self._fns = {}

    def _build(self, k: int):
        from jax import shard_map

        from ircl_tpu.ops.membership_pallas import membership_slab

        axis = self.axis
        rows = self.rows_per_shard
        num_real = self.num_real_docs
        interpret = self.interpret

        def local_fn(terms_shard, vals_shard, u_sorted, qb_t, qw_t):
            my = jax.lax.axis_index(axis)
            u_tile = min(512, u_sorted.shape[0])
            m = membership_slab(
                u_sorted, terms_shard, vals_shard, u_tile=u_tile,
                d_tile=256, interpret=interpret,
            )  # [U, rows]
            wt = membership_slab(
                u_sorted, qb_t, qw_t, u_tile=u_tile, d_tile=128,
                interpret=interpret,
            )  # [U, B]
            scores = jax.lax.dot_general(
                wt, m, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [B, rows]
            kk = min(k, rows)
            s, i = jax.lax.top_k(scores, kk)
            gids = i.astype(jnp.int32) + my * rows
            from ircl_tpu.parallel.common import gather_topk_merge

            ms, mi = gather_topk_merge(s, gids, k, axis)
            empty = (ms <= 0.0) | (mi >= num_real)
            return jnp.where(empty, 0.0, ms), jnp.where(empty, -1, mi)

        fn = shard_map(
            local_fn,
            mesh=self.mesh,
            in_specs=(P(None, self.axis), P(None, self.axis), P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)

    def topk(
        self,
        u_sorted: np.ndarray,
        qb_t: np.ndarray,
        qw_t: np.ndarray,
        k: int,
    ) -> Tuple[np.ndarray, np.ndarray]:
        if k not in self._fns:
            self._fns[k] = self._build(k)
        s, i = self._fns[k](
            self.terms_t,
            self.vals_t,
            jnp.asarray(u_sorted),
            jnp.asarray(qb_t),
            jnp.asarray(qw_t),
        )
        return np.asarray(s), np.asarray(i)
