"""Pod-sharded hybrid scoring: df-split index over the corpus axis.

Scales ``ops/hybrid.py`` across chips (BASELINE.json config 5 for the sparse
stage). Layout:

- the heavy ELL shards over the ``corpus`` axis (each chip scores its doc
  range with the small membership slab),
- light posting pools are routed host-side to the owning shard by doc id
  (cheap: a digitize + regroup over <=B*pool entries) and arrive as one
  [S, B, P] array sharded on S,
- every shard runs the exact hybrid merge on its local docs, then the
  per-shard (k scores, k global ids) merge over ICI — the same tiny
  all-gather as the dense and ell sharded paths.

Exactness is preserved shard-locally (the heavy/light candidate argument
applies within each doc range) and the global merge is a max-k of exact
per-shard top-ks.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ircl_tpu.index.split import SplitIndex


class ShardedHybridIndex:
    def __init__(
        self,
        split: SplitIndex,
        mesh: Mesh,
        axis: str = "corpus",
        interpret=None,
        slab_impl: str = None,
    ):
        self.split = split
        self.mesh = mesh
        self.axis = axis
        # On the virtual CPU mesh default to the XLA slab: interpret-mode
        # Pallas emulates per grid cell and caps the practical corpus at
        # ~40K docs, while the XLA slab executes 500K+ (scripts/
        # sharded_scale.py). On TPU the Pallas kernels stay the default.
        if slab_impl is None:
            slab_impl = "xla" if jax.default_backend() == "cpu" else "pallas"
        self.slab_impl = slab_impl
        n_shards = mesh.shape[axis]
        self.n_shards = n_shards
        self.num_real_docs = split.num_docs

        from ircl_tpu.parallel.common import pad_and_shard_ell_t

        self.terms_t, self.vals_t, self.rows_per_shard = pad_and_shard_ell_t(
            split.heavy.terms, split.heavy.vals, mesh, axis
        )
        self.interpret = (
            interpret if interpret is not None else jax.default_backend() == "cpu"
        )
        self._fns = {}

    # -- host-side light routing ---------------------------------------------

    def route_light(
        self, light_docs: np.ndarray, light_contribs: np.ndarray, floor: int = 64
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Global [B, P] pools -> per-shard [S, B, P_s] pools with LOCAL doc
        ids (padding = rows_per_shard, i.e. past the local range)."""
        B, Pw = light_docs.shape
        S, rows = self.n_shards, self.rows_per_shard
        shard_of = light_docs // rows  # padding ids (num_docs) land in-range
        valid = light_docs < self.num_real_docs
        shard_of = np.where(valid, shard_of, -1)

        counts = np.zeros((S, B), np.int64)
        for s in range(S):
            counts[s] = (shard_of == s).sum(axis=1)
        p_s = floor
        while p_s < counts.max(initial=0):
            p_s *= 2

        out_d = np.full((S, B, p_s), rows, dtype=np.int32)
        out_c = np.zeros((S, B, p_s), dtype=np.float32)
        order = np.argsort(shard_of, axis=1, kind="stable")  # group by shard
        sd = np.take_along_axis(shard_of, order, axis=1)
        dd = np.take_along_axis(light_docs, order, axis=1)
        cc = np.take_along_axis(light_contribs, order, axis=1)
        for s in range(S):
            m = sd == s
            cols = np.cumsum(m, axis=1) - 1
            rows_idx = np.broadcast_to(np.arange(B)[:, None], m.shape)
            out_d[s, rows_idx[m], cols[m]] = dd[m] - s * rows
            out_c[s, rows_idx[m], cols[m]] = cc[m]
        return out_d, out_c

    # -- device scoring --------------------------------------------------------

    def _build(self, k: int):
        from jax import shard_map

        from ircl_tpu.ops.hybrid import hybrid_topk

        axis = self.axis
        rows = self.rows_per_shard
        num_real = self.num_real_docs
        interpret = self.interpret
        slab_impl = self.slab_impl

        def local_fn(terms_shard, vals_shard, u_sorted, qb_t, qw_t, ld, lc):
            my = jax.lax.axis_index(axis)
            # local exact hybrid over this shard's doc range; ld/lc arrive as
            # [1, B, P_s] (sharded on the leading shard axis).
            local_real = jnp.minimum(
                jnp.maximum(num_real - my * rows, 0), rows
            )
            s, i = hybrid_topk(
                terms_shard,
                vals_shard,
                u_sorted,
                qb_t,
                qw_t,
                ld[0],
                lc[0],
                k=k,
                num_real_docs=rows,  # local range; global filter below
                interpret=interpret,
                slab_impl=slab_impl,
            )
            # mask docs past this shard's real range
            bad = (i < 0) | (i >= local_real)
            s = jnp.where(bad, 0.0, s)
            gids = jnp.where(bad, -1, i + my * rows)
            from ircl_tpu.parallel.common import gather_topk_merge

            ms, mi = gather_topk_merge(s, gids, k, axis)
            empty = (ms <= 0.0) | (mi < 0)
            return jnp.where(empty, 0.0, ms), jnp.where(empty, -1, mi)

        fn = shard_map(
            local_fn,
            mesh=self.mesh,
            in_specs=(
                P(None, self.axis),
                P(None, self.axis),
                P(),
                P(),
                P(),
                P(self.axis, None, None),
                P(self.axis, None, None),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)

    def topk(self, u_sorted, qb_t, qw_t, light_docs, light_contribs, k: int):
        ld, lc = self.route_light(light_docs, light_contribs)
        if k not in self._fns:
            self._fns[k] = self._build(k)
        s, i = self._fns[k](
            self.terms_t,
            self.vals_t,
            jnp.asarray(u_sorted),
            jnp.asarray(qb_t),
            jnp.asarray(qw_t),
            jnp.asarray(ld),
            jnp.asarray(lc),
        )
        return np.asarray(s), np.asarray(i)
