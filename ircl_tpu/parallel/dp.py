"""Data-parallel contrastive training over a device mesh.

The reference trains single-GPU with gradient accumulation
(``src/train.py:53-59``); the TPU-native scale-out replaces accumulation with
real batch parallelism: the global batch is sharded over the ``data`` mesh
axis, parameters and queue state are replicated, and XLA inserts the gradient
``psum`` and the embedding ``all_gather`` that NT-Xent's in-batch negatives
require (the sim matrix is over the *global* batch — identical math to the
single-device step, not a local-negatives approximation).

Implementation is pure pjit: the same jitted ``train_step`` body, with the
batch arrays committed to ``P(None, "data", None)`` shardings and state /
prototype tables replicated — GSPMD partitions the step from the input
layouts alone. ProtoNCE/HProtoNCE inputs ride along: per-granularity batch
cluster ids shard with the batch (``P(None, "data")``), centroids, densities
and the shared negative-prototype draw are replicated.

``ContrastiveTrainer(..., mesh=...)`` runs its whole loop through this step
(``contrastive/trainer.py``); ``cli train --dp`` enables it from the CLI.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ircl_tpu.contrastive.state import TrainConfig, TrainState
from ircl_tpu.contrastive import train as train_mod


def make_dp_train_step(config: TrainConfig, featurizer, mesh: Mesh, axis: str = "data"):
    """DP-sharded train step: batch arrays [A, B, L] sharded on B.

    Returns ``(step, place_state, place_batch, place_proto)``. All inputs
    must go through their ``place_*`` helper (device_put commits the layout;
    the jitted step infers every sharding from the committed operands).
    """
    raw_step = train_mod.make_train_step(config, featurizer, jit=False)

    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(None, axis, None))
    ids_sharded = NamedSharding(mesh, P(None, axis))
    feat_dev = jax.device_put(featurizer.params, replicated)

    def place_state(state: TrainState) -> TrainState:
        return jax.device_put(state, replicated)

    def place_batch(*arrays):
        return tuple(jax.device_put(jnp.asarray(a), batch_sharded) for a in arrays)

    def place_proto(proto):
        """(cluster_ids [G][A,B], centroids, densities, neg_ids) -> committed:
        ids shard with the batch, prototype tables replicate."""
        if proto is None:
            return None
        cluster_ids, centroids, densities, neg_ids = proto
        ids = [
            jax.device_put(jnp.asarray(i), ids_sharded) for i in cluster_ids
        ]
        rep = lambda t: jax.tree.map(  # noqa: E731
            lambda x: jax.device_put(jnp.asarray(x), replicated), t
        )
        return (ids, rep(centroids), rep(densities), rep(neg_ids))

    def body(state, ids_a, mask_a, ids_k, mask_k, proto, feat_params):
        return raw_step(state, ids_a, mask_a, ids_k, mask_k, proto, feat_params)

    jitted = jax.jit(
        body,
        out_shardings=(replicated, replicated, replicated),
        donate_argnums=0,
    )

    def step(state, ids_a, mask_a, ids_k, mask_k, proto: Optional[Any] = None):
        return jitted(state, ids_a, mask_a, ids_k, mask_k, proto, feat_dev)

    return step, place_state, place_batch, place_proto
