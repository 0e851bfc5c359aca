"""Data-parallel contrastive training over a device mesh.

The reference trains single-GPU with gradient accumulation
(``src/train.py:53-59``); the TPU-native scale-out replaces accumulation with
real batch parallelism: the global batch is sharded over the ``data`` mesh
axis, parameters and queue state are replicated, and XLA inserts the gradient
``psum`` and the embedding ``all_gather`` that NT-Xent's in-batch negatives
require (the sim matrix is over the *global* batch — identical math to the
single-device step, not a local-negatives approximation).

Implementation is pure pjit: the same jitted ``train_step`` body, with
``in_shardings`` placing the batch on ``data`` and state replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ircl_tpu.contrastive.state import TrainConfig, TrainState
from ircl_tpu.contrastive import train as train_mod


def make_dp_train_step(config: TrainConfig, featurizer, mesh: Mesh, axis: str = "data"):
    """DP-sharded train step: batch arrays [A, B, L] sharded on B."""
    raw_step = train_mod.make_train_step(config, featurizer, jit=False)

    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(None, axis, None))

    def place_state(state: TrainState) -> TrainState:
        return jax.device_put(state, replicated)

    def place_batch(*arrays):
        return tuple(jax.device_put(jnp.asarray(a), batch_sharded) for a in arrays)

    def body(state, ids_a, mask_a, ids_k, mask_k, feat_params):
        return raw_step(
            state, ids_a, mask_a, ids_k, mask_k, None, feat_params
        )

    jitted = jax.jit(
        body,
        in_shardings=(
            replicated,
            batch_sharded,
            batch_sharded,
            batch_sharded,
            batch_sharded,
            replicated,
        ),
        out_shardings=(replicated, replicated, replicated),
        donate_argnums=0,
    )

    def step(state, ids_a, mask_a, ids_k, mask_k):
        return jitted(
            state, ids_a, mask_a, ids_k, mask_k, featurizer.params
        )

    return step, place_state, place_batch
