"""Jitted contrastive train step: micro-batch scan, queue, EMA, clipping.

One compiled function covers the reference's whole inner loop
(``src/train.py:86-175``): per micro-batch forward with the queue state as it
evolves (micro-batch 2 sees micro-batch 1's enqueued keys, as in the
reference where ``_dequeue_and_enqueue`` runs inside each forward), gradient
accumulation scaled by the effective batch (``loss / acml_batch_size``,
``src/train.py:137-146``), one optimizer update with global-norm clip, then
the EMA key-encoder update (``contrastive_module.py:43-53``). Queue
activation at ``queue_start_steps`` is a traced flag — no shape change, no
recompile.

The featurizer is frozen: its application sits inside the step under
``stop_gradient`` (reference runs BERT under ``torch.no_grad``,
``contrastive_module.py:36-41``).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ircl_tpu.contrastive.losses import nt_xent_loss, proto_loss
from ircl_tpu.contrastive.state import TrainConfig, TrainState, make_optimizer
from ircl_tpu.models.encoder import seq2vec


def _enqueue(
    queue: jnp.ndarray, ptr: jnp.ndarray, keys: jnp.ndarray, queue_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Functional ring-buffer write (reference ``_dequeue_and_enqueue``,
    ``contrastive_module.py:55-68``). keys: [N, D]."""
    n = keys.shape[0]
    # cast: under compute_dtype="bfloat16" the keys arrive bf16 while the
    # queue buffer stays f32 (dynamic_update_slice requires equal dtypes)
    queue = jax.lax.dynamic_update_slice(
        queue, keys.T.astype(queue.dtype), (0, ptr)
    )
    ptr = (ptr + n) % queue_size
    return queue, ptr


def make_train_step(config: TrainConfig, featurizer, jit: bool = True):
    """Build the train step (jitted unless ``jit=False`` — the raw body is
    used by the DP wrapper, which applies its own jit with shardings).

    Inputs per call: ids/masks of shape [accum, micro, L] for anchor and
    positive views. Optional proto inputs (cluster ids per granularity for
    each micro-batch, centroids, densities, sampled negative ids).
    """
    tx = make_optimizer(config)
    enc_cfg = config.encoder
    eff_batch = config.micro_batch * config.accum_steps
    if config.use_queue and config.queue_size % config.micro_batch != 0:
        # The reference SILENTLY skips the ring-buffer write in this case
        # (contrastive_module.py:59) — training would then run forever
        # against the frozen random-init queue while the queue term stays
        # in the loss. Deliberate deviation: fail fast instead.
        raise ValueError(
            f"queue_size ({config.queue_size}) must be a multiple of "
            f"micro_batch ({config.micro_batch}) when use_queue=True; "
            "otherwise keys are never enqueued and the loss trains against "
            "the random-init queue"
        )
    do_enqueue = config.use_queue

    compute_dtype = jnp.dtype(config.compute_dtype)

    def micro_loss(params_q, params_k, queue, use_queue_flag, batch, proto, feat_params):
        ids_a, mask_a, ids_k, mask_k = batch
        # Frozen featurizer applied inside the step; its params arrive as
        # arguments (closing over them would embed the embedding table as an
        # HLO constant — hundreds of MB in every compile).
        feats_a = jax.lax.stop_gradient(featurizer.apply(feat_params, ids_a, mask_a))
        feats_k = jax.lax.stop_gradient(featurizer.apply(feat_params, ids_k, mask_k))
        # Mixed precision: encoder matmuls follow the feature dtype; losses,
        # normalization, and optimizer state stay f32.
        feats_a = feats_a.astype(compute_dtype)
        feats_k = feats_k.astype(compute_dtype)
        q = seq2vec(params_q, enc_cfg, feats_a, mask_a)
        if config.use_momentum:
            k = jax.lax.stop_gradient(seq2vec(params_k, enc_cfg, feats_k, mask_k))
        else:
            k = seq2vec(params_q, enc_cfg, feats_k, mask_k)
        loss = nt_xent_loss(
            q,
            k,
            config.temperature,
            queue=queue if config.use_queue else None,
            use_queue=use_queue_flag,
        )
        if proto is not None:
            cluster_ids, centroids, densities, neg_ids = proto
            loss = loss + proto_loss(q, cluster_ids, centroids, densities, neg_ids)
        return loss / eff_batch, k

    grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

    def train_step(
        state: TrainState,
        ids_a: jnp.ndarray,  # [A, B, L] int32
        mask_a: jnp.ndarray,  # [A, B, L] f32
        ids_k: jnp.ndarray,
        mask_k: jnp.ndarray,
        proto: Optional[Any] = None,
        feat_params: Any = None,
    ) -> Tuple[TrainState, jnp.ndarray, jnp.ndarray]:
        use_queue_flag = (
            state.step >= config.queue_start_steps
        ).astype(jnp.float32)

        def body(carry, micro):
            grads_acc, queue, ptr, loss_acc = carry
            m_ids_a, m_mask_a, m_ids_k, m_mask_k, proto_ids = micro
            p = None
            if proto is not None:
                _, centroids, densities, neg_ids = proto
                p = (proto_ids, centroids, densities, neg_ids)
            (loss, k), grads = grad_fn(
                state.params_q,
                state.params_k,
                queue,
                use_queue_flag,
                (m_ids_a, m_mask_a, m_ids_k, m_mask_k),
                p,
                feat_params,
            )
            if do_enqueue:
                queue, ptr = _enqueue(queue, ptr, k, config.queue_size)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, queue, ptr, loss_acc + loss), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.params_q)
        if proto is not None:
            proto_ids_all = proto[0]  # [G][A, B] per granularity, stacked
            micros = (ids_a, mask_a, ids_k, mask_k, proto_ids_all)
        else:
            micros = (ids_a, mask_a, ids_k, mask_k, jnp.zeros((config.accum_steps,)))
        (grads, queue, ptr, loss_sum), _ = jax.lax.scan(
            body,
            (zero_grads, state.queue, state.queue_ptr, jnp.zeros(())),
            micros,
        )

        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params_q)
        params_q = optax.apply_updates(state.params_q, updates)

        if config.use_momentum:
            m = config.momentum
            params_k = jax.tree.map(
                lambda pk, pq: pk * m + pq * (1.0 - m),
                state.params_k,
                params_q,
            )
        else:
            params_k = state.params_k

        new_state = TrainState(
            params_q=params_q,
            params_k=params_k,
            opt_state=opt_state,
            queue=queue,
            queue_ptr=ptr,
            step=state.step + 1,
        )
        return new_state, loss_sum, grad_norm

    if not jit:
        return train_step

    jitted = jax.jit(train_step, donate_argnums=0)

    def call(state, ids_a, mask_a, ids_k, mask_k, proto=None):
        return jitted(
            state, ids_a, mask_a, ids_k, mask_k, proto, featurizer.params
        )

    return call


def make_embed_fn(config: TrainConfig, featurizer):
    """Jitted inference path text-features -> normalized embeddings
    (reference ``ctx2vec``, ``contrastive_module.py:96-100``)."""

    @jax.jit
    def embed(params_q, feat_params, ids, mask):
        feats = featurizer.apply(feat_params, ids, mask)
        return seq2vec(params_q, config.encoder, feats, mask)

    def call(params_q, ids, mask):
        return embed(params_q, featurizer.params, ids, mask)

    return call
