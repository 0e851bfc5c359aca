"""Verdict classifier: transformer encoder + roberta-style head.

Equivalent of the reference's ``RoBertaClassifier``
(``src/QA/model.py:10-37``): sequence classification over
(claim, evidence) pairs, SUPPORTS=1 / REFUTES=0. The head is the
roberta-style two-layer tanh head over the [CLS] position. The reference
freezes the transformer body until ``warmup_steps`` then unfreezes
(``model.py:24-28``); here freezing is a traced 0/1 multiplier on the body
gradients — same schedule, no recompilation, no optimizer surgery.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ircl_tpu.models.transformer import (
    TransformerConfig,
    init_transformer_params,
    transformer_apply,
    transformer_apply_with_aux,
    _dense_init,
)


@dataclasses.dataclass(frozen=True)
class VerdictConfig:
    encoder: TransformerConfig = TransformerConfig()
    num_labels: int = 2
    learning_rate: float = 1e-5
    warmup_steps: int = 5000
    total_steps: int = 50_000
    freeze_body_until_warmup: bool = True
    max_length: int = 512
    # weight on the MoE load-balance aux loss (only if encoder.moe is set)
    moe_aux_weight: float = 0.01


def init_verdict_params(key: jax.Array, cfg: VerdictConfig) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(key, 3)
    h = cfg.encoder.hidden
    return {
        "body": init_transformer_params(k1, cfg.encoder),
        "head_dense": {"w": _dense_init(k2, (h, h)), "b": jnp.zeros(h)},
        "head_out": {
            "w": _dense_init(k3, (h, cfg.num_labels)),
            "b": jnp.zeros(cfg.num_labels),
        },
    }


def verdict_apply(
    params: Dict[str, Any],
    cfg: VerdictConfig,
    ids: jnp.ndarray,
    mask: jnp.ndarray,
    type_ids: Optional[jnp.ndarray] = None,
    constrain=None,  # activation-sharding hook (sequence parallelism)
    ep_constrain=None,  # expert-parallel hook (parallel/ep.py, MoE only)
) -> jnp.ndarray:
    """Logits [B, num_labels] (MoE aux discarded — inference path)."""
    return verdict_apply_with_aux(
        params, cfg, ids, mask, type_ids, constrain, ep_constrain
    )[0]


def verdict_apply_with_aux(
    params: Dict[str, Any],
    cfg: VerdictConfig,
    ids: jnp.ndarray,
    mask: jnp.ndarray,
    type_ids: Optional[jnp.ndarray] = None,
    constrain=None,
    ep_constrain=None,
):
    """(logits [B, num_labels], MoE load-balance aux — 0 for dense)."""
    hidden, aux = transformer_apply_with_aux(
        params["body"], cfg.encoder, ids, mask, type_ids,
        constrain=constrain, ep_constrain=ep_constrain,
    )
    return verdict_head(params, hidden[:, 0, :]), aux


def verdict_head(params: Dict[str, Any], cls: jnp.ndarray) -> jnp.ndarray:
    """roberta-style two-layer tanh head: [B, hidden] -> [B, num_labels]."""
    x = jnp.tanh(
        jnp.dot(cls, params["head_dense"]["w"], preferred_element_type=jnp.float32)
        + params["head_dense"]["b"]
    )
    return (
        jnp.dot(x, params["head_out"]["w"], preferred_element_type=jnp.float32)
        + params["head_out"]["b"]
    )


def make_verdict_optimizer(cfg: VerdictConfig) -> optax.GradientTransformation:
    """AdamW with linear warmup then linear decay (the reference's
    ``get_linear_schedule_with_warmup``, ``src/QA/train.py:38-43``)."""
    schedule = optax.join_schedules(
        [
            optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps),
            optax.linear_schedule(
                cfg.learning_rate,
                0.0,
                max(cfg.total_steps - cfg.warmup_steps, 1),
            ),
        ],
        [cfg.warmup_steps],
    )
    # weight_decay pinned explicitly (optax's default, relied on by the
    # measured results) — the body-freeze logic must also suppress it, since
    # decoupled decay updates params even under zero gradients
    return optax.adamw(schedule, weight_decay=1e-4)


def make_verdict_train_step(cfg: VerdictConfig, constrain=None,
                            ep_constrain=None):
    """``constrain``: optional activation-sharding hook threaded into the
    transformer body (``parallel.tp.make_sp_constrainer`` for Megatron
    sequence parallelism on a TP mesh); ``ep_constrain``
    (``parallel.ep.make_ep_constrainer``) pins the MoE expert slabs for
    expert parallelism. None leaves the step unchanged."""
    tx = make_verdict_optimizer(cfg)

    def loss_fn(params, ids, mask, type_ids, labels):
        logits, aux = verdict_apply_with_aux(
            params, cfg, ids, mask, type_ids, constrain, ep_constrain
        )
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()
        if cfg.encoder.moe is not None:
            loss = loss + cfg.moe_aux_weight * aux
        return loss, jnp.argmax(logits, axis=-1)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, step_idx, ids, mask, type_ids, labels):
        (loss, preds), grads = grad_fn(params, ids, mask, type_ids, labels)
        if cfg.freeze_body_until_warmup:
            body_on = (step_idx >= cfg.warmup_steps).astype(jnp.float32)
            grads = dict(
                grads,
                body=jax.tree.map(lambda g: g * body_on, grads["body"]),
            )
        updates, opt_state = tx.update(grads, opt_state, params)
        if cfg.freeze_body_until_warmup:
            # zeroed grads alone do NOT freeze under AdamW: decoupled weight
            # decay still shrinks the body every step (the reference's
            # requires_grad=False body receives no updates at all) — zero
            # the body UPDATES too while frozen
            updates = dict(
                updates,
                body=jax.tree.map(lambda u: u * body_on, updates["body"]),
            )
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, preds

    return step, tx


@functools.partial(jax.jit, static_argnames=("cfg",))
def verdict_predict(params, cfg: VerdictConfig, ids, mask, type_ids):
    logits = verdict_apply(params, cfg, ids, mask, type_ids)
    return jnp.argmax(logits, axis=-1)
