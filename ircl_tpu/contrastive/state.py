"""Functional training state for contrastive retrieval training.

The reference holds queue / queue_ptr / momentum encoder as module buffers
mutated under ``torch.no_grad`` (``src/contrastor/contrastive_module.py:
24-68``). Under jit all of it is carried state: a single pytree
``TrainState`` threaded through the compiled step and donated, so queue
updates and EMA happen in-place in HBM.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import chex
import jax
import jax.numpy as jnp
import optax

from ircl_tpu.models.encoder import EncoderConfig, init_encoder_params


@dataclass(frozen=True)
class TrainConfig:
    encoder: EncoderConfig = EncoderConfig()
    loss: str = "InfoNCE"  # InfoNCE | ProtoNCE | HProtoNCE
    temperature: float = 0.05
    use_momentum: bool = True
    momentum: float = 0.9
    use_queue: bool = True
    queue_size: int = 12544
    queue_start_steps: int = 5000
    optimizer: str = "adam"  # adam | sgd
    learning_rate: float = 2.5e-4
    adam_betas: tuple = (0.9, 0.999)
    sgd_momentum: float = 0.9
    sgd_weight_decay: float = 1e-4
    grad_clip: float = 1.0
    total_steps: int = 100_000
    micro_batch: int = 128
    accum_steps: int = 2  # effective batch = micro_batch * accum_steps
    # ProtoNCE
    cluster_start_steps: int = 8000
    cluster_update_steps: int = 4000
    num_clusters: tuple = (4096, 6144, 8192)
    num_neg_proto: int = 3072
    # "bfloat16" runs encoder matmuls in bf16 (params and loss stay f32).
    compute_dtype: str = "float32"


@chex.dataclass
class TrainState:
    params_q: Any
    params_k: Any
    opt_state: Any
    queue: jnp.ndarray  # [D, Q] L2-normalized negatives
    queue_ptr: jnp.ndarray  # int32 scalar
    step: jnp.ndarray  # int32 scalar


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    """optax chain equivalent to the reference optimizers + schedule:
    Adam (``src/model.py:52-57``) or SGD with cosine decay
    (``src/train.py:18-23``) and global-norm clipping 1.0
    (``src/train.py:155-159``)."""
    if config.optimizer == "adam":
        tx = optax.adam(
            config.learning_rate,
            b1=config.adam_betas[0],
            b2=config.adam_betas[1],
        )
    elif config.optimizer == "sgd":
        schedule = optax.cosine_decay_schedule(
            init_value=config.learning_rate, decay_steps=config.total_steps
        )
        tx = optax.chain(
            optax.add_decayed_weights(config.sgd_weight_decay),
            optax.sgd(schedule, momentum=config.sgd_momentum),
        )
    else:
        raise ValueError(f"unknown optimizer: {config.optimizer}")
    return optax.chain(optax.clip_by_global_norm(config.grad_clip), tx)


def init_train_state(key: jax.Array, config: TrainConfig) -> TrainState:
    k_enc, k_queue = jax.random.split(key)
    params_q = init_encoder_params(k_enc, config.encoder)
    params_k = jax.tree.map(jnp.copy, params_q)
    queue = jax.random.normal(
        k_queue, (config.encoder.output_size, config.queue_size), jnp.float32
    )
    queue = queue / jnp.linalg.norm(queue, axis=0, keepdims=True)
    tx = make_optimizer(config)
    return TrainState(
        params_q=params_q,
        params_k=params_k,
        opt_state=tx.init(params_q),
        queue=queue,
        queue_ptr=jnp.zeros((), jnp.int32),
        step=jnp.zeros((), jnp.int32),
    )
