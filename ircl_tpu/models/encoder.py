"""Contrastive encoder head: BiLSTM stack + projection + mean-pool + L2 norm.

Functional equivalent of the reference's ``LSTM`` module + ``seq2vec``
(``src/model.py:7-41``, ``src/contrastor/contrastive_module.py:102-112``):
frozen features [B, L, 768] -> BiLSTM(3x256, bi) -> Linear(512 -> 128) ->
mean over sequence -> L2 normalize. The reference mean-pools over the padded
length (no mask); ``masked_mean=True`` gives the corrected variant.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ircl_tpu.ops.bilstm import bilstm_apply, init_bilstm_params, _xavier_uniform


@dataclass(frozen=True)
class EncoderConfig:
    input_size: int = 768
    hidden_size: int = 256
    output_size: int = 128
    num_layers: int = 3
    bidirectional: bool = True
    # 'identity' | 'tanh' | 'relu' | 'gelu' (reference default Identity via
    # config.yaml:8; the reference eval()s arbitrary nn activations).
    activation: str = "identity"
    masked_mean: bool = False


_ACTIVATIONS = {
    "identity": lambda x: x,
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
}


def init_encoder_params(key: jax.Array, config: EncoderConfig) -> Dict[str, Any]:
    k_lstm, k_lin = jax.random.split(key)
    dirs = 2 if config.bidirectional else 1
    return {
        "lstm": init_bilstm_params(
            k_lstm,
            config.input_size,
            config.hidden_size,
            config.num_layers,
            config.bidirectional,
        ),
        "proj_w": _xavier_uniform(
            k_lin, (config.output_size, dirs * config.hidden_size)
        ),
        "proj_b": jnp.zeros((config.output_size,), jnp.float32),
    }


def encoder_apply(
    params: Dict[str, Any], config: EncoderConfig, features: jnp.ndarray
) -> jnp.ndarray:
    """[B, L, I] -> [B, L, output_size] (pre-pooling)."""
    h = bilstm_apply(params["lstm"], features)
    out = (
        jax.lax.dot_general(
            h,
            params["proj_w"].astype(h.dtype).T,
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + params["proj_b"]
    )
    return _ACTIVATIONS[config.activation](out)


def seq2vec(
    params: Dict[str, Any],
    config: EncoderConfig,
    features: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[B, L, I] -> L2-normalized [B, output_size] embeddings."""
    out = encoder_apply(params, config, features)
    if config.masked_mean and mask is not None:
        denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
        emb = (out * mask[:, :, None]).sum(axis=1) / denom
    else:
        emb = out.mean(axis=1)
    norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb / jnp.maximum(norm, 1e-12)
