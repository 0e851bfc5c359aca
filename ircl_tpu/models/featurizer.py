"""Text featurizers: frozen embedding producers feeding the encoder head.

The reference freezes a pretrained ``bert-base-uncased`` and feeds its last
hidden state to the BiLSTM head (``src/contrastor/contrastive_module.py:
32-41``). Pretrained weights are not downloadable in this environment, so the
featurizer is an explicit interface with swappable implementations
(SURVEY.md section 7 "hard parts"):

- ``HashEmbedFeaturizer`` (default): deterministic random token embeddings
  addressed by murmur3 token hashes + sinusoidal positions. Frozen by
  construction, fully offline, and — like frozen BERT — a fixed text->R^{LxD}
  map the contrastive head learns on top of.
- ``transformer.BertEncoder`` (see ``models/transformer.py``): the full
  architecture, usable once weights exist locally.

The host/device split is explicit: ``encode_host`` turns strings into padded
id/mask arrays (CPU, cheap), ``features`` is the jittable device map.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ircl_tpu.corpus.filters import normalize
from ircl_tpu.corpus.hashing import hash_tokens
from ircl_tpu.corpus.tokenizer import default_tokenizer


@dataclass(frozen=True)
class FeaturizerConfig:
    dim: int = 768
    max_len: int = 64
    vocab_buckets: int = 1 << 18
    seed: int = 1126  # reference loss-module seed, reused as a nod
    # Token signal must dominate position signal, or every sequence embeds to
    # nearly the same mean-pooled vector (representation collapse).
    token_scale: float = 1.0
    pos_scale: float = 0.1


class HashEmbedFeaturizer:
    """Deterministic frozen featurizer: hashed-token embeddings + positions."""

    def __init__(self, config: FeaturizerConfig = FeaturizerConfig()):
        self.config = config
        key = jax.random.PRNGKey(config.seed)
        # Frozen embedding table: unit-variance rows so distinct tokens give
        # distinct features after mean-pooling.
        self.table = (
            jax.random.normal(key, (config.vocab_buckets, config.dim), jnp.float32)
            * config.token_scale
        )
        pos = np.arange(config.max_len)[:, None]
        div = np.exp(
            np.arange(0, config.dim, 2) * (-np.log(10000.0) / config.dim)
        )
        pe = np.zeros((config.max_len, config.dim), np.float32)
        pe[:, 0::2] = np.sin(pos * div)
        pe[:, 1::2] = np.cos(pos * div)
        self.pos = jnp.asarray(pe) * config.pos_scale

    def encode_host(
        self, texts: Sequence[str]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Strings -> (ids [B, L] int32, mask [B, L] f32)."""
        L = self.config.max_len
        B = len(texts)
        ids = np.zeros((B, L), dtype=np.int32)
        mask = np.zeros((B, L), dtype=np.float32)
        for b, text in enumerate(texts):
            words = default_tokenizer().tokenize(normalize(text)).words(uncased=True)
            if not words:
                continue
            hashed = hash_tokens(words[:L], self.config.vocab_buckets)
            n = len(hashed)
            ids[b, :n] = hashed
            mask[b, :n] = 1.0
        return ids, mask

    @property
    def params(self):
        """Frozen featurizer arrays, passed as *arguments* into jitted
        programs. Closing over them would embed the (possibly hundreds of
        MB) table as an HLO constant — bloating every compile."""
        return {"table": self.table, "pos": self.pos}

    def features(self, ids: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """(ids, mask) -> frozen features [B, L, D]."""
        return hash_embed_apply(self.params, ids, mask)

    @staticmethod
    def apply(params, ids: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """Pure featurizer map for use inside larger jitted programs (params
        must be threaded as arguments, never closed over)."""
        emb = params["table"][ids] + params["pos"][None, : ids.shape[1]]
        return emb * mask[:, :, None]


@jax.jit
def hash_embed_apply(params, ids: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return HashEmbedFeaturizer.apply(params, ids, mask)
