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
- ``TransformerFeaturizer``: the reference's actual architecture — a frozen
  transformer (bert-base shaped) whose last hidden state feeds the BiLSTM
  head. Runs fully offline with a corpus-trained WordPiece vocab and random
  init, or with real ``bert-base-uncased`` weights when a local HF cache
  exists (``from_huggingface``).

The host/device split is explicit: ``encode_host`` turns strings into padded
id/mask arrays (CPU, cheap), ``features`` is the jittable device map, and
``apply(params, ids, mask)`` is the pure form used inside larger jitted
programs with params threaded as arguments (never closed over).
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
    kind: str = "hash"  # hash | transformer | hf
    dim: int = 768
    max_len: int = 64
    vocab_buckets: int = 1 << 18
    seed: int = 1126  # reference loss-module seed, reused as a nod
    # Token signal must dominate position signal, or every sequence embeds to
    # nearly the same mean-pooled vector (representation collapse).
    token_scale: float = 1.0
    pos_scale: float = 0.1
    # transformer featurizer (reference: frozen bert-base-uncased,
    # src/contrastor/contrastive_module.py:32-41); dim doubles as hidden size
    tf_layers: int = 12
    tf_heads: int = 12
    tf_intermediate: int = 3072
    wp_vocab: int = 8192  # corpus-trained WordPiece vocab size (offline)
    vocab_file: str = ""  # optional cached vocab.txt
    hf_name: str = "bert-base-uncased"  # kind="hf" checkpoint name


def _native_seq_lib():
    import ctypes

    from ircl_tpu.corpus.hashing import get_native

    return get_native(
        "ircl_tokenize_hash_seq",
        [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ],
        None,
    )


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
        """Strings -> (ids [B, L] int32, mask [B, L] f32).

        The C++ sequence tokenizer (``ircl_tokenize_hash_seq``) handles
        ASCII texts in one pass (~15x: this is the training-loop host hot
        path — 67ms/step of Python tokenize+hash at effective batch 256);
        non-ASCII rows fall back to the Python pipeline, bit-identically.
        """
        L = self.config.max_len
        B = len(texts)
        ids = np.zeros((B, L), dtype=np.int32)
        mask = np.zeros((B, L), dtype=np.float32)
        normed = [normalize(t) for t in texts]
        lib = _native_seq_lib()
        fallback_rows = range(B)
        if lib is not None:
            import ctypes

            ascii_idx = [b for b, t in enumerate(normed) if t.isascii()]
            if ascii_idx:
                encoded = [normed[b].encode("ascii") for b in ascii_idx]
                offsets = np.zeros(len(encoded) + 1, dtype=np.int64)
                np.cumsum([len(e) for e in encoded], out=offsets[1:])
                packed = b"".join(encoded)
                sub_ids = np.zeros((len(encoded), L), dtype=np.int32)
                sub_mask = np.zeros((len(encoded), L), dtype=np.float32)
                lib.ircl_tokenize_hash_seq(
                    packed,
                    offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    len(encoded),
                    self.config.vocab_buckets,
                    L,
                    sub_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    sub_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                )
                ids[ascii_idx] = sub_ids
                mask[ascii_idx] = sub_mask
            ascii_set = set(ascii_idx)
            fallback_rows = [b for b in range(B) if b not in ascii_set]
        for b in fallback_rows:
            words = (
                default_tokenizer().tokenize(normed[b]).words(uncased=True)
            )
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


class _HFTokenizerAdapter:
    """Presents a HuggingFace tokenizer through the WordPiece encode_batch
    contract so TransformerFeaturizer is tokenizer-agnostic."""

    def __init__(self, tok):
        self.tok = tok
        self.vocab_size = tok.vocab_size

    def encode_batch(self, pairs, max_length: int = 128):
        texts_a = [a for a, _ in pairs]
        texts_b = [b for _, b in pairs]
        kwargs = dict(
            padding="max_length",
            truncation=True,
            max_length=max_length,
            return_tensors="np",
        )
        if any(b is not None for b in texts_b):
            enc = self.tok(texts_a, texts_b, **kwargs)
        else:
            enc = self.tok(texts_a, **kwargs)
        ids = enc["input_ids"].astype(np.int32)
        mask = enc["attention_mask"].astype(np.float32)
        types = enc.get("token_type_ids")
        types = (
            types.astype(np.int32)
            if types is not None
            else np.zeros_like(ids)
        )
        return ids, mask, types


class TransformerFeaturizer:
    """Frozen transformer featurizer — the reference's central architecture.

    The reference freezes a pretrained ``bert-base-uncased`` under
    ``torch.no_grad`` and feeds its last hidden state to the BiLSTM head
    (``src/contrastor/contrastive_module.py:32-41``). Here the transformer is
    the functional JAX encoder (``models/transformer.py``), WordPiece runs on
    the host, and the frozen forward sits inside the jitted train step under
    ``stop_gradient`` with params threaded as arguments (closing over a
    ~110M-param pytree would serialize it into every compile request).
    """

    def __init__(self, tokenizer, tcfg, params, config: FeaturizerConfig):
        self.tokenizer = tokenizer
        self.tcfg = tcfg
        self._params = params
        self.config = config
        self._jit_features = None

    # -- constructors --------------------------------------------------------

    @classmethod
    def random_init(
        cls, tokenizer, config: FeaturizerConfig = FeaturizerConfig(kind="transformer")
    ) -> "TransformerFeaturizer":
        """Random-init transformer over a given (word-piece) tokenizer: the
        zero-download path. Like the hash featurizer, a fixed text->R^{LxD}
        map; unlike it, the real architecture the reference uses."""
        from ircl_tpu.models.transformer import (
            TransformerConfig,
            init_transformer_params,
        )

        tcfg = TransformerConfig(
            vocab_size=tokenizer.vocab_size,
            hidden=config.dim,
            layers=config.tf_layers,
            heads=config.tf_heads,
            intermediate=config.tf_intermediate,
            max_positions=max(config.max_len, 512),
        )
        params = init_transformer_params(jax.random.PRNGKey(config.seed), tcfg)
        return cls(tokenizer, tcfg, params, config)

    @classmethod
    def train_from_corpus(
        cls,
        texts,
        config: FeaturizerConfig = FeaturizerConfig(kind="transformer"),
    ) -> "TransformerFeaturizer":
        """Offline default: train a WordPiece vocab from the corpus, then
        random-init the transformer over it."""
        from ircl_tpu.models.wordpiece import WordPieceTokenizer

        if config.vocab_file:
            tok = WordPieceTokenizer.from_vocab_file(config.vocab_file)
        else:
            tok = WordPieceTokenizer.train(texts, vocab_size=config.wp_vocab)
        return cls.random_init(tok, config)

    @classmethod
    def from_huggingface(
        cls,
        name: str = "bert-base-uncased",
        config: FeaturizerConfig = FeaturizerConfig(kind="hf"),
    ) -> "TransformerFeaturizer":
        """Real pretrained weights + tokenizer from a local HF cache (no
        egress in this environment; raises when absent)."""
        import os

        from ircl_tpu.models.transformer import from_huggingface

        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
        from transformers import AutoTokenizer

        tcfg, params = from_huggingface(name)
        tok = _HFTokenizerAdapter(AutoTokenizer.from_pretrained(name))
        cfg = FeaturizerConfig(
            kind="hf",
            dim=tcfg.hidden,
            max_len=config.max_len,
            tf_layers=tcfg.layers,
            tf_heads=tcfg.heads,
            tf_intermediate=tcfg.intermediate,
            hf_name=name,
        )
        return cls(tok, tcfg, params, cfg)

    # -- featurizer protocol -------------------------------------------------

    def encode_host(
        self, texts: Sequence[str]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Strings -> ([B, L] int32 ids, [B, L] f32 mask): [CLS] text [SEP]."""
        ids, mask, _ = self.tokenizer.encode_batch(
            [(t, None) for t in texts], max_length=self.config.max_len
        )
        return ids, mask

    @property
    def params(self):
        """Frozen transformer pytree, passed as *arguments* into jitted
        programs (never closed over — see class docstring)."""
        return self._params

    def apply(self, params, ids: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """Pure frozen forward: last hidden state, padded positions zeroed.
        Bound method — ``self.tcfg`` is static trace-time data; only params
        and the batch are traced."""
        from ircl_tpu.models.transformer import transformer_apply

        h = transformer_apply(params, self.tcfg, ids, mask)
        return h * mask[:, :, None].astype(h.dtype)

    def features(self, ids, mask) -> jnp.ndarray:
        if self._jit_features is None:
            self._jit_features = jax.jit(self.apply)
        return self._jit_features(
            self._params,
            jnp.asarray(ids, jnp.int32),
            jnp.asarray(mask, jnp.float32),
        )


def make_featurizer(config: FeaturizerConfig, corpus_texts=None):
    """Config-driven featurizer factory (CLI entry: ``cli.py::_featurizer``)."""
    if config.kind == "hash":
        return HashEmbedFeaturizer(config)
    if config.kind == "transformer":
        if config.vocab_file:
            return TransformerFeaturizer.train_from_corpus([], config)
        if corpus_texts is None:
            raise ValueError(
                "kind='transformer' needs corpus_texts to train a WordPiece "
                "vocab (or set featurizer.vocab_file)"
            )
        return TransformerFeaturizer.train_from_corpus(corpus_texts, config)
    if config.kind == "hf":
        return TransformerFeaturizer.from_huggingface(config.hf_name, config)
    raise ValueError(f"unknown featurizer kind: {config.kind!r}")
