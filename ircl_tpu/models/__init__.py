"""Model zoo: featurizers, encoder heads, contrastive wrapper, verdict QA."""

from ircl_tpu.models.encoder import EncoderConfig, init_encoder_params, seq2vec
from ircl_tpu.models.featurizer import (
    FeaturizerConfig,
    HashEmbedFeaturizer,
    TransformerFeaturizer,
    make_featurizer,
)

__all__ = [
    "EncoderConfig",
    "init_encoder_params",
    "seq2vec",
    "HashEmbedFeaturizer",
    "TransformerFeaturizer",
    "make_featurizer",
    "FeaturizerConfig",
]
