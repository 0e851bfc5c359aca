"""Dense retrieval: corpus embedding sweeps and blocked cosine top-k."""

from ircl_tpu.dense.scorer import cosine_topk, sharded_cosine_topk
from ircl_tpu.dense.embed import embed_corpus

__all__ = ["cosine_topk", "sharded_cosine_topk", "embed_corpus"]
