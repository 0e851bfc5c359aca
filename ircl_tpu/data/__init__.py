from ircl_tpu.data.pairs import DocPairSampler
from ircl_tpu.data.similarity import sentence_pair_similarity

__all__ = ["DocPairSampler", "sentence_pair_similarity"]
