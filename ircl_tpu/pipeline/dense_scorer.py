"""Stage-2 dense sentence scorer backed by the contrastive encoder.

The reference left dense re-ranking commented out in its predict path
(``src/evaluation.py:105-116``: claim/evidence cosine via ``ctx2vec``). Here
it is a first-class ``SentenceScorer``: claims and candidate sentences embed
through the trained query encoder (one padded device batch per call), scores
are cosine = dot of L2-normalized embeddings.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ircl_tpu.contrastive.state import TrainConfig, TrainState
from ircl_tpu.contrastive.train import make_embed_fn
from ircl_tpu.dense.embed import embed_corpus


class ContrastiveSentenceScorer:
    def __init__(
        self,
        config: TrainConfig,
        featurizer,
        state: TrainState,
        batch_size: int = 256,
    ):
        self.config = config
        self.featurizer = featurizer
        self.params = state.params_q
        self.embed_fn = make_embed_fn(config, featurizer)
        self.batch_size = batch_size

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        return embed_corpus(
            self.embed_fn, self.params, self.featurizer, texts, self.batch_size
        )

    def __call__(
        self, claims: Sequence[str], candidates: Sequence[Sequence[str]]
    ) -> List[np.ndarray]:
        claim_emb = self.embed(list(claims))
        flat = [s for cand in candidates for s in cand]
        if not flat:
            return [np.empty(0, np.float32) for _ in candidates]
        sent_emb = self.embed(flat)
        out: List[np.ndarray] = []
        pos = 0
        for ci, cand in enumerate(candidates):
            n = len(cand)
            if n == 0:
                out.append(np.empty(0, np.float32))
                continue
            out.append(sent_emb[pos : pos + n] @ claim_emb[ci])
            pos += n
        return out
