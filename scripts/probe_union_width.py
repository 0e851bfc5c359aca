"""Host-only probe: live heavy-union width at the bench corpus/config.

Prints, for each df_threshold, the number of live heavy buckets in the
B-claim batch union, the pow2 pad, and the round512 pad — the inputs to
the sparse speed-of-light accounting in docs/DESIGN.md (heavy contraction
FLOPs scale linearly with the padded union width). Pure host work: no jax
device use, safe to run while the TPU is busy.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from ircl_tpu.corpus.store import MemoryDocStore
    from ircl_tpu.corpus.synthetic import generate
    from ircl_tpu.index.build import build_count_index
    from ircl_tpu.index.ranker import vectorize_queries
    from ircl_tpu.index.tfidf import tfidf_transform

    NUM_DOCS, HASH_SIZE = 50_000, 1 << 24
    batches = [int(x) for x in (sys.argv[1:] or ["2048", "4096"])]
    wiki = generate(num_docs=NUM_DOCS, num_claims=max(batches), seed=11)
    claims = [c.claim for c in wiki.claims]
    store = MemoryDocStore({d: r["text"] for d, r in wiki.docs.items()})
    index = tfidf_transform(
        build_count_index(store, ngram=2, hash_size=HASH_SIZE)
    )
    buckets, weights = vectorize_queries(
        claims, HASH_SIZE, 2, index.doc_freqs, index.num_docs,
        max_terms=64,
    )
    for B in batches:
        bk, wt = buckets[:B], weights[:B]
        live = np.unique(bk[wt != 0])
        for df in (16, 24, 32, 48):
            heavy = live[index.doc_freqs[live] > df]
            n = len(heavy)
            pow2 = 1 << max(12, int(np.ceil(np.log2(max(n, 1)))))
            r512 = ((max(n, 4096) + 511) // 512) * 512
            print(
                f"B={B} df={df}: live_heavy={n} pow2_pad={pow2} "
                f"round512_pad={r512} (flops ratio r512/pow2 "
                f"{r512 / pow2:.2f})"
            )


if __name__ == "__main__":
    main()
