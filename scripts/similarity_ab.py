"""A/B: hashed-surface vs lemma-ish similarity feature space for TFIDF-CL.

The framework's one documented deviation from the reference is the pair-
similarity feature space: hashed surface ngrams instead of NLTK-lemmatized
sklearn tf-idf (``preprocessing/build_docs_sentence_similarity.py:27-38``;
PARITY.md). This experiment measures whether that deviation changes what the
``tf_idf`` sampler learns, on a corpus WITH morphological surface variation
(``generate(inflect_prob=...)`` — the default synthetic corpus has none, so
an A/B there is vacuous):

1. pair-ordering divergence between the two similarity spaces,
2. TFIDF-CL sentence recall@5 + claim-evidence cosine trained with each.

Writes the ``<!-- ab:begin/end -->`` section of RESULTS.md. Run from the
repo root: ``python scripts/similarity_ab.py``.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MARK_BEGIN = "<!-- ab:begin -->"
MARK_END = "<!-- ab:end -->"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--claims", type=int, default=300)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--inflect", type=float, default=0.3)
    ap.add_argument("--out", default="RESULTS.md")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ircl_jax_cache")

    from ircl_tpu.contrastive.state import TrainConfig
    from ircl_tpu.contrastive.trainer import ContrastiveTrainer
    from ircl_tpu.corpus.store import MemoryDocStore
    from ircl_tpu.corpus.synthetic import generate
    from ircl_tpu.data.pairs import DocPairSampler
    from ircl_tpu.data.similarity import sentence_pair_similarity
    from ircl_tpu.index.build import build_count_index
    from ircl_tpu.index.ranker import TfidfRanker
    from ircl_tpu.index.tfidf import tfidf_transform
    from ircl_tpu.models.encoder import EncoderConfig
    from ircl_tpu.models.featurizer import FeaturizerConfig, HashEmbedFeaturizer
    from ircl_tpu.pipeline.dense_scorer import ContrastiveSentenceScorer
    from ircl_tpu.pipeline.intrinsic import mean_claim_evidence_cosine
    from ircl_tpu.pipeline.recall import sentence_recall_at_k
    from ircl_tpu.pipeline.retrieve import retrieve

    wiki = generate(
        num_docs=args.docs,
        num_claims=args.claims,
        inflect_prob=args.inflect,
        seed=42,
    )
    claims_text = [c.claim for c in wiki.claims]
    store = MemoryDocStore({d: r["text"] for d, r in wiki.docs.items()})
    index = tfidf_transform(build_count_index(store, ngram=2, hash_size=1 << 22))
    ranker = TfidfRanker(index)
    docs = list(wiki.sentences.values())

    res = {
        "docs": args.docs,
        "claims": args.claims,
        "inflect_prob": args.inflect,
        "steps": args.steps,
    }

    # -- similarity spaces + divergence ---------------------------------------
    t0 = time.time()
    sim_surface = sentence_pair_similarity(docs)
    sim_stem = sentence_pair_similarity(docs, stem=True)
    res["similarity_prep_s"] = round(time.time() - t0, 1)

    top_changed = 0
    order_changed = 0
    eligible = 0
    for a, b in zip(sim_surface, sim_stem):
        if not a:
            continue
        eligible += 1
        if a[0][0] != b[0][0]:
            top_changed += 1
        if [p for p, _ in a] != [p for p, _ in b]:
            order_changed += 1
    res["docs_top_pair_changed"] = round(top_changed / max(eligible, 1), 4)
    res["docs_ordering_changed"] = round(order_changed / max(eligible, 1), 4)

    # -- train TFIDF-CL with each space ----------------------------------------
    feat = HashEmbedFeaturizer(FeaturizerConfig(dim=768, max_len=32))
    cfg = TrainConfig(
        encoder=EncoderConfig(masked_mean=True),
        micro_batch=128,
        accum_steps=2,
        queue_start_steps=300,
        learning_rate=2.5e-4,
    )

    for tag, sim in (("surface", sim_surface), ("stem", sim_stem)):
        sampler = DocPairSampler(docs, sample="tf_idf", similarity=sim, seed=7)
        with tempfile.TemporaryDirectory() as td:
            tr = ContrastiveTrainer(
                cfg, feat, sampler, ckptdir=td + "/c", logdir=td + "/l"
            )
            t0 = time.time()
            state = tr.train(total_steps=args.steps, log_step=10**9)
            res[f"train_{tag}_s"] = round(time.time() - t0, 1)
        scorer = ContrastiveSentenceScorer(cfg, feat, state)
        r = retrieve(
            claims_text, ranker, wiki.sentences, scorer,
            k_docs=5, k_sents=5, batch_size=256,
        )
        res[f"sentence_recall@5_{tag}"] = round(
            sentence_recall_at_k(wiki.claims, r.sentences, k=5), 4
        )
        cos = mean_claim_evidence_cosine(scorer.embed, wiki.claims, wiki.sentences)
        res[f"cosine_{tag}"] = round(cos["mean_cosine"], 4)

    print(json.dumps(res))

    lines = [
        MARK_BEGIN,
        "",
        "## Similarity feature-space A/B (hashed surface vs lemma-ish)",
        "",
        f"Corpus with morphological variation (inflect_prob="
        f"{args.inflect}, {args.docs} docs): the tf_idf pair sampler driven "
        "by hashed-surface-ngram similarity vs suffix-stripped (lemma-ish) "
        "similarity — quantifying the framework's documented deviation from "
        "the reference's NLTK-lemma tf-idf (PARITY.md).",
        "",
        "| metric | value |",
        "|---|---|",
    ]
    lines += [f"| {k} | {v} |" for k, v in res.items()]
    lines += ["", MARK_END]
    section = "\n".join(lines)

    text = open(args.out).read() if os.path.exists(args.out) else ""
    if MARK_BEGIN in text:
        text = re.sub(
            re.escape(MARK_BEGIN) + r".*?" + re.escape(MARK_END),
            lambda _: section,
            text,
            flags=re.S,
        )
    else:
        text = text.rstrip() + "\n\n" + section + "\n"
    with open(args.out, "w") as f:
        f.write(text)


if __name__ == "__main__":
    main()
