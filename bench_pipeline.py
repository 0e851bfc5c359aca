"""Secondary benchmark: TWO-STAGE serving throughput on one chip.

End-to-end `RetrievalService.search_sentences` queries/sec at 50K docs:
sparse tf-idf top-k docs (stage 1, pinned 256-query service batches) ->
dense sentence re-rank (stage 2). Stage 2 runs the serving-form
`PrecomputedSentenceScorer`: every corpus sentence is embedded ONCE at
build (the offline `embed_corpus` sweep, cached on disk keyed by the
corpus digest), so a request costs one query-batch embed plus a row
gather + dot per query — no sentence ever re-embeds at serving time.

The on-the-fly re-embedding arm (`ContrastiveSentenceScorer`, what a naive
port of the reference's commented-out dense re-rank would do per request —
`src/evaluation.py:105-116`) is timed on stderr for the comparison; the
JSON line reports the precomputed arm. `vs_baseline` is null: the
reference never shipped this stage, so there is no CPU analogue to ratio
against.

Prints ONE JSON line:
  {"metric": "two_stage_sentence_qps_50k_docs", "value": QPS,
   "unit": "queries/s", "vs_baseline": null}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(args=None):
    from ircl_tpu.utils.benchtime import probe_backend, unavailable_line

    if not probe_backend():
        unavailable_line("two_stage_sentence_qps_50k_docs", "queries/s")
        return

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ircl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ircl_tpu.contrastive.state import TrainConfig, init_train_state
    from ircl_tpu.corpus.store import MemoryDocStore
    from ircl_tpu.corpus.synthetic import corpus_digest, generate
    from ircl_tpu.index.build import build_count_index
    from ircl_tpu.index.ranker import TfidfRanker
    from ircl_tpu.index.tfidf import tfidf_transform
    from ircl_tpu.models.featurizer import (
        FeaturizerConfig,
        HashEmbedFeaturizer,
    )
    from ircl_tpu.pipeline.dense_scorer import (
        ContrastiveSentenceScorer,
        PrecomputedSentenceScorer,
    )
    from ircl_tpu.serve import RetrievalService

    NUM_DOCS = int(os.environ.get("IRCL_BENCH_DOCS", 50_000))
    NUM_CLAIMS = 2048
    SERVICE_B = 256
    K_DOCS, K_SENTS = 5, 5

    t0 = time.time()
    wiki = generate(num_docs=NUM_DOCS, num_claims=NUM_CLAIMS, seed=11)
    claims = [c.claim for c in wiki.claims]
    n_sents = sum(len(s) for s in wiki.sentences.values())
    log(
        f"corpus generated in {time.time()-t0:.1f}s "
        f"({NUM_DOCS} docs, {n_sents} sentences)"
    )

    t0 = time.time()
    store = MemoryDocStore({d: rec["text"] for d, rec in wiki.docs.items()})
    index = tfidf_transform(
        build_count_index(store, ngram=2, hash_size=1 << 24)
    )
    log(f"index built in {time.time()-t0:.1f}s ({index.nnz} postings)")

    # Stage-1 ranker: the judged bench's serving config (bench.py), at the
    # service batch of 256.
    ranker = TfidfRanker(
        index, mode="hybrid", width_buckets=2,
        fixed_union_cap=4096, fixed_max_terms=64,
        precision="high", union_round=512,
    )

    # Contrastive encoder at reference shapes, random-init (throughput is
    # weight-independent; recall quality is eval_e2e's job, not this bench's).
    cfg = TrainConfig()  # 768 -> 3x256 bi -> 128
    feat = HashEmbedFeaturizer(FeaturizerConfig(dim=768, max_len=64))
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    scorer = ContrastiveSentenceScorer(cfg, feat, state, batch_size=SERVICE_B)

    # Offline sentence table: embed every corpus sentence once; disk-cached
    # by corpus digest + encoder config so reruns skip the sweep.
    cache = (
        f"/tmp/ircl_sent_table_{corpus_digest(wiki)}_"
        f"{cfg.encoder.output_size}d_seed0.npy"
    )
    t0 = time.time()
    table = None
    try:
        table = np.load(cache)
        log(f"sentence table loaded from {cache}")
    except Exception:
        pass
    try:
        pre = PrecomputedSentenceScorer(
            scorer.embed, wiki.sentences, table=table
        )
    except ValueError:  # stale cache (row-count mismatch): rebuild
        table = None
        pre = PrecomputedSentenceScorer(scorer.embed, wiki.sentences)
    if table is None:
        np.save(cache, pre.table)
        log(
            f"sentence table built in {time.time()-t0:.1f}s "
            f"({pre.table.shape[0]}x{pre.table.shape[1]})"
        )

    svc = RetrievalService(
        ranker, batch_size=SERVICE_B, default_k=K_DOCS,
        doc_sentences=wiki.sentences, sentence_scorer=pre,
        default_k_sents=K_SENTS,
    )
    t0 = time.time()
    svc.warmup()
    log(f"warmup (stage-1 + stage-2 compiles) in {time.time()-t0:.1f}s")

    # ---- precomputed arm: full passes over all claims ----
    def one_pass(queries):
        t0 = time.time()
        for lo in range(0, len(queries), SERVICE_B):
            svc.search_sentences(queries[lo : lo + SERVICE_B])
        return len(queries) / (time.time() - t0)

    one_pass(claims[:SERVICE_B])  # discard: residual lazy uploads
    best = 0.0
    for rep in range(6):
        qps = one_pass(claims)
        best = max(best, qps)
        log(f"precomputed pass {rep}: {qps:.0f} q/s (best {best:.0f})")

    # ---- on-the-fly arm (what per-request re-embedding costs) ----
    svc_fly = RetrievalService(
        ranker, batch_size=SERVICE_B, default_k=K_DOCS,
        doc_sentences=wiki.sentences, sentence_scorer=scorer,
        default_k_sents=K_SENTS,
    )
    block = claims[:SERVICE_B]
    t0 = time.time()
    svc_fly.search_sentences(block)  # compile+warm
    log(f"on-the-fly first block {time.time()-t0:.1f}s")
    fly_best = 0.0
    for rep in range(3):
        t0 = time.time()
        svc_fly.search_sentences(block)
        fly_best = max(fly_best, SERVICE_B / (time.time() - t0))
    log(
        f"on-the-fly re-embedding arm: {fly_best:.0f} q/s "
        f"(precomputed table is {best / max(fly_best, 1e-9):.1f}x)"
    )

    print(
        json.dumps(
            {
                "metric": "two_stage_sentence_qps_50k_docs",
                "value": round(best, 1),
                "unit": "queries/s",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
