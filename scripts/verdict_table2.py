"""Verdict F1 vs evidence source — the report's Table 2 analogue.

The reference's extrinsic evaluation (report.pdf Table 2, §4.3) compares the
FEVER verdict classifier under different evidence inputs: ground truth
(ceiling), TF-IDF retrieval, claim-only, and random evidence. This script
reproduces that experiment on the synthetic 2-class corpus
(``generate(refute_fraction=...)``): train the verdict transformer on gold
evidence, then evaluate with each evidence source swapped in via
``build_examples(evidence_override=...)``.

Writes the ``<!-- table2:begin/end -->`` RESULTS.md section. Run from the
repo root: ``python scripts/verdict_table2.py``.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MARK_BEGIN = "<!-- table2:begin -->"
MARK_END = "<!-- table2:end -->"


def main():
    ap = argparse.ArgumentParser()
    # Defaults = the configuration that reproduces the Table 2 ordering
    # (RESULTS.md). Below ~10K train claims the random-init transformer
    # memorizes instead of learning the claim-evidence comparison.
    ap.add_argument("--docs", type=int, default=600)
    ap.add_argument("--train-claims", type=int, default=20000)
    ap.add_argument("--dev-claims", type=int, default=1000)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--max-length", type=int, default=128)
    ap.add_argument("--warmup", type=int, default=50)
    # Train-time format augmentation: gold evidence embedded among up to N
    # sampled distractor sentences at a random position. Without it the
    # classifier trains on "1 title + 1 sentence" (~43 tokens) but is
    # evaluated on retrieval output "5 titles + 5 sentences" (~136 tokens)
    # — a format shift a random-init tiny transformer cannot absorb
    # (measured: tfidf F1 0.471 vs gold 0.897 with near-perfect retrieval,
    # sentence recall@5 0.994). The reference survives the same shift via
    # pretrained roberta (src/QA/model.py:13); this is the random-init
    # analogue. Gold is always present, so training is still gold-evidence.
    ap.add_argument("--train-distractors", type=int, default=4)
    # Fact-slot cardinality. At 50 the corpus is adversarial in a way real
    # FEVER is not: a REFUTES claim's corrupted val token collides with
    # distractor sentences' vals so often that tf-idf retrieval pulls the
    # claim's val into the evidence 74% of the time ("val trap", measured),
    # and robust classification then requires entity-bound value comparison
    # that a random-init 2L transformer cannot learn (phase-C val ceiling
    # 0.625). Real fact slots (dates, years, counts) are high-cardinality,
    # where the trap is rare; 500 matches that regime.
    ap.add_argument("--val-range", type=int, default=500)
    # REFUTES val-trap rate injected into phase C (0 disables). The serving
    # distribution's measured rates: 0.74 at val_range=50, 0.48 at 500 —
    # tf-idf actively retrieves documents containing the claim's corrupted
    # value (a rare, high-idf query term). MEASURED NEGATIVE as a training
    # signal at this model size: injecting it (0.48 or 0.74) caps phase-C
    # val at ~0.63-0.69 and drags the gold ceiling down with it (0.904 ->
    # 0.679) — the trap-robust entity-bound comparison circuit is beyond a
    # random-init 2L transformer regardless of the training distribution.
    # Kept as an experiment flag; default off (the v9 configuration).
    ap.add_argument("--phase-c-trap", type=float, default=0.0)
    # Curriculum restarts: the random-init comparison task is run-to-run
    # unstable ACROSS SEEDS (documented above: phase A 0.92 vs 0.65; phase
    # B/C plateaus measured 0.74-0.85 for identical configs) — standard
    # val-based model selection: train the full curriculum N times with
    # different seeds, keep the params with the best final-phase val F1,
    # evaluate the dev table once on those.
    ap.add_argument("--restarts", type=int, default=3)
    # Serving-order alignment: probability that phase C places the gold
    # sentence FIRST in the evidence window, matching the serving
    # distribution (retrieved evidence is score-ordered and the gold
    # sentence is at rank 0 for 97-99% of dev claims — RESULTS.md link 1).
    # The round-3 default (uniform gold position) forces a position-
    # invariant comparison circuit that a random-init 2L model cannot
    # learn; rank-realistic ordering reduces the wide-window task to
    # "compare the claim against the leading sentence".
    ap.add_argument("--phase-c-gold-first", type=float, default=0.0)
    # Train-time replay of ACTUAL retrieval output: phase C's evidence is
    # the tf-idf pipeline's top-k sentences for each TRAIN claim (score
    # order, natural val-trap rate, natural same-doc mix), k sampled
    # uniformly from {1, 3, 5} per example so val selection tracks every
    # eval window. Gold presence rides on the real recall@k (~0.99), so
    # supervision is intact; the k=1 draws reproduce the pure gold format
    # (gold at rank 0), replacing the explicit gold_frac replay.
    # DEFAULT since round 4: the measured best config by a wide margin —
    # gold 0.907 / k1 0.905 (99.8% of ceiling) / k3 0.843 (93.0%) / k5
    # 0.838 (92.4%), seed-stable (val 0.845-0.855 across 3 restarts),
    # vs 99.4%/78%/74% for the sampled-distractor + gold-replay phase C
    # (--no-phase-c-retrieved). Costs ~240s of retrieval replay build.
    ap.add_argument(
        "--phase-c-retrieved",
        action=argparse.BooleanOptionalAction,
        default=True,
    )
    ap.add_argument("--out", default="RESULTS.md")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ircl_jax_cache")

    from ircl_tpu.corpus.store import MemoryDocStore
    from ircl_tpu.corpus.synthetic import generate
    from ircl_tpu.index.build import build_count_index
    from ircl_tpu.index.ranker import TfidfRanker
    from ircl_tpu.index.tfidf import tfidf_transform
    from ircl_tpu.models.transformer import TransformerConfig
    from ircl_tpu.models.wordpiece import WordPieceTokenizer
    from ircl_tpu.pipeline.retrieve import host_sparse_scorer, retrieve
    from ircl_tpu.verdict.data import build_examples, encode_examples
    from ircl_tpu.verdict.evaluate import classification_report
    from ircl_tpu.verdict.model import VerdictConfig
    from ircl_tpu.verdict.train import predict_in_batches, train_verdict

    n_claims = args.train_claims + args.dev_claims
    # value_tokens + refute_marker=False + refute_corrupt=0: every sentence
    # carries one valNN "fact slot"; REFUTES claims differ from their gold
    # evidence ONLY in that slot. The label is unrecoverable from the claim
    # alone — the classifier must compare the claim's value against the
    # evidence's, so evidence quality matters, as in the reference's
    # Table 2. (Free-form token-overlap comparison was also tried: a
    # random-init tiny transformer memorizes instead of comparing — see
    # RESULTS notes; the reference's evidence-sensitivity rides on
    # *pretrained* roberta.)
    wiki = generate(
        num_docs=args.docs,
        num_claims=n_claims,
        claim_keep_prob=0.7,
        refute_fraction=0.4,
        refute_marker=False,
        refute_corrupt=0.0,
        value_tokens=True,
        val_range=args.val_range,
        seed=23,
    )
    train_claims = wiki.claims[: args.train_claims]
    dev_claims = wiki.claims[args.train_claims :]
    doc_sents = wiki.sentences

    res = {
        "docs": args.docs,
        "train_claims": len(train_claims),
        "dev_claims": len(dev_claims),
    }

    # ---- train on gold evidence (the reference trains on FEVER gold) -------
    # Three-phase curriculum (all phases gold-evidence; measured round 3):
    #   A  pure gold                      -- the value-comparison task is
    #      learnable from random init here (val 0.92 @ 10 ep) but NOT in
    #      any distractor format (val 0.50 @ 20 ep from scratch);
    #   B  gold + random-doc distractors  -- adapts the reader to the
    #      multi-sentence serving format (val 0.81);
    #   C  gold + 50% same-doc distractors -- retrieval's stage-2 candidate
    #      lists are dominated by same-doc sentences sharing the claim's
    #      entity tokens; this phase is unlearnable before B (starting it
    #      at epoch 9 collapsed the gold ceiling to 0.71) but a warm B
    #      model can adapt.
    # The reference needs no curriculum because pretrained roberta absorbs
    # the format shift (src/QA/model.py:13).
    res["train_distractors"] = args.train_distractors
    res["phase_c"] = (
        "retrieved_k135"
        if args.phase_c_retrieved
        else f"sampled(gold_first={args.phase_c_gold_first})"
    )

    import re as _re

    _val_re = _re.compile(r"\bval(\d+)\b")
    # val token -> sentences containing it (the "val trap" pool, see below)
    _val_inv = {}
    for _d, _sents in doc_sents.items():
        for _si, _sent in enumerate(_sents):
            for _v in set(_val_re.findall(_sent)):
                _val_inv.setdefault(_v, []).append((_d, _si))

    def build_aug(same_doc_frac: float, seed: int, fixed_n: bool = False,
                  refute_val_trap: float = 0.0, gold_frac: float = 0.0,
                  mid_frac: float = 0.0, gold_first: float = 0.0):
        """Gold evidence + distractor sentences.

        ``refute_val_trap``: probability that a REFUTES claim's evidence
        includes a distractor sentence containing the CLAIM's (corrupted)
        val token. This is the serving distribution's defining trap: the
        claim's val is itself a tf-idf retrieval feature, so retrieval
        pulls in sentences containing it — measured 74% of retrieved
        REFUTES evidence vs 8% under uniform distractor sampling. A model
        trained without the trap learns "claim val present => SUPPORTS"
        and that shortcut misfires on 3/4 of retrieved REFUTES claims.
        ``fixed_n`` pins the distractor count to the serving format's
        (k_sents - 1). ``gold_frac``: probability an example keeps the
        PURE GOLD format (zero distractors) regardless of ``fixed_n`` —
        replay against catastrophic forgetting: the dev table's
        ground_truth/k1 rows are 1-title+1-sentence, and a phase trained
        (and best-val-selected) only on the 4-distractor format drifts
        off it (measured: gold ceiling 0.904 -> 0.80 across 3 seeds when
        phase C is pure fixed_n). ``mid_frac``: probability of the
        half-window format (train_distractors // 2 distractors = the k3
        eval window) so selection tracks all three eval formats."""
        rng_t = np.random.default_rng(seed)
        all_ids = list(doc_sents.keys())
        override = []
        for c in train_claims:
            gold = [(d, s) for d, ss in c.evidences.items() for s in ss]
            gold_doc = gold[0][0]
            if gold_frac > 0.0 and rng_t.random() < gold_frac:
                n_d = 0
            elif mid_frac > 0.0 and rng_t.random() < mid_frac:
                n_d = max(args.train_distractors // 2, 1)
            elif fixed_n:
                n_d = args.train_distractors
            else:
                n_d = int(rng_t.integers(0, args.train_distractors + 1))
            picks = []
            if (
                refute_val_trap > 0.0
                and c.label == "REFUTES"
                and n_d > 0
                and rng_t.random() < refute_val_trap
            ):
                cv = _val_re.findall(c.claim)
                pool = [
                    k for k in _val_inv.get(cv[0] if cv else "", ())
                    if k not in gold
                ]
                if pool:
                    picks.append(pool[int(rng_t.integers(len(pool)))])
            while len(picks) < n_d:
                if (
                    rng_t.random() < same_doc_frac
                    and len(doc_sents[gold_doc]) > 1
                ):
                    d = gold_doc
                else:
                    d = all_ids[int(rng_t.integers(len(all_ids)))]
                picks.append((d, int(rng_t.integers(len(doc_sents[d])))))
            rng_t.shuffle(picks)
            if gold_first > 0.0 and rng_t.random() < gold_first:
                pos = 0  # serving-order alignment: gold leads (rank 0)
            else:
                pos = int(rng_t.integers(0, n_d + 1))
            override.append(picks[:pos] + gold + picks[pos:])
        return build_examples(
            train_claims, doc_sents, evidence_override=override
        )

    _ranker_box = {}

    def get_ranker():
        if "r" not in _ranker_box:
            store = MemoryDocStore(
                {d: r["text"] for d, r in wiki.docs.items()}
            )
            index = tfidf_transform(
                build_count_index(store, ngram=2, hash_size=1 << 22)
            )
            _ranker_box["r"] = TfidfRanker(index)
        return _ranker_box["r"]

    def retrieve_sentences(claim_objs):
        """Full two-stage retrieval (the serving pipeline) over claims."""
        return retrieve(
            [c.claim for c in claim_objs], get_ranker(), doc_sents,
            host_sparse_scorer(), k_docs=5, k_sents=5, batch_size=256,
        )

    train_ex_gold = build_examples(train_claims, doc_sents)
    if args.train_distractors > 0:
        # Train each phase TO CRITERION, not for a fixed epoch count: the
        # epoch at which a random-init model "gets off the ground" on the
        # comparison task varies by several epochs run-to-run, and a weak
        # phase A poisons everything after it (measured: phase A val 0.92
        # vs 0.65 across runs of the same budget).
        # (examples, max epochs, stop criterion, lr, keep_best). Fine-tune
        # phases run at 1/3 LR (full LR forgets: B-val decayed 0.77 -> 0.74
        # over a phase) and return their best-val epoch (C peaked mid-phase
        # at 0.843 then slid to 0.808).
        if args.phase_c_retrieved:
            # Phase C = the serving distribution itself: top-k retrieved
            # sentences per train claim, k ~ U{1,3,5} (score order, natural
            # trap rate / same-doc mix / gold rank). k=1 draws reproduce
            # the pure gold format via recall@1~0.99, so no explicit
            # gold_frac replay is needed.
            t_r = time.time()
            r_train = retrieve_sentences(train_claims)
            rng_k = np.random.default_rng(13)
            ks = rng_k.choice([1, 3, 5], size=len(train_claims))
            phase_c_ex = build_examples(
                train_claims, doc_sents,
                evidence_override=[
                    sents[: int(k)]
                    for sents, k in zip(r_train.sentences, ks)
                ],
            )
            print(
                f"phase-C retrieval replay built in {time.time()-t_r:.1f}s",
                file=sys.stderr, flush=True,
            )
        else:
            phase_c_ex = build_aug(
                0.5, 13, fixed_n=True,
                refute_val_trap=args.phase_c_trap,
                gold_frac=0.25,
                gold_first=args.phase_c_gold_first,
            )
        phases = [
            (train_ex_gold, args.epochs, 0.90, 3e-4, False),
            (build_aug(0.0, 11), max(args.epochs // 2, 1), None, 1e-4, True),
            (
                # mid_frac MEASURED NEGATIVE (2026-08): adding 25% of the
                # k3-window format to (distractor-sampled) phase C diluted
                # it — every row fell (gold 0.916 -> 0.876, k3 0.700 ->
                # 0.666, k5 0.648 -> 0.628, same 3 seeds). gold_frac=0.25
                # replay alone was the best sampled-distractor config;
                # see --phase-c-retrieved / --phase-c-gold-first above.
                phase_c_ex,
                max(args.epochs // 2, 1),
                None,
                1e-4,
                True,
            ),
        ]
        tok_corpus = phases[2][0]
    else:
        phases = [(train_ex_gold, args.epochs, None, 3e-4, False)]
        tok_corpus = train_ex_gold
    tok = WordPieceTokenizer.train(
        [e.claim for e in tok_corpus] + [e.evidence_text for e in tok_corpus],
        vocab_size=4096,
    )
    vcfg = VerdictConfig(
        encoder=TransformerConfig(
            vocab_size=tok.vocab_size,
            hidden=args.hidden,
            layers=args.layers,
            heads=4,
            intermediate=4 * args.hidden,
            max_positions=args.max_length,
        ),
        learning_rate=3e-4,
        warmup_steps=args.warmup,
        freeze_body_until_warmup=True,
        max_length=args.max_length,
    )
    t0 = time.time()
    import dataclasses

    # Pre-encode each phase's examples once; restarts reuse them.
    encoded = [
        (encode_examples(ex, tok, args.max_length), n_ep, target, lr, kb)
        for ex, n_ep, target, lr, kb in phases
    ]

    def run_curriculum(seed):
        params, history = None, []
        for (ids, mask, types, labels), n_ep, target, lr, keep_best in (
            encoded
        ):
            cfg_p = dataclasses.replace(vcfg, learning_rate=lr)
            params, hist = train_verdict(
                cfg_p, ids, mask, types, labels,
                epochs=n_ep, batch_size=32, val_fraction=0.05,
                init_params=params, stop_at_val_f1=target,
                keep_best=keep_best, seed=seed,
                # FIXED split across restarts: selection by val F1 is only
                # meaningful when every restart is scored on the same val
                # set (varying it confounds model quality with split noise)
                split_seed=1009,
            )
            history = history + hist
        # Val F1 of the params this restart returns: with keep_best the
        # last phase returns its BEST epoch's params (max over its
        # history); without it, the LAST epoch's.
        final = (
            max((h["val_macro_f1"] or 0.0) for h in hist)
            if keep_best
            else (hist[-1]["val_macro_f1"] or 0.0)
        )
        return params, history, final

    best = None
    restart_vals = []
    for r in range(max(args.restarts, 1)):
        seed = 1009 + 101 * r  # reference QA seed + offsets
        params_r, history_r, final_r = run_curriculum(seed)
        restart_vals.append(round(final_r, 4))
        print(
            f"restart {r} (seed {seed}): final val F1 {final_r:.4f}",
            file=sys.stderr, flush=True,
        )
        if best is None or final_r > best[2]:
            best = (params_r, history_r, final_r)
    params, history, _ = best
    res["train_s"] = round(time.time() - t0, 1)
    res["restart_val_f1s"] = restart_vals
    res["final_val_macro_f1"] = best[2]
    log_hist = [
        (h["epoch"], round(h["train_loss"], 4), round(h["val_macro_f1"] or 0, 3))
        for h in history
    ]
    print("history (epoch, loss, val_f1):", log_hist, file=sys.stderr)

    # ---- evidence variants at eval time -------------------------------------
    rng = np.random.default_rng(5)
    doc_ids = list(doc_sents.keys())

    def tfidf_override():
        r = retrieve_sentences(dev_claims)
        # Measure what this retrieval achieves ON THIS corpus, so the F1
        # delta vs gold is attributable (retrieval miss vs classifier).
        ranks = []
        for c, sents in zip(dev_claims, r.sentences):
            gold = {(d, s) for d, ss in c.evidences.items() for s in ss}
            ranks.append(
                next((i for i, p in enumerate(sents) if p in gold), -1)
            )
        ranks = np.asarray(ranks)
        for k in (1, 5):
            res[f"tfidf_sentence_recall@{k}"] = round(
                float(np.mean((ranks >= 0) & (ranks < k))), 3
            )
        return r.sentences

    def random_override():
        out = []
        for _ in dev_claims:
            picks = []
            for _ in range(3):
                d = doc_ids[int(rng.integers(len(doc_ids)))]
                picks.append((d, int(rng.integers(len(doc_sents[d])))))
            out.append(picks)
        return out

    retrieved = tfidf_override()
    variants = {
        "ground_truth": None,
        "tfidf_retrieval": retrieved,
        # top-3 sentences of the same retrieval (recall@3 == recall@5 here):
        # fewer hard negatives in the window, same evidence coverage
        "tfidf_retrieval_k3": [sents[:3] for sents in retrieved],
        # top-1: recall@1 is 0.995 on this corpus, so the evidence window is
        # the gold sentence 99.5% of the time in the gold TRAIN format
        # (1 title + 1 sentence) — isolates how much of the remaining
        # k3/k5 gap is the multi-sentence eval-format shift + val trap
        # rather than retrieval quality
        "tfidf_retrieval_k1": [sents[:1] for sents in retrieved],
        "claim_only": [[] for _ in dev_claims],
        "random_evidence": random_override(),
    }

    table = {}
    for name, override in variants.items():
        ex = build_examples(dev_claims, doc_sents, evidence_override=override)
        e_ids, e_mask, e_types, e_labels = encode_examples(
            ex, tok, args.max_length
        )
        preds = predict_in_batches(params, vcfg, e_ids, e_mask, e_types)
        rep = classification_report(e_labels, preds)
        table[name] = {
            "precision": round(rep["macro_precision"], 3),
            "recall": round(rep["macro_recall"], 3),
            "f1": round(rep["macro_f1"], 3),
            "accuracy": round(rep["accuracy"], 3),
        }

    print(json.dumps({"results": res, "table2": table}))

    lines = [
        MARK_BEGIN,
        "",
        "## Verdict F1 vs evidence source (report Table 2 analogue)",
        "",
        f"Synthetic 2-class corpus ({args.docs} docs, refute_fraction 0.4, "
        f"fact-slot cardinality {args.val_range}); "
        f"verdict transformer ({args.layers}L/{args.hidden}h, len "
        f"{args.max_length}) trained {args.epochs} epochs on gold evidence "
        f"(+ up to {args.train_distractors} format distractors, "
        f"{res['train_s']}s; best of {max(args.restarts, 1)} seed restarts "
        f"by val F1: {res.get('restart_val_f1s')}), evaluated on "
        f"{len(dev_claims)} dev claims "
        "with the evidence input swapped. The tfidf retrieval feeding the "
        "tfidf_retrieval row achieves sentence recall@1 "
        f"{res.get('tfidf_sentence_recall@1')} / recall@5 "
        f"{res.get('tfidf_sentence_recall@5')} on these dev claims:",
        "",
        "| evidence source | macro-P | macro-R | macro-F1 | accuracy |",
        "|---|---|---|---|---|",
    ]
    for name, row in table.items():
        lines.append(
            f"| {name} | {row['precision']} | {row['recall']} | "
            f"{row['f1']} | {row['accuracy']} |"
        )
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
