"""Batched TF-IDF document ranking on TPU.

API-equivalent to the reference ``TfidfDocRanker``
(``preprocessing/drqa/retriever/tfidf_doc_ranker.py``) but batch-first: the
reference ThreadPools per-query scipy matvecs; here all queries in a batch are
vectorized host-side (tokenize/hash/tf-idf weights) and scored in one jitted
ragged gather -> sort -> segment-sum -> top-k pipeline on device
(``ircl_tpu.ops.ragged``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ircl_tpu.corpus.fastpath import batch_vectorize
from ircl_tpu.index.build import CountIndex
from ircl_tpu.index.tfidf import idf_vector
from ircl_tpu.ops import ragged


def candidate_docs(
    index: CountIndex,
    queries: Sequence[str],
    bigram_only: bool = False,
) -> List[List[str]]:
    """Boolean candidate filtering: docs containing ANY query ngram.

    The reference's ``documents_filtering`` (``src/evaluation.py:57-84``):
    tokenize + hash the claim's 1..n-grams (optionally n>=2 only), take the
    posting union over those buckets, and return the matching doc ids. A
    recall-not-ranking primitive (its eval path sizes candidate sets before
    dense scoring); host-side — the posting walk is memory-bound and tiny
    next to device scoring.

    NOTE on the default: the reference *signature* defaults
    ``bigram_only=True`` (``src/evaluation.py:57``) but its one exercised
    call site passes ``False`` (``src/evaluation.py:101``); we default to
    the exercised behavior. Deliberate flip — not a parity bug.
    """
    from ircl_tpu.corpus.filters import filter_ngram, normalize
    from ircl_tpu.corpus.hashing import hash_token
    from ircl_tpu.corpus.tokenizer import default_tokenizer

    out: List[List[str]] = []
    tok = default_tokenizer()
    for q in queries:
        grams = tok.tokenize(normalize(q)).ngrams(
            n=index.ngram, uncased=True, filter_fn=filter_ngram
        )
        if bigram_only:
            grams = [g for g in grams if len(g.split()) > 1]
        docs: set = set()
        for w in {hash_token(g, index.hash_size) for g in grams}:
            s, e = int(index.indptr[w]), int(index.indptr[w + 1])
            docs.update(index.post_docs[s:e].tolist())
        out.append([index.doc_ids[d] for d in sorted(docs)])
    return out


def vectorize_queries(
    queries: Sequence[str],
    hash_size: int,
    ngram: int,
    doc_freqs: np.ndarray,
    num_docs: int,
    max_terms: Optional[int] = None,
    binary_tf: bool = False,
    idfs: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Queries -> padded (buckets [B, T], weights [B, T]).

    Weight semantics match reference ``text2spvec``
    (``tfidf_doc_ranker.py:92-126``): unique hashed ngrams, log1p(tf) * idf
    with clipped idf. ``binary_tf=True`` reproduces the reference's
    "BM25" ranker variant (``BM25_doc_ranker.py:110``: tf = 1 per present
    term). Empty queries produce all-zero rows (non-strict behavior).
    """
    if idfs is None:
        idfs = idf_vector(doc_freqs, num_docs)
    per_q = batch_vectorize(queries, hash_size, ngram)
    B = len(queries)
    lens = np.fromiter(
        (len(u) for u, _ in per_q), dtype=np.int64, count=B
    ) if B else np.empty(0, np.int64)
    T = max_terms or int(lens.max(initial=1)) or 1
    buckets = np.zeros((B, T), dtype=np.int32)
    weights = np.zeros((B, T), dtype=np.float32)
    if B and lens.sum():
        # Bulk run-expansion instead of a per-query Python loop (the loop
        # cost ~10ms per 2048-query batch; this is <2ms): concatenate every
        # query's (uniq, counts), compute all weights in one vectorized
        # pass, and scatter into the padded [B, T] arrays by (row, col)
        # where col = position within the query (truncated at T — same
        # first-T-sorted-terms semantics as the loop).
        all_u = np.concatenate([u for u, _ in per_q])
        all_c = np.concatenate([c for _, c in per_q])
        all_w = (
            idfs[all_u].astype(np.float32)
            if binary_tf
            else np.log1p(all_c.astype(np.float32)) * idfs[all_u]
        )
        rows = np.repeat(np.arange(B, dtype=np.int64), lens)
        offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
        cols = np.arange(len(all_u), dtype=np.int64) - offsets[rows]
        keep = cols < T
        buckets[rows[keep], cols[keep]] = all_u[keep].astype(np.int32)
        weights[rows[keep], cols[keep]] = all_w[keep].astype(np.float32)
    return buckets, weights


@dataclass
class DeviceIndex:
    """HBM-resident postings (jax arrays), plus host-side metadata."""

    indptr: jax.Array  # [H+1] int32
    post_docs: jax.Array  # [nnz] int32
    post_vals: jax.Array  # [nnz] f32
    hash_size: int
    ngram: int
    num_docs: int
    doc_ids: List[str]
    doc_freqs: np.ndarray  # host, used for query idf

    @classmethod
    def from_count_index(cls, index: CountIndex, device=None) -> "DeviceIndex":
        put = lambda x: jax.device_put(x, device)
        # int32 indptr suffices for nnz < 2^31; assert to be safe.
        assert index.nnz < 2**31 - 1
        return cls(
            indptr=put(index.indptr.astype(np.int32)),
            post_docs=put(index.post_docs),
            post_vals=put(index.post_vals),
            hash_size=index.hash_size,
            ngram=index.ngram,
            num_docs=index.num_docs,
            doc_ids=index.doc_ids,
            doc_freqs=index.doc_freqs.copy(),
        )


class TfidfRanker:
    """Batch top-k document ranking over a tf-idf weighted CountIndex.

    Two exact device scoring engines, selected by ``mode``:

    - ``"ell"`` (default for corpora that fit): doc-major membership-matmul
      (``ops/membership``) — dense compare + MXU, no gather/scatter/sort.
    - ``"hybrid"``: df-split engine (``index/split`` + ``ops/hybrid``) —
      heavy terms through a small membership slab, light (rare) terms through
      host-gathered posting pools, exact merge. Scales past ``ell`` because
      both the slab union and the per-doc width shrink to the heavy subset.
    - ``"ragged"``: term-major gather + sort + segment top-k (``ops/ragged``)
      — posting-mass proportional, kept for validation.
    - ``"auto"``: ell for small corpora, hybrid beyond.
    """

    # Bench-derived engine-selection crossovers (docs/DESIGN.md): below
    # ELL_MAX_DOCS the dense ELL slab wins; within FUSED_LIGHT_MAX_DOCS the
    # fused light-add kernel beats the staged bucketed merge. Both paths are
    # exact — parity at the boundaries is pinned by
    # tests/test_hybrid.py::test_engine_gate_boundaries.
    ELL_MAX_DOCS = 20_000
    FUSED_LIGHT_MAX_DOCS = 200_000

    def __init__(
        self,
        index: CountIndex,
        device=None,
        binary_tf: bool = False,
        mode: str = "auto",
        fixed_union_cap: Optional[int] = None,
        fixed_max_terms: Optional[int] = None,
        df_threshold="auto",  # int, or "auto": cost-model argmin from the
        #   df histogram + a synthesized query sample (index/autotune.py)
        autotune_profile: Optional[dict] = None,  # extra kwargs for
        #   auto_df_threshold (batch, query_sample, query_model, rates...) —
        #   pass the serving profile so the cost model is evaluated at the
        #   real batch size / query mix, not the default 1024 "occupied"
        precision: str = "highest",  # "default": bf16 scores matmul (ranking
        #                               holds; scores drift ~0.2% rel)
        width_buckets: int = 1,  # 2: width-bucketed heavy slab (less padding)
        d_tile: Optional[int] = None,  # doc-axis slab tile; None resolves to
        #   512 past the fused gate (slab time -25% at 1M, measured) and
        #   1024 below it (probe_slab_tiles: -16/-19% on the narrow/wide
        #   slab fills vs the round-2 256, exact output; the earlier
        #   "256 best at 50K" end-to-end read predates the lcm-1024 bucket
        #   padding and the light kernel's own tile)
        split=None,  # prebuilt SplitIndex (index/split.py::load_split) —
        #   serving cold-start skips the 15-26s (at 1M docs) df-split
        #   rebuild; must match the index (num_docs/hash_size checked) and
        #   overrides df_threshold with the split's own
        select_rescore: int = 0,  # staged bucketed engine only (>FUSED gate):
        #   >0 selects that many candidates/query from a 1-pass bf16 scores
        #   matmul and rescores them exactly (f32 slab-column contraction +
        #   compensated light totals) — halves the [B, N] HBM traffic that
        #   bounds the 1M path. Candidate selection is approximate
        #   (probe_bf16_select: true top-5 ⊆ bf16 top-16 on 4096/4096);
        #   verify with a parity gate where certainty matters (bench_scale
        #   gates every run). 16-32 are sensible values.
        union_round: Optional[int] = None,  # None: pow2 union padding (few
        #   compile-cache keys — the default). An int (multiple of 512, the
        #   slab u-tile): ceil the batch union to that multiple instead —
        #   a union just past a pow2 boundary then stops doubling the heavy
        #   contraction (e.g. 4100 live slots pad to 4608, not 8192; up to
        #   ~2x less slab+matmul work) at the cost of more distinct widths
        #   across batches, each a one-time compile. Best with pinned
        #   serving shapes where the width is stable anyway.
    ):
        if union_round is not None and (
            union_round <= 0 or union_round % 512
        ):
            raise ValueError(
                f"union_round must be a positive multiple of 512 (the slab "
                f"u-tile), got {union_round}"
            )
        self.union_round = union_round
        self.select_rescore = int(select_rescore)
        if self.select_rescore and width_buckets != 2:
            raise ValueError(
                "select_rescore requires the bucketed hybrid engine "
                "(width_buckets=2) — it would be silently ignored otherwise"
            )
        self.precision = precision
        # fixed_* pin the compiled shapes for serving: every batch reuses one
        # executable (stable persistent-cache keys across processes). Queries
        # with more unique terms than fixed_max_terms are truncated; a batch
        # union exceeding fixed_union_cap falls back to the next power of two
        # (one extra compile).
        self.fixed_union_cap = fixed_union_cap
        self.fixed_max_terms = fixed_max_terms
        if not index.weighted and not binary_tf:
            from ircl_tpu.index.tfidf import tfidf_transform

            index = tfidf_transform(index)
        self.dev = DeviceIndex.from_count_index(index, device)
        self.binary_tf = binary_tf
        self._max_df = index.max_doc_freq()
        self._idfs = idf_vector(index.doc_freqs, index.num_docs)
        if mode == "auto":
            mode = "ell" if index.num_docs <= self.ELL_MAX_DOCS else "hybrid"
        self.mode = mode
        if d_tile is None:
            d_tile = (
                512
                if mode == "hybrid"
                and index.num_docs > self.FUSED_LIGHT_MAX_DOCS
                else 1024
            )
        self.d_tile = d_tile
        self._ell_terms = self._ell_vals = None
        self._ell_terms_t = self._ell_vals_t = None
        self._split = None
        self._bucketed = None
        if mode == "hybrid":
            from ircl_tpu.index.split import bucket_heavy, split_index
            from ircl_tpu.ops.membership_pallas import pad_for_slab

            if split is not None:
                if (
                    split.num_docs != index.num_docs
                    or split.hash_size != index.hash_size
                ):
                    raise ValueError(
                        f"prebuilt split does not match the index: "
                        f"docs {split.num_docs} vs {index.num_docs}, "
                        f"hash {split.hash_size} vs {index.hash_size}"
                    )
                df_threshold = split.df_threshold
            elif df_threshold == "auto":
                from ircl_tpu.index.autotune import auto_df_threshold

                kw = dict(
                    max_terms=fixed_max_terms or 24,
                    # mirror the serving pads (autotune's contract)
                    union_floor=fixed_union_cap or 512,
                    union_round=union_round,
                )
                kw.update(autotune_profile or {})
                df_threshold = auto_df_threshold(index, **kw)
            self.df_threshold = df_threshold
            self._split = (
                split
                if split is not None
                else split_index(index, df_threshold=df_threshold)
            )
            put = lambda x: jax.device_put(x, device)
            if width_buckets == 2:
                # lcm(d_tile, 1024): the fused light path picks the largest
                # doc tile (1024/512/256) dividing the padded doc count, and
                # 1024 is worth ~1.7x on that kernel (probe_light_tiles) —
                # cheap insurance for the staged path too (<=2046 extra pad
                # docs, ~0.2% matmul flops at 1M). The bucket cut MUST use
                # the same tile as pad_for_slab below — old2pos encodes
                # bucket_b's concat offset as na_pad, and a mismatched pad
                # silently shifts every bucket_b doc id (caught as a 1/32
                # top-5 corruption at 1M, d_tile=512).
                pad_tile = math.lcm(d_tile, 1024)
                bk = bucket_heavy(self._split.heavy, d_tile=pad_tile)
                self._bucketed = bk
                ta, va = pad_for_slab(
                    np.ascontiguousarray(bk.ell_a.terms.T),
                    np.ascontiguousarray(bk.ell_a.vals.T),
                    d_tile=pad_tile,
                )
                tb, vb = pad_for_slab(
                    np.ascontiguousarray(bk.ell_b.terms.T),
                    np.ascontiguousarray(bk.ell_b.vals.T),
                    d_tile=pad_tile,
                )
                self._heavy_a = (put(ta), put(va))
                self._heavy_b = (put(tb), put(vb))
            else:
                tt, vt = pad_for_slab(
                    np.ascontiguousarray(self._split.heavy.terms.T),
                    np.ascontiguousarray(self._split.heavy.vals.T),
                    d_tile=math.lcm(d_tile, 256),
                )
                self._heavy_terms_t = put(tt)
                self._heavy_vals_t = put(vt)
        if mode == "ell":
            from ircl_tpu.index.ell import to_ell

            ell = to_ell(index)
            put = lambda x: jax.device_put(x, device)
            self._ell_terms = put(ell.terms)
            self._ell_vals = put(ell.vals)
            # K-major, tile-padded copies for the fused Pallas scorer
            # (dynamic k index must land on the sublane axis).
            from ircl_tpu.ops.membership_pallas import pad_for_slab

            tt, vt = pad_for_slab(
                np.ascontiguousarray(ell.terms.T),
                np.ascontiguousarray(ell.vals.T),
                d_tile=256,
            )
            self._ell_terms_t = put(tt)
            self._ell_vals_t = put(vt)

    def get_doc_id(self, doc_index: int) -> str:
        return self.dev.doc_ids[doc_index]

    def _vectorize(self, queries: Sequence[str]):
        return vectorize_queries(
            queries,
            self.dev.hash_size,
            self.dev.ngram,
            self.dev.doc_freqs,
            self.dev.num_docs,
            max_terms=self.fixed_max_terms,
            binary_tf=self.binary_tf,
            idfs=self._idfs,
        )

    @staticmethod
    def _pow2(n: int, floor: int = 16) -> int:
        # Canonical implementation lives in index/autotune.py — the cost
        # model's u_pad/p_pad must mirror this bucketing exactly.
        from ircl_tpu.index.autotune import _pow2

        return _pow2(n, floor)

    def _union_slots(
        self, buckets: np.ndarray, weights: np.ndarray, floor: int = 16
    ) -> np.ndarray:
        """Sorted union of the batch's live buckets, sentinel-padded to a
        power-of-two width (static-shape bucketing)."""
        nz = weights != 0.0
        u = np.unique(buckets[nz]) if nz.any() else np.empty(0, np.int64)
        if self.union_round is not None:
            # ceil(max(live, floor)) to a multiple of union_round — the
            # floor itself is rounded too so a non-multiple fixed_union_cap
            # can't produce a width the u-tiled kernels reject
            r = self.union_round
            u_cap = -(-max(len(u), floor, 1) // r) * r
        else:
            u_cap = self._pow2(max(len(u), 1), floor=floor)
        sentinel = np.int32(min(self.dev.hash_size, 2**31 - 1))
        u_pad = np.full(u_cap, sentinel, dtype=np.int32)
        u_pad[: len(u)] = u.astype(np.int32)
        return u_pad

    def _closest_ell_async(self, queries: Sequence[str], k: int):
        """Dispatch ELL scoring; returns device arrays (no sync). Callers can
        pipeline batches and block once at the end."""
        from ircl_tpu.ops.membership_pallas import (
            membership_topk_fused,
            pad_for_slab,
        )

        buckets, weights = self._vectorize(queries)
        u_pad = self._union_slots(
            buckets, weights, floor=self.fixed_union_cap or 512
        )
        qb_t, qw_t = pad_for_slab(
            np.ascontiguousarray(buckets.T.astype(np.int32)),
            np.ascontiguousarray(weights.T),
            d_tile=128,
        )
        interpret = jax.default_backend() == "cpu"
        return membership_topk_fused(
            self._ell_terms_t,
            self._ell_vals_t,
            jnp.asarray(u_pad),
            jnp.asarray(qb_t),
            jnp.asarray(qw_t),
            k=k,
            num_real_docs=self.dev.num_docs,
            interpret=interpret,
        )

    def _closest_ell(self, queries: Sequence[str], k: int):
        scores, doc_idx = self._closest_ell_async(queries, k)
        b = len(queries)
        return np.asarray(scores)[:b], np.asarray(doc_idx)[:b]

    def _closest_hybrid_async(self, queries: Sequence[str], k: int):
        buckets, weights = self._vectorize(queries)
        return self.hybrid_from_vectors_async(buckets, weights, k)

    def hybrid_from_vectors_async(
        self, buckets: np.ndarray, weights: np.ndarray, k: int
    ):
        """Hybrid scoring from prebuilt query vectors ([B, T] buckets +
        weights); returns device arrays (no sync)."""
        from ircl_tpu.index.split import gather_light_pools
        from ircl_tpu.ops.hybrid import (
            hybrid_topk,
            hybrid_topk_bucketed_fused,
        )
        from ircl_tpu.ops.membership_pallas import pad_for_slab
        heavy_q = self._split.doc_freqs[buckets] > self._split.df_threshold
        hw = np.where(heavy_q, weights, 0.0).astype(np.float32)
        u_pad = self._union_slots(
            buckets, hw, floor=self.fixed_union_cap or 512
        )
        # Per-query ascending term sort (pads trailing) lets the query slab
        # use the value-range windowed kernel — same ~n_ut-fold compare cut
        # the doc side gets. Term order within a query is irrelevant to the
        # scores (the slab sums over terms).
        key = np.where(hw != 0.0, buckets, np.int32(2**31 - 1))
        order = np.argsort(key, axis=1, kind="stable")
        sb = np.take_along_axis(buckets, order, axis=1).astype(np.int32)
        sw = np.take_along_axis(hw, order, axis=1)
        sb = np.where(sw != 0.0, sb, -1)
        qb_t, qw_t = pad_for_slab(
            np.ascontiguousarray(sb.T),
            np.ascontiguousarray(sw.T),
            d_tile=128,
        )
        interpret = jax.default_backend() == "cpu"
        if self._bucketed is not None:
            # Pools remapped to the permuted doc space and doc-sorted in one
            # C++ pass (cheaper than a device argsort; the fused kernel's
            # window bounds need ascending pools anyway). Pads carry an
            # out-of-range position, so no d-tile window ever touches them.
            ld, lc, _ = gather_light_pools(
                self._split,
                buckets,
                weights,
                old2pos=self._bucketed.old2pos,
                sort_pools=True,
                pad_doc=len(self._bucketed.pos2old),
            )
            # Round 3 made pool blocks VMEM-resident across the doc sweep
            # (light_add grid is batch-outer now); the 200K gate is retained
            # until sweep_df re-measures the crossover on hardware.
            # select_rescore lives in the staged engine (the fused kernel
            # never materializes the score matrix the option is about), so
            # it forces the staged path — mostly so small-corpus tests can
            # exercise the exact serving code.
            if (
                self.dev.num_docs <= self.FUSED_LIGHT_MAX_DOCS
                and not self.select_rescore
            ):
                return hybrid_topk_bucketed_fused(
                    *self._heavy_a,
                    *self._heavy_b,
                    jnp.asarray(u_pad),
                    jnp.asarray(qb_t),
                    jnp.asarray(qw_t),
                    jnp.asarray(ld),
                    jnp.asarray(lc),
                    k=k,
                    interpret=interpret,
                    precision=self.precision,
                    queries_sorted=True,
                    pools_sorted=True,
                    d_tile=self.d_tile,
                )
            # Past the fused-light gate the staged engine wins: Mosaic runs
            # the (u_tile, d_tile)-gridded slab ~4x faster than a one-cell-
            # does-everything fused kernel (see docs/DESIGN.md "one-pass
            # kernel" negative result), and at these unions the HBM
            # round-trips it saves are minor.
            from ircl_tpu.ops.hybrid import hybrid_topk_bucketed

            return hybrid_topk_bucketed(
                *self._heavy_a,
                *self._heavy_b,
                jnp.asarray(u_pad),
                jnp.asarray(qb_t),
                jnp.asarray(qw_t),
                jnp.asarray(ld),
                jnp.asarray(lc),
                k=k,
                interpret=interpret,
                precision=self.precision,
                queries_sorted=True,
                pools_sorted=True,  # C++ gather already sorted permuted pools
                d_tile=self.d_tile,
                select_rescore=self.select_rescore,
            )
        light_docs, light_contribs, _ = gather_light_pools(
            self._split, buckets, weights
        )
        return hybrid_topk(
            self._heavy_terms_t,
            self._heavy_vals_t,
            jnp.asarray(u_pad),
            jnp.asarray(qb_t),
            jnp.asarray(qw_t),
            jnp.asarray(light_docs),
            jnp.asarray(light_contribs),
            k=k,
            num_real_docs=self.dev.num_docs,
            d_tile=self.d_tile,
            interpret=interpret,
            precision=self.precision,
            queries_sorted=True,
        )

    def _closest_hybrid(self, queries: Sequence[str], k: int):
        return self._finish_hybrid(
            self._closest_hybrid_async(queries, k), len(queries)
        )

    def hybrid_from_vectors(
        self, buckets: np.ndarray, weights: np.ndarray, k: int
    ):
        """Sync hybrid top-k from prebuilt query vectors: (scores [B, k],
        doc indices [B, k], -1 padded)."""
        return self._finish_hybrid(
            self.hybrid_from_vectors_async(buckets, weights, k), len(buckets)
        )

    def _finish_hybrid(self, pending, b: int):
        scores, doc_idx = pending
        scores = np.asarray(scores)[:b]
        doc_idx = np.asarray(doc_idx)[:b]
        if self._bucketed is not None:
            # permuted-space positions -> original doc ids
            valid = doc_idx >= 0
            doc_idx = np.where(
                valid, self._bucketed.pos2old[np.maximum(doc_idx, 0)], -1
            )
        return scores, doc_idx

    def finalize_closest(
        self, pending, n: int
    ) -> List[Tuple[List[str], np.ndarray]]:
        """Turn a pending async result (from ``_closest_hybrid_async`` /
        ``_closest_ell_async``) into ``closest_docs_batch``'s output format.
        Lets callers overlap host work with the device dispatch and settle
        later (bench.py computes its scipy parity reference while the first
        batch compiles)."""
        if self.mode == "hybrid":
            scores, doc_idx = self._finish_hybrid(pending, n)
        else:
            scores, doc_idx = pending
            scores = np.asarray(scores)[:n]
            doc_idx = np.asarray(doc_idx)[:n]
        out = []
        for b in range(n):
            keep = doc_idx[b] >= 0
            ids = [self.dev.doc_ids[i] for i in doc_idx[b][keep]]
            out.append((ids, scores[b][keep]))
        return out

    def closest_docs_batch(
        self, queries: Sequence[str], k: int = 5
    ) -> List[Tuple[List[str], np.ndarray]]:
        """Top-k (doc_ids, scores) per query. Exact w.r.t. the sparse matvec."""
        if self.mode in ("ell", "hybrid"):
            if self.mode == "ell":
                pending = self._closest_ell_async(queries, k)
            else:
                pending = self._closest_hybrid_async(queries, k)
            return self.finalize_closest(pending, len(queries))
        docs, contribs, nnz_cap = self._gather_ragged(queries)
        scores, doc_idx = ragged.segment_topk(docs, contribs, k=min(k, max(1, nnz_cap)))
        scores = np.asarray(scores)
        doc_idx = np.asarray(doc_idx)

        out = []
        for b in range(len(queries)):
            keep = doc_idx[b] >= 0
            ids = [self.dev.doc_ids[i] for i in doc_idx[b][keep]]
            out.append((ids, scores[b][keep]))
        return out

    def closest_docs(self, query: str, k: int = 5) -> Tuple[List[str], np.ndarray]:
        return self.closest_docs_batch([query], k)[0]

    def _gather_ragged(self, queries: Sequence[str]):
        """vectorize -> posting bound -> nnz cap -> gathered (docs,
        contribs): the ONE copy shared by the ragged top-k path and the
        dense validation scorer it is parity-checked against."""
        buckets, weights = self._vectorize(queries)
        total_posting_bound = int(
            np.sum(
                np.where(
                    weights != 0.0,
                    self.dev.doc_freqs[buckets].astype(np.int64),
                    0,
                ),
                axis=1,
            ).max()
            if len(queries)
            else 1
        )
        nnz_cap = ragged.choose_nnz_cap(max(total_posting_bound, 1))
        docs, contribs, _ = ragged.gather_postings(
            self.dev.indptr,
            self.dev.post_docs,
            self.dev.post_vals,
            jnp.asarray(buckets),
            jnp.asarray(weights),
            nnz_cap=nnz_cap,
        )
        return docs, contribs, nnz_cap

    def dense_scores_batch(self, queries: Sequence[str]) -> np.ndarray:
        """Full [B, num_docs] score matrix (validation / small corpora)."""
        docs, contribs, _ = self._gather_ragged(queries)
        return np.asarray(
            ragged.dense_scores(docs, contribs, num_docs=self.dev.num_docs)
        )
