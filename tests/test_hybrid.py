"""Hybrid heavy/light scorer: exactness vs the full-slab ELL path."""

import numpy as np
import pytest

from ircl_tpu.corpus.store import MemoryDocStore
from ircl_tpu.corpus.synthetic import generate
from ircl_tpu.index.build import build_count_index, to_scipy
from ircl_tpu.index.ranker import TfidfRanker
from ircl_tpu.index.split import gather_light_pools, split_index
from ircl_tpu.index.tfidf import tfidf_transform

HASH_SIZE = 2**20


@pytest.fixture(scope="module")
def setup():
    wiki = generate(num_docs=150, num_claims=50, seed=13)
    store = MemoryDocStore({d: rec["text"] for d, rec in wiki.docs.items()})
    index = tfidf_transform(build_count_index(store, ngram=2, hash_size=HASH_SIZE))
    claims = [c.claim for c in wiki.claims]
    return index, claims


@pytest.mark.parametrize("threshold", [4, 16, 64])
def test_split_partitions_postings(setup, threshold):
    index, _ = setup
    split = split_index(index, df_threshold=threshold)
    total_heavy = int((split.heavy.terms >= 0).sum())
    total_light = len(split.light_docs)
    assert total_heavy + total_light == index.nnz
    # light rows only contain terms with df <= threshold
    light_lens = np.diff(split.light_indptr)
    assert light_lens.max(initial=0) <= threshold


def test_light_pool_gather_matches_csr(setup):
    index, claims = setup
    split = split_index(index, df_threshold=8)
    ranker = TfidfRanker(index, mode="ragged")
    buckets, weights = ranker._vectorize(claims)
    docs, contribs, nnz = gather_light_pools(split, buckets, weights)

    mat = to_scipy(index)
    for b in range(5):
        # reconstruct light contribution vector densely
        dense = np.zeros(index.num_docs, np.float64)
        for t in range(buckets.shape[1]):
            w = weights[b, t]
            term = buckets[b, t]
            if w == 0 or index.doc_freqs[term] > 8:
                continue
            row = mat.getrow(term)
            dense[row.indices] += w * row.data
        pool = np.zeros(index.num_docs, np.float64)
        valid = docs[b] < index.num_docs
        np.add.at(pool, docs[b][valid], contribs[b][valid])
        np.testing.assert_allclose(pool, dense, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("threshold", [4, 16])
def test_onepass_matches_staged(setup, threshold):
    """The one-pass fused kernel (no materialized slab/scores) returns the
    same top-k as the staged bucketed engine and the ragged validator."""
    import jax.numpy as jnp

    from ircl_tpu.index.split import gather_light_pools
    from ircl_tpu.ops.fused_hybrid_pallas import hybrid_topk_onepass
    from ircl_tpu.ops.membership_pallas import pad_for_slab

    index, claims = setup
    ref = TfidfRanker(index, mode="ragged")
    hyb = TfidfRanker(
        index, mode="hybrid", df_threshold=threshold, width_buckets=2
    )
    buckets, weights = hyb._vectorize(claims)
    heavy_q = hyb._split.doc_freqs[buckets] > threshold
    hw = np.where(heavy_q, weights, 0.0).astype(np.float32)
    u_pad = hyb._union_slots(buckets, hw, floor=512)
    key = np.where(hw != 0.0, buckets, np.int32(2**31 - 1))
    order = np.argsort(key, axis=1, kind="stable")
    sb = np.take_along_axis(buckets, order, axis=1).astype(np.int32)
    sw = np.take_along_axis(hw, order, axis=1)
    sb = np.where(sw != 0.0, sb, -1)
    qb_t, qw_t = pad_for_slab(
        np.ascontiguousarray(sb.T), np.ascontiguousarray(sw.T), d_tile=128
    )
    n_pad = len(hyb._bucketed.pos2old)
    ld, lc, _ = gather_light_pools(
        hyb._split, buckets, weights,
        old2pos=hyb._bucketed.old2pos, sort_pools=True, pad_doc=n_pad,
    )
    s1, i1 = hybrid_topk_onepass(
        *hyb._heavy_a, *hyb._heavy_b,
        jnp.asarray(u_pad), jnp.asarray(qb_t), jnp.asarray(qw_t),
        jnp.asarray(ld), jnp.asarray(lc),
        k=5, d_tile=256, b_tile=128, interpret=True,
    )
    s1, i1 = np.asarray(s1), np.asarray(i1)
    # map permuted positions back to doc ids
    i1 = np.where(i1 >= 0, hyb._bucketed.pos2old[np.maximum(i1, 0)], -1)

    got_ref = ref.closest_docs_batch(claims, k=5)
    got_hyb = hyb.closest_docs_batch(claims, k=5)
    doc2idx = {d: ix for ix, d in enumerate(index.doc_ids)}
    for b, ((ids_r, sc_r), (ids_h, sc_h)) in enumerate(zip(got_ref, got_hyb)):
        keep = i1[b] >= 0
        np.testing.assert_allclose(
            np.sort(s1[b][keep]), np.sort(sc_r), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(np.sort(sc_h), np.sort(sc_r), rtol=1e-5)
        # ids match for every doc strictly above the k-th score (ties at the
        # cut are legitimately engine-dependent)
        cut = float(np.min(sc_r)) * (1 + 1e-4) + 1e-4
        got = {int(d) for d, s in zip(i1[b][keep], s1[b][keep]) if s > cut}
        want = {doc2idx[d] for d, s in zip(ids_r, sc_r) if s > cut}
        assert got == want


def test_light_pool_native_matches_numpy(setup):
    """C++ fused gather (remap + sort + pad) vs the numpy fallback, and both
    option combinations produce identical pools."""
    from ircl_tpu.index.split import (
        _gather_light_pools_np,
        _native_light_lib,
        bucket_heavy,
    )

    if _native_light_lib() is None:
        pytest.skip("native lib unavailable")
    index, claims = setup
    split = split_index(index, df_threshold=8)
    bk = bucket_heavy(split.heavy)
    ranker = TfidfRanker(index, mode="ragged")
    buckets, weights = ranker._vectorize(claims)

    for kwargs in (
        {},
        {"sort_pools": True},
        {"old2pos": bk.old2pos, "sort_pools": True, "pad_doc": len(bk.pos2old)},
    ):
        d1, c1, n1 = gather_light_pools(split, buckets, weights, **kwargs)
        d2, c2, n2 = _gather_light_pools_np(
            split,
            buckets.astype(np.int32),
            weights.astype(np.float32),
            128,
            kwargs.get("old2pos"),
            kwargs.get("sort_pools", False),
            kwargs.get("pad_doc", split.num_docs),
        )
        assert n1 == n2
        np.testing.assert_array_equal(d1, d2)
        np.testing.assert_allclose(c1, c2, rtol=1e-6)


@pytest.mark.parametrize("threshold", [2, 8, 32])
def test_hybrid_topk_matches_ell(setup, threshold):
    index, claims = setup
    r_ell = TfidfRanker(index, mode="ell")
    r_hyb = TfidfRanker(index, mode="hybrid", df_threshold=threshold)
    out_e = r_ell.closest_docs_batch(claims, k=5)
    out_h = r_hyb.closest_docs_batch(claims, k=5)
    for qi, ((ids_e, s_e), (ids_h, s_h)) in enumerate(zip(out_e, out_h)):
        assert len(ids_e) == len(ids_h), f"query {qi}"
        np.testing.assert_allclose(s_h, s_e, rtol=1e-4, atol=1e-6)
        assert set(ids_h) == set(ids_e) or np.allclose(
            sorted(s_h), sorted(s_e), rtol=1e-4
        )


def test_auto_mode_selects_hybrid_for_large_corpus(setup):
    index, _ = setup
    old = TfidfRanker.ELL_MAX_DOCS
    try:
        TfidfRanker.ELL_MAX_DOCS = 10
        assert TfidfRanker(index).mode == "hybrid"
    finally:
        TfidfRanker.ELL_MAX_DOCS = old


@pytest.mark.parametrize("threshold", [4, 16])
def test_bucketed_hybrid_matches_ell(setup, threshold):
    index, claims = setup
    r_ell = TfidfRanker(index, mode="ell")
    r_bk = TfidfRanker(
        index, mode="hybrid", df_threshold=threshold, width_buckets=2
    )
    out_e = r_ell.closest_docs_batch(claims, k=5)
    out_b = r_bk.closest_docs_batch(claims, k=5)
    for qi, ((ids_e, s_e), (ids_b, s_b)) in enumerate(zip(out_e, out_b)):
        assert len(ids_e) == len(ids_b), f"query {qi}"
        np.testing.assert_allclose(s_b, s_e, rtol=1e-4, atol=1e-6)
        assert set(ids_b) == set(ids_e) or np.allclose(
            sorted(s_b), sorted(s_e), rtol=1e-4
        )


def test_bucket_heavy_partition(setup):
    from ircl_tpu.index.split import bucket_heavy, split_index

    index, _ = setup
    split = split_index(index, df_threshold=8)
    bk = bucket_heavy(split.heavy)
    n = split.heavy.num_docs
    # every doc appears exactly once across buckets
    old = bk.pos2old[bk.pos2old >= 0]
    assert sorted(old.tolist()) == list(range(n))
    # old2pos inverts pos2old
    for o in old[:50]:
        assert bk.pos2old[bk.old2pos[o]] == o
    # narrow bucket width <= wide bucket width
    assert bk.ell_a.k_width <= max(bk.ell_b.k_width, bk.ell_a.k_width)


def test_engine_gate_boundaries(setup):
    """Parity holds on BOTH sides of each engine-selection constant.

    The crossovers (ELL_MAX_DOCS, FUSED_LIGHT_MAX_DOCS) are bench-derived;
    this pins that they are pure performance switches — scores and doc sets
    are identical at num_docs == gate and num_docs == gate + 1, i.e. the
    engine picked just below and just above every boundary agrees with a
    scipy-checked baseline.
    """
    import scipy.sparse as sp

    from ircl_tpu.index.build import to_scipy
    from ircl_tpu.index.ranker import vectorize_queries

    index, claims = setup
    n = index.num_docs
    claims = claims[:16]

    # CPU reference scores for the claims (exact, full corpus)
    mat = to_scipy(index)
    buckets, weights = vectorize_queries(
        claims, index.hash_size, index.ngram, index.doc_freqs, index.num_docs
    )

    def cpu_topk(b, k=5):
        nz = weights[b] != 0
        spvec = sp.csr_matrix(
            (weights[b][nz], buckets[b][nz], [0, int(nz.sum())]),
            shape=(1, index.hash_size),
        )
        res = spvec * mat
        o = np.argsort(-res.data)[:k]
        dense = np.asarray(res.todense()).ravel()
        return set(res.indices[o]), np.sort(res.data[o])[::-1], dense

    refs = [cpu_topk(b) for b in range(len(claims))]

    def check(ranker):
        doc2idx = {d: i for i, d in enumerate(index.doc_ids)}
        for b, (ids, scores) in enumerate(
            ranker.closest_docs_batch(claims, k=5)
        ):
            ref_ids, ref_scores, ref_dense = refs[b]
            m = min(len(ref_scores), len(scores))
            np.testing.assert_allclose(
                scores[:m], ref_scores[:m], rtol=1e-4, atol=1e-6
            )
            # Each returned doc id must carry ITS OWN exact CPU score —
            # catches doc-id permutation bugs (e.g. the bucket-offset one)
            # even under tied scores, where set comparison would be lax.
            for did, s in zip(ids, scores):
                np.testing.assert_allclose(
                    s, ref_dense[doc2idx[did]], rtol=1e-4, atol=1e-6
                )

    saved = (TfidfRanker.ELL_MAX_DOCS, TfidfRanker.FUSED_LIGHT_MAX_DOCS)
    try:
        # -- ELL_MAX_DOCS boundary: auto picks ell at n, hybrid at n - 1 ----
        TfidfRanker.ELL_MAX_DOCS = n
        r = TfidfRanker(index)
        assert r.mode == "ell"
        check(r)
        TfidfRanker.ELL_MAX_DOCS = n - 1
        r = TfidfRanker(index, df_threshold=8)
        assert r.mode == "hybrid"
        check(r)

        # -- FUSED_LIGHT_MAX_DOCS boundary (bucketed hybrid light path) ----
        TfidfRanker.ELL_MAX_DOCS = 1  # force hybrid via auto
        TfidfRanker.FUSED_LIGHT_MAX_DOCS = n  # fused light-add engine
        check(TfidfRanker(index, df_threshold=8, width_buckets=2))
        TfidfRanker.FUSED_LIGHT_MAX_DOCS = n - 1  # staged bucketed engine
        check(TfidfRanker(index, df_threshold=8, width_buckets=2))

        # -- staged bucketed engine with the two-phase heavy top-k forced on
        # (the 1M serving combination: two-phase + pools_sorted + bucket
        # permutation) — exact scores per returned doc id vs scipy.
        from ircl_tpu.ops import hybrid as hy

        saved_tp = hy._TWOPHASE_MIN
        try:
            hy._TWOPHASE_MIN = 1
            # the global is read at TRACE time: drop any cached executable
            # compiled with the flat top-k so the forced value takes effect
            hy.hybrid_topk_bucketed.clear_cache()
            check(TfidfRanker(index, df_threshold=8, width_buckets=2))
        finally:
            hy._TWOPHASE_MIN = saved_tp
            hy.hybrid_topk_bucketed.clear_cache()
    finally:
        TfidfRanker.ELL_MAX_DOCS, TfidfRanker.FUSED_LIGHT_MAX_DOCS = saved


def test_topk_wide_blocked_matches_flat():
    """Blocked two-stage top-k == flat top-k, including index tie-breaks."""
    import jax
    import jax.numpy as jnp

    from ircl_tpu.ops import hybrid as hy

    rng = np.random.default_rng(3)
    # repeated values force tie-break coverage
    h = rng.integers(0, 50, size=(7, 3000)).astype(np.float32)
    ref_s, ref_i = jax.lax.top_k(jnp.asarray(h), 5)
    saved = hy._TOPK_BLK
    try:
        hy._TOPK_BLK = 256  # force the blocked path at this width
        got_s, got_i = hy._topk_wide(jnp.asarray(h), 5)
    finally:
        hy._TOPK_BLK = saved
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))


def test_topk_twophase_matches_flat():
    """Chunk-max two-phase top-k == flat top-k on scores (indices may
    tie-break differently; with distinct scores they match exactly)."""
    import jax
    import jax.numpy as jnp

    from ircl_tpu.ops import hybrid as hy

    rng = np.random.default_rng(7)
    # distinct scores -> indices must match too
    h = rng.permutation(3200 * 7).reshape(7, 3200).astype(np.float32)
    ref_s, ref_i = jax.lax.top_k(jnp.asarray(h), 5)
    got_s, got_i = hy._topk_twophase(jnp.asarray(h), 5)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))
    # tied scores: top-k SET of scores still exact
    ht = rng.integers(0, 40, size=(5, 640)).astype(np.float32)
    ref_s2, _ = jax.lax.top_k(jnp.asarray(ht), 5)
    got_s2, got_i2 = hy._topk_twophase(jnp.asarray(ht), 5)
    np.testing.assert_allclose(np.asarray(got_s2), np.asarray(ref_s2))
    # returned indices score what they claim
    for b in range(5):
        for r in range(5):
            assert ht[b, int(np.asarray(got_i2)[b, r])] == np.asarray(got_s2)[b, r]
    # width not a chunk multiple falls back to flat
    ho = rng.normal(size=(3, 3001)).astype(np.float32)
    fs, fi = hy._topk_twophase(jnp.asarray(ho), 4)
    rs, ri = jax.lax.top_k(jnp.asarray(ho), 4)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(rs))
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(ri))


def test_merge_light_twophase_path_matches_scipy_reference():
    """_merge_light with the two-phase heavy top-k forced on == the flat
    path (scores exact; doc sets equal under distinct scores)."""
    import jax.numpy as jnp

    from ircl_tpu.ops import hybrid as hy

    rng = np.random.default_rng(11)
    B, N, P, k = 6, 1024, 16, 5
    h = np.abs(rng.normal(size=(B, N))).astype(np.float32)
    docs = rng.integers(0, N, size=(B, P)).astype(np.int32)
    contribs = np.abs(rng.normal(size=(B, P))).astype(np.float32)
    ref = hy._merge_light(
        jnp.asarray(h), jnp.asarray(docs), jnp.asarray(contribs), k, N
    )
    saved = hy._TWOPHASE_MIN
    try:
        hy._TWOPHASE_MIN = 1  # force two-phase at this width
        got = hy._merge_light(
            jnp.asarray(h), jnp.asarray(docs), jnp.asarray(contribs), k, N
        )
    finally:
        hy._TWOPHASE_MIN = saved
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), rtol=1e-6)
    for b in range(B):
        assert set(np.asarray(got[1])[b].tolist()) == set(
            np.asarray(ref[1])[b].tolist()
        )


def test_d_tile_512_matches_default():
    """d_tile is a pure performance knob: staged hybrid results are identical
    at d_tile=512 and 256, including when the width-bucket cut is live.

    Guards the bucket_b concat-offset bug: old2pos encodes bucket_b's start
    as na_pad, so the bucket cut and pad_for_slab MUST use the same tile —
    a mismatch silently shifts every wide-bucket doc id (found as a 1/32
    top-5 corruption at 1M docs when d_tile=512 was introduced).
    """
    import scipy.sparse as sp

    from ircl_tpu.index.build import assemble_csr
    from ircl_tpu.index.tfidf import idf_vector, tfidf_transform

    rng = np.random.default_rng(2)
    HASH = 1 << 16
    vocab = rng.choice(HASH, size=2000, replace=False).astype(np.int64)
    rows, cols, vals = [], [], []
    NUM = 4096
    for d in range(NUM):
        w = 40 if d % 8 == 0 else 6  # width-skewed: forces a real bucket cut
        terms = rng.choice(vocab, size=w, replace=False)
        rows.extend(terms.tolist())
        cols.extend([d] * w)
        vals.extend([1] * w)
    index = tfidf_transform(
        assemble_csr(
            np.asarray(rows), np.asarray(cols, np.int32),
            np.asarray(vals, np.int32), HASH, 2,
            [str(i) for i in range(NUM)],
        )
    )

    B = 16
    qb = vocab[rng.integers(0, len(vocab), size=(B, 12))].astype(np.int32)
    idfs = idf_vector(index.doc_freqs, index.num_docs)
    qw = (np.log1p(1.0) * idfs[qb]).astype(np.float32)

    mat = to_scipy(index)
    saved = (TfidfRanker.ELL_MAX_DOCS, TfidfRanker.FUSED_LIGHT_MAX_DOCS)
    try:
        TfidfRanker.ELL_MAX_DOCS = 1
        TfidfRanker.FUSED_LIGHT_MAX_DOCS = 1  # force the staged engine
        outs = {}
        for dt in (256, 512):
            r = TfidfRanker(
                index, df_threshold=4, width_buckets=2, d_tile=dt
            )
            assert r._bucketed.ell_b.terms.shape[0] > 0  # cut is live
            assert len(r._bucketed.pos2old) % dt == 0
            outs[dt] = r.hybrid_from_vectors(qb, qw, 5)
    finally:
        TfidfRanker.ELL_MAX_DOCS, TfidfRanker.FUSED_LIGHT_MAX_DOCS = saved

    for b in range(B):
        nzq = qw[b] != 0
        spvec = sp.csr_matrix(
            (qw[b][nzq], qb[b][nzq], [0, int(nzq.sum())]), shape=(1, HASH)
        )
        ref = (spvec * mat).toarray().ravel()
        expect = np.sort(ref)[::-1][:5]
        for dt in (256, 512):
            s, i = outs[dt]
            n = int((i[b] >= 0).sum())
            np.testing.assert_allclose(
                np.sort(s[b][:n])[::-1], expect[:n], rtol=1e-4, atol=1e-6,
                err_msg=f"query {b} d_tile={dt}",
            )


def test_d_tile_default_resolution(setup):
    """d_tile=None resolves to 512 past the fused gate, 1024 below it
    (round-3 probes: 1024 slab fill -16/-19%, light kernel -40%)."""
    index, _ = setup
    saved = (TfidfRanker.ELL_MAX_DOCS, TfidfRanker.FUSED_LIGHT_MAX_DOCS)
    try:
        TfidfRanker.ELL_MAX_DOCS = 1
        TfidfRanker.FUSED_LIGHT_MAX_DOCS = 10_000  # fixture is below
        assert TfidfRanker(index, df_threshold=8).d_tile == 1024
        TfidfRanker.FUSED_LIGHT_MAX_DOCS = 10  # fixture is above
        assert TfidfRanker(index, df_threshold=8).d_tile == 512
        assert TfidfRanker(index, df_threshold=8, d_tile=256).d_tile == 256
    finally:
        TfidfRanker.ELL_MAX_DOCS, TfidfRanker.FUSED_LIGHT_MAX_DOCS = saved


def test_merge_light_tiny_run_survives_large_prefix():
    """Adversarial cancellation: a doc whose light total is below the f32
    ulp of the accumulated pool prefix must still be returned with its
    (near-)exact total — the compensated double-float prefix scan in
    _merge_light exists for exactly this case (a plain f32 cumsum rounds
    the run total to 0.0 and the score filter silently drops the doc)."""
    import jax.numpy as jnp

    from ircl_tpu.ops import hybrid as hy

    P = 8192
    docs = np.concatenate(
        [np.zeros(P - 2, np.int32), np.ones(2, np.int32)]
    ).reshape(1, P)
    contribs = np.concatenate(
        [np.full(P - 2, 200.0, np.float32), np.full(2, 0.001, np.float32)]
    ).reshape(1, P)
    h = np.zeros((1, 64), np.float32)  # no heavy mass
    s, i = hy._merge_light(
        jnp.asarray(h), jnp.asarray(docs), jnp.asarray(contribs), 5, 64,
        pools_sorted=True,
    )
    s, i = np.asarray(s), np.asarray(i)
    got = {int(d): float(v) for d, v in zip(i[0], s[0]) if d >= 0}
    assert 1 in got, (s, i)  # the tiny run must not vanish
    np.testing.assert_allclose(got[1], 0.002, rtol=1e-4)
    np.testing.assert_allclose(got[0], 200.0 * (P - 2), rtol=1e-6)


def test_hybrid_fixed_union_cap_below_128(setup):
    """A fixed_union_cap narrower than the 128 u-tile floor must serve, not
    trip the slab's u % u_tile assertion (u_tile clamps to the union)."""
    index, claims = setup
    r_cap = TfidfRanker(
        index, mode="hybrid", df_threshold=8, fixed_union_cap=64,
        fixed_max_terms=24,
    )
    r_ref = TfidfRanker(index, mode="ragged")
    out = r_cap.closest_docs_batch(claims[:8], k=5)
    ref = r_ref.closest_docs_batch(claims[:8], k=5)
    for (ids, scores), (rids, rscores) in zip(out, ref):
        np.testing.assert_allclose(scores, rscores, rtol=1e-4, atol=1e-6)


def test_window_bounds_match_brute_counts():
    """The searchsorted window-bounds pre-pass == brute-force counting on
    sorted pools (including duplicate runs, all-below and all-above tiles)."""
    import jax.numpy as jnp

    from ircl_tpu.ops.light_add_pallas import _window_bounds

    rng = np.random.default_rng(3)
    P, B, n_pad, d_tile, b_tile = 64, 16, 1024, 256, 8
    docs = np.sort(
        rng.integers(0, n_pad, size=(P, B)).astype(np.int32), axis=0
    )
    docs[:, 0] = 0  # one all-in-first-tile column
    docs[:, 1] = n_pad - 1  # one all-in-last-tile column
    lo, hi = _window_bounds(jnp.asarray(docs), n_pad, d_tile, b_tile)
    n_dt, n_bt = n_pad // d_tile, B // b_tile
    bounds = np.arange(0, n_pad + 1, d_tile)
    counts = (docs[:, :, None] < bounds[None, None, :]).sum(0)  # [B, n_dt+1]
    ref_lo = counts[:, :-1].reshape(n_bt, b_tile, n_dt).min(1).T.reshape(-1)
    ref_hi = counts[:, 1:].reshape(n_bt, b_tile, n_dt).max(1).T.reshape(-1)
    np.testing.assert_array_equal(np.asarray(lo), ref_lo)
    np.testing.assert_array_equal(np.asarray(hi), ref_hi)


def test_run_totals_match_f64_segment_sums_fuzz():
    """_run_totals (compensated dd-scan) vs numpy f64 per-run sums across
    hostile magnitude mixes: relative error must stay f64-class (far below
    f32 cumsum's ulp(prefix))."""
    import jax.numpy as jnp

    from ircl_tpu.ops.hybrid import _run_totals

    rng = np.random.default_rng(7)
    B, P = 8, 1024
    for trial in range(3):
        docs = np.sort(rng.integers(0, 40, size=(B, P)), axis=1).astype(
            np.int32
        )
        mags = 10.0 ** rng.uniform(-4, 4, size=(B, P))
        vals = (mags * rng.uniform(0.5, 2.0, size=(B, P))).astype(np.float32)
        is_end, tot = _run_totals(jnp.asarray(docs), jnp.asarray(vals))
        is_end, tot = np.asarray(is_end), np.asarray(tot)
        for b in range(B):
            ref = {}
            for d, v in zip(docs[b], vals[b].astype(np.float64)):
                ref[int(d)] = ref.get(int(d), 0.0) + v
            got = {
                int(docs[b][p]): float(tot[b][p])
                for p in range(P)
                if is_end[b][p]
            }
            assert set(got) == set(ref)
            for d in ref:
                np.testing.assert_allclose(got[d], ref[d], rtol=1e-6)


@pytest.mark.parametrize("mode", ["ell", "hybrid"])
def test_union_round_parity(setup, mode):
    """union_round=512 (ceil-to-multiple padding instead of pow2) must be
    score- and set-identical to the default padding on both slab engines,
    and the resulting width must satisfy the kernels' u-tiling."""
    index, claims = setup
    ref = TfidfRanker(index, mode=mode, df_threshold=8, precision="highest")
    rnd = TfidfRanker(
        index, mode=mode, df_threshold=8, precision="highest",
        union_round=512,
    )
    # padded width: multiple of 512, and never wider than pow2's choice
    buckets, weights = rnd._vectorize(claims)
    u_pad = rnd._union_slots(buckets, weights, floor=512)
    assert len(u_pad) % 512 == 0
    assert len(u_pad) <= len(ref._union_slots(buckets, weights, floor=512))
    got_ref = ref.closest_docs_batch(claims, k=5)
    got_rnd = rnd.closest_docs_batch(claims, k=5)
    for (ids_r, sc_r), (ids_n, sc_n) in zip(got_ref, got_rnd):
        np.testing.assert_allclose(sc_n, sc_r, rtol=1e-6, atol=1e-7)
        cut = float(np.min(sc_r)) * (1 + 1e-4) + 1e-4
        assert {d for d, s in zip(ids_n, sc_n) if s > cut} == {
            d for d, s in zip(ids_r, sc_r) if s > cut
        }


def test_union_round_validation():
    wiki = generate(num_docs=20, num_claims=2, seed=3)
    store = MemoryDocStore({d: r["text"] for d, r in wiki.docs.items()})
    index = tfidf_transform(
        build_count_index(store, ngram=2, hash_size=HASH_SIZE)
    )
    with pytest.raises(ValueError, match="multiple of 512"):
        TfidfRanker(index, union_round=100)


def test_split_save_load_roundtrip_and_ranker_injection(setup, tmp_path):
    """save_split/load_split roundtrip bit-exactly; a ranker built from the
    loaded split matches one that rebuilt the split, and a mismatched split
    is rejected."""
    from ircl_tpu.index.split import load_split, save_split

    index, claims = setup
    split = split_index(index, df_threshold=8)
    p = str(tmp_path / "split.npz")
    save_split(split, p)
    loaded = load_split(p)
    np.testing.assert_array_equal(loaded.heavy.terms, split.heavy.terms)
    np.testing.assert_array_equal(loaded.heavy.vals, split.heavy.vals)
    np.testing.assert_array_equal(loaded.light_indptr, split.light_indptr)
    np.testing.assert_array_equal(loaded.light_docs, split.light_docs)
    np.testing.assert_array_equal(loaded.light_vals, split.light_vals)
    np.testing.assert_array_equal(loaded.doc_freqs, split.doc_freqs)
    assert (loaded.df_threshold, loaded.num_docs, loaded.hash_size) == (
        split.df_threshold, split.num_docs, split.hash_size,
    )

    built = TfidfRanker(index, mode="hybrid", df_threshold=8)
    injected = TfidfRanker(index, mode="hybrid", split=loaded)
    assert injected.df_threshold == 8  # taken from the split
    got_b = built.closest_docs_batch(claims, k=5)
    got_i = injected.closest_docs_batch(claims, k=5)
    for (ids_b, sc_b), (ids_i, sc_i) in zip(got_b, got_i):
        assert ids_b == ids_i
        np.testing.assert_array_equal(sc_b, sc_i)

    # mismatched split refused
    wiki2 = generate(num_docs=60, num_claims=2, seed=77)
    store2 = MemoryDocStore({d: r["text"] for d, r in wiki2.docs.items()})
    index2 = tfidf_transform(
        build_count_index(store2, ngram=2, hash_size=HASH_SIZE)
    )
    with pytest.raises(ValueError, match="does not match"):
        TfidfRanker(index2, mode="hybrid", split=loaded)


@pytest.mark.parametrize("n_cand", [16, 64])
def test_select_rescore_matches_exact_engine(setup, n_cand):
    """Select+rescore (bf16 candidate selection + exact f32 rescore,
    ops/hybrid.py::_select_rescore_topk) matches the exact staged engine.
    At this corpus size every positive-scoring doc fits inside the
    candidate set for n_cand=64, so the outputs must agree to f32
    accumulation order; 16 exercises the probe-backed containment slack.
    (n_cand == k is measurably NOT exact here — a borderline 5th-place doc
    can fall outside the bf16 top-5 — which is why the option defaults to
    16+ and bench_scale gates every run.)"""
    index, claims = setup
    r_exact = TfidfRanker(
        index, mode="hybrid", df_threshold=8, width_buckets=2
    )
    r_sel = TfidfRanker(
        index, mode="hybrid", df_threshold=8, width_buckets=2,
        select_rescore=n_cand,
    )
    out_e = r_exact.closest_docs_batch(claims, k=5)
    out_s = r_sel.closest_docs_batch(claims, k=5)
    for qi, ((ids_e, s_e), (ids_s, s_s)) in enumerate(zip(out_e, out_s)):
        assert len(ids_e) == len(ids_s), f"query {qi}"
        np.testing.assert_allclose(s_s, s_e, rtol=1e-4, atol=1e-6)
        assert set(ids_s) == set(ids_e) or np.allclose(
            sorted(s_s), sorted(s_e), rtol=1e-4
        ), f"query {qi}"


def test_select_rescore_requires_bucketed_engine(setup):
    index, _ = setup
    with pytest.raises(ValueError, match="width_buckets"):
        TfidfRanker(index, mode="hybrid", select_rescore=16)


def test_light_total_at_exactness():
    """_light_total_at returns each candidate doc's full run total (and 0
    for docs absent from the pool), independent of where in the run the
    searchsorted lands."""
    import jax.numpy as jnp

    from ircl_tpu.ops.hybrid import _light_total_at, _run_totals

    rng = np.random.default_rng(3)
    B, P = 4, 64
    sd = np.sort(rng.integers(0, 20, size=(B, P)).astype(np.int32), axis=1)
    sv = rng.random((B, P)).astype(np.float32)
    _, l_tot = _run_totals(jnp.asarray(sd), jnp.asarray(sv))
    cand = np.stack([np.arange(24, dtype=np.int32)] * B)  # incl. absent ids
    got = np.asarray(
        _light_total_at(jnp.asarray(sd), l_tot, jnp.asarray(cand))
    )
    for b in range(B):
        for c in range(24):
            want = sv[b][sd[b] == cand[b, c]].astype(np.float64).sum()
            np.testing.assert_allclose(
                got[b, c], want, rtol=1e-5, atol=1e-7,
                err_msg=f"b={b} doc={cand[b, c]}",
            )
