"""Pod-sharded hybrid scoring equals the single-device hybrid ranker."""

import numpy as np
import pytest

from ircl_tpu.corpus.store import MemoryDocStore
from ircl_tpu.corpus.synthetic import generate
from ircl_tpu.index.build import build_count_index
from ircl_tpu.index.ranker import TfidfRanker
from ircl_tpu.index.split import gather_light_pools
from ircl_tpu.index.tfidf import tfidf_transform
from ircl_tpu.ops.membership_pallas import pad_for_slab
from ircl_tpu.parallel.mesh import make_mesh
from ircl_tpu.parallel.sharded_hybrid import ShardedHybridIndex


@pytest.mark.parametrize("slab_impl", ["xla", "pallas"])
def test_sharded_hybrid_matches_single_device(slab_impl):
    wiki = generate(num_docs=120, num_claims=32, seed=17)
    store = MemoryDocStore({d: rec["text"] for d, rec in wiki.docs.items()})
    index = tfidf_transform(build_count_index(store, ngram=2, hash_size=1 << 20))
    claims = [c.claim for c in wiki.claims]

    single = TfidfRanker(index, mode="hybrid", df_threshold=8)
    ref = single.closest_docs_batch(claims, k=5)

    mesh = make_mesh(("corpus",))
    sharded = ShardedHybridIndex(single._split, mesh, slab_impl=slab_impl)

    buckets, weights = single._vectorize(claims)
    heavy_q = single._split.doc_freqs[buckets] > single._split.df_threshold
    hw = np.where(heavy_q, weights, 0.0).astype(np.float32)
    u_pad = single._union_slots(buckets, hw, floor=512)
    qb_t, qw_t = pad_for_slab(
        np.ascontiguousarray(buckets.T.astype(np.int32)),
        np.ascontiguousarray(hw.T),
        d_tile=128,
    )
    light_docs, light_contribs, _ = gather_light_pools(
        single._split, buckets, weights
    )
    s, i = sharded.topk(u_pad, qb_t, qw_t, light_docs, light_contribs, k=5)
    s, i = s[: len(claims)], i[: len(claims)]

    for b, (ids_ref, scores_ref) in enumerate(ref):
        keep = i[b] >= 0
        got_ids = [index.doc_ids[j] for j in i[b][keep]]
        assert len(got_ids) == len(ids_ref), f"query {b}"
        np.testing.assert_allclose(
            np.sort(s[b][keep]), np.sort(scores_ref), rtol=1e-4, atol=1e-6
        )
        assert set(got_ids) == set(ids_ref) or np.allclose(
            sorted(s[b][keep]), sorted(scores_ref), rtol=1e-4
        )
