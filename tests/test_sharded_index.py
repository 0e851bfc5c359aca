"""Corpus-sharded sparse scoring equals the single-device ELL ranker."""

import numpy as np
import pytest

import jax

from ircl_tpu.corpus.store import MemoryDocStore
from ircl_tpu.corpus.synthetic import generate
from ircl_tpu.index.build import build_count_index
from ircl_tpu.index.ell import to_ell
from ircl_tpu.index.ranker import TfidfRanker
from ircl_tpu.index.tfidf import tfidf_transform
from ircl_tpu.ops.membership_pallas import pad_for_slab
from ircl_tpu.parallel.mesh import make_mesh
from ircl_tpu.parallel.sharded_index import ShardedEllIndex


def test_sharded_sparse_topk_matches_single_device():
    wiki = generate(num_docs=90, num_claims=30, seed=9)
    store = MemoryDocStore({d: rec["text"] for d, rec in wiki.docs.items()})
    index = tfidf_transform(build_count_index(store, ngram=2, hash_size=1 << 20))
    claims = [c.claim for c in wiki.claims]

    single = TfidfRanker(index, mode="ell")
    ref = single.closest_docs_batch(claims, k=5)

    mesh = make_mesh(("corpus",))
    sharded = ShardedEllIndex(to_ell(index), mesh)

    buckets, weights = single._vectorize(claims)
    u_pad = single._union_slots(buckets, weights, floor=512)
    qb_t, qw_t = pad_for_slab(
        np.ascontiguousarray(buckets.T.astype(np.int32)),
        np.ascontiguousarray(weights.T),
        d_tile=128,
    )
    s, i = sharded.topk(u_pad, qb_t, qw_t, k=5)
    s, i = s[: len(claims)], i[: len(claims)]

    for b, (ids_ref, scores_ref) in enumerate(ref):
        keep = i[b] >= 0
        got_ids = [index.doc_ids[j] for j in i[b][keep]]
        np.testing.assert_allclose(
            s[b][keep], scores_ref, rtol=1e-4, atol=1e-6
        )
        assert set(got_ids) == set(ids_ref) or np.allclose(
            sorted(s[b][keep]), sorted(scores_ref), rtol=1e-4
        )
