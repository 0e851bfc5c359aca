"""Pod-sharded hybrid at scale on the virtual 8-device mesh.

Two demonstrations for the FEVER full-wiki (5.4M doc) pod story
(``parallel/sharded_hybrid.py``):

1. execution: build a synthetic Zipf index (``--docs``; the XLA slab
   fallback makes 500K+ practical on the CPU mesh, ``--ref scipy``
   checks parity against an exact host CSR matvec), shard the heavy ELL
   over an 8-device ``corpus`` mesh, route light pools, run the exact
   sharded top-5 and check per-returned-doc score parity;
2. memory math: print the per-shard device budget (heavy slab bytes +
   transient scores) for this corpus and extrapolated to 5.4M docs on a
   v5e pod slice — the numbers that show one chip holds 1/8 of full wiki
   with room to spare (``--stats-only --docs 5400000`` measures them on a
   real 5.4M split instead of extrapolating).

Run from the repo root: ``python scripts/sharded_scale.py``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Virtual 8-device CPU mesh: must be set before JAX initializes (the env
# pins JAX_PLATFORMS=axon -> one real chip; see tests/conftest.py).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def shard_budget(split, n_shards: int, batch: int) -> dict:
    """Per-shard device bytes for the sharded hybrid layout."""
    k_h = split.heavy.k_width
    n = split.num_docs
    rows = -(-n // (n_shards * 256)) * 256
    slab = 2 * k_h * rows * 4  # terms int32 + vals f32, [K_h, rows]
    scores = batch * rows * 4  # transient h [B, rows] f32
    return {
        "docs_per_shard": rows,
        "heavy_width": int(k_h),
        "slab_bytes": int(slab),
        "transient_scores_bytes": int(scores),
        "total_gb": round((slab + scores) / 2**30, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=40_000)
    ap.add_argument("--terms", type=int, default=96)
    ap.add_argument("--vocab", type=int, default=400_000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--df-threshold", type=int, default=64)
    ap.add_argument("--stats-only", action="store_true")
    ap.add_argument(
        "--ref", choices=("scipy", "hybrid"), default="scipy",
        help="parity reference: exact host CSR matvec (any scale) or the "
             "single-device hybrid engine (interpret Pallas, <=40K docs)",
    )
    ap.add_argument(
        "--slab-impl", choices=("xla", "pallas"), default=None,
        help="sharded slab implementation (default: xla on cpu backend)",
    )
    args = ap.parse_args()

    import jax

    # env vars alone do not beat the pinned axon plugin; the config flag does
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu" and len(jax.devices()) == 8, (
        jax.devices()
    )

    from bench_scale import synth_index
    from ircl_tpu.index.split import split_index
    from ircl_tpu.index.tfidf import idf_vector

    t0 = time.time()
    cache = f"/tmp/ircl_scale_{args.docs}_{args.terms}_{args.vocab}.npz"
    if os.path.exists(cache):
        from ircl_tpu.index.build import CountIndex

        index = CountIndex.load(cache)
    else:
        index = synth_index(args.docs, args.terms, args.vocab, 1 << 24)
    log(f"index: {index.num_docs} docs, {index.nnz} postings ({time.time()-t0:.0f}s)")

    if args.stats_only:
        split = split_index(index, df_threshold=args.df_threshold)
        budget = shard_budget(split, 8, args.batch)
        budget["light_postings_host"] = int(
            split.light_indptr[-1] if hasattr(split, "light_indptr") else -1
        )
        print(json.dumps({"docs": args.docs, "per_shard": budget}))
        return

    from ircl_tpu.corpus.synthetic import generate  # noqa: F401 (parity w/ bench)
    from ircl_tpu.index.ranker import TfidfRanker
    from ircl_tpu.index.split import gather_light_pools
    from ircl_tpu.ops.membership_pallas import pad_for_slab
    from ircl_tpu.parallel.mesh import make_mesh
    from ircl_tpu.parallel.sharded_hybrid import ShardedHybridIndex

    B, K = args.batch, 5
    single = TfidfRanker(
        index, mode="hybrid", df_threshold=args.df_threshold, fixed_max_terms=24
    )
    rng = np.random.default_rng(7)
    occupied = np.flatnonzero(index.doc_freqs)
    qb = occupied[rng.integers(0, len(occupied), size=(B, 24))].astype(np.int32)
    idfs = idf_vector(index.doc_freqs, index.num_docs)
    qw = (np.log1p(1.0) * idfs[qb]).astype(np.float32)

    t0 = time.time()
    if args.ref == "hybrid":
        ref_s, ref_i = single.hybrid_from_vectors(qb, qw, K)
        ref_dense = None
        log(f"single-device hybrid done in {time.time()-t0:.0f}s")
    else:
        # Exact host reference: per-query sparse matvec over the full CSR
        # (shared single copy: ircl_tpu/index/build.py::scipy_query_scores).
        # Fast at any corpus size and independent of every device engine.
        from ircl_tpu.index.build import scipy_query_scores, to_scipy

        ref_dense = scipy_query_scores(
            to_scipy(index), qb, qw, index.hash_size
        )  # [B, N]
        o = np.argsort(-ref_dense, axis=1, kind="stable")[:, :K]
        ref_s = np.take_along_axis(ref_dense, o, axis=1)
        ref_i = o
        log(f"scipy reference done in {time.time()-t0:.0f}s")

    mesh = make_mesh(("corpus",))
    sharded = ShardedHybridIndex(single._split, mesh, slab_impl=args.slab_impl)
    log(f"sharded slab_impl={sharded.slab_impl}")
    heavy_q = single._split.doc_freqs[qb] > single._split.df_threshold
    hw = np.where(heavy_q, qw, 0.0).astype(np.float32)
    u_pad = single._union_slots(qb, hw, floor=512)
    qb_t, qw_t = pad_for_slab(
        np.ascontiguousarray(qb.T.astype(np.int32)),
        np.ascontiguousarray(hw.T),
        d_tile=128,
    )
    light_docs, light_contribs, _ = gather_light_pools(single._split, qb, qw)

    t0 = time.time()
    s, i = sharded.topk(u_pad, qb_t, qw_t, light_docs, light_contribs, k=K)
    t_shard = time.time() - t0
    s, i = s[:B], i[:B]
    log(f"sharded (8 devices) done in {t_shard:.0f}s")

    bad = 0
    for b in range(B):
        n = int((ref_i[b] >= 0).sum())
        ok = np.allclose(
            np.sort(s[b][:n]), np.sort(ref_s[b][:n]), rtol=1e-4, atol=1e-6
        )
        if ok and ref_dense is not None:
            # each returned doc id must carry its own exact reference score
            for j in range(n):
                if i[b][j] >= 0 and not np.isclose(
                    s[b][j], ref_dense[b][i[b][j]], rtol=1e-4, atol=1e-6
                ):
                    ok = False
                    break
        if not ok:
            bad += 1
    log(f"parity: {B - bad}/{B}")
    if bad:
        raise SystemExit(f"sharded parity failed on {bad} queries")

    budget = shard_budget(single._split, 8, 1024)
    # extrapolate the slab linearly in docs (heavy width is df-threshold-
    # driven and roughly scale-free for Zipf corpora; measured directly via
    # --stats-only --docs 5400000)
    scale = 5_400_000 / args.docs
    extrap_gb = round(
        (budget["slab_bytes"] * scale + 1024 * budget["docs_per_shard"] * scale * 4)
        / 2**30,
        2,
    )
    print(
        json.dumps(
            {
                "docs": args.docs,
                "parity": f"{B - bad}/{B}",
                "per_shard": budget,
                "extrapolated_5.4M_per_shard_gb": extrap_gb,
            }
        )
    )


if __name__ == "__main__":
    main()
