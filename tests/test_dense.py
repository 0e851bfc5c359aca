"""Dense scorer tests: exactness vs numpy, sharded merge on 8-dev CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ircl_tpu.dense.scorer import cosine_topk, sharded_cosine_topk
from ircl_tpu.parallel.mesh import make_mesh


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    Q = _norm(rng.normal(size=(16, 32))).astype(np.float32)
    C = _norm(rng.normal(size=(200, 32))).astype(np.float32)
    return Q, C


def test_cosine_topk_exact(data):
    Q, C = data
    s, i = cosine_topk(jnp.asarray(Q), jnp.asarray(C), k=7)
    ref = Q @ C.T
    for b in range(Q.shape[0]):
        order = np.argsort(-ref[b])[:7]
        np.testing.assert_allclose(
            np.asarray(s)[b], np.sort(ref[b])[::-1][:7], rtol=1e-5
        )
        np.testing.assert_allclose(
            ref[b][np.asarray(i)[b]], np.sort(ref[b])[::-1][:7], rtol=1e-5
        )


def test_cosine_topk_blocked_matches_unblocked(data):
    Q, C = data
    s0, i0 = cosine_topk(jnp.asarray(Q), jnp.asarray(C), k=5)
    s1, i1 = cosine_topk(jnp.asarray(Q), jnp.asarray(C), k=5, block=50)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_sharded_topk_matches_single_device(data):
    Q, C = data
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = make_mesh(("corpus",))
    s, i = sharded_cosine_topk(Q, C, k=5, mesh=mesh)
    ref = Q @ C.T
    for b in range(Q.shape[0]):
        np.testing.assert_allclose(s[b], np.sort(ref[b])[::-1][:5], rtol=1e-5)
        np.testing.assert_allclose(ref[b][i[b]], s[b], rtol=1e-5)


def test_sharded_topk_with_ragged_corpus():
    # corpus size not divisible by 8: padding rows must never be returned.
    rng = np.random.default_rng(1)
    Q = _norm(rng.normal(size=(4, 16))).astype(np.float32)
    C = _norm(rng.normal(size=(13, 16))).astype(np.float32)
    mesh = make_mesh(("corpus",))
    s, i = sharded_cosine_topk(Q, C, k=5, mesh=mesh)
    assert i.max() < 13
    ref = Q @ C.T
    for b in range(4):
        np.testing.assert_allclose(s[b], np.sort(ref[b])[::-1][:5], rtol=1e-5)


def test_cosine_topk_twophase_exact(data):
    """Two-phase chunked top-k == flat top-k (scores and index sets),
    including adversarial cases with several top elements in one chunk."""
    from ircl_tpu.dense.scorer import cosine_topk_twophase

    Q, C = data
    # chunk NOT dividing the corpus rows: internal -inf column padding
    chunk = 25
    s0, i0 = cosine_topk(jnp.asarray(Q), jnp.asarray(C), k=5)
    s1, i1 = cosine_topk_twophase(
        jnp.asarray(Q), jnp.asarray(C), k=5, chunk=chunk
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-6)
    for b in range(Q.shape[0]):
        assert set(np.asarray(i1)[b].tolist()) == set(
            np.asarray(i0)[b].tolist()
        )


def test_cosine_topk_twophase_clustered():
    """All true top-k packed into ONE chunk (the case chunk-max selection
    must not break) plus ties at the k-th value."""
    from ircl_tpu.dense.scorer import cosine_topk_twophase

    rng = np.random.default_rng(3)
    M, D, chunk = 512, 16, 64
    C = rng.normal(size=(M, D)).astype(np.float32) * 0.01
    # plant 5 near-identical strong rows inside chunk 3
    q = rng.normal(size=(1, D)).astype(np.float32)
    q /= np.linalg.norm(q)
    for j in range(5):
        C[3 * chunk + 10 + j] = q[0] * (1.0 - 1e-4 * j)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    s0, i0 = cosine_topk(jnp.asarray(q), jnp.asarray(C), k=5)
    s1, i1 = cosine_topk_twophase(jnp.asarray(q), jnp.asarray(C), k=5, chunk=chunk)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-6)
    assert set(np.asarray(i1)[0].tolist()) == set(np.asarray(i0)[0].tolist())


def test_cosine_topk_scan_matches_flat(data):
    from ircl_tpu.dense.scorer import cosine_topk_scan

    Q, C = data
    m = C.shape[0]
    # make m divisible by block and chunk
    block, chunk = 50, 10
    mm = m // block * block
    Cb = C[:mm]
    s0, i0 = cosine_topk(jnp.asarray(Q), jnp.asarray(Cb), k=5)
    s1, i1 = cosine_topk_scan(
        jnp.asarray(Q), jnp.asarray(Cb), k=5, chunk=chunk, block=block
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-6)
    for b in range(Q.shape[0]):
        assert set(np.asarray(i1)[b].tolist()) == set(
            np.asarray(i0)[b].tolist()
        )


def test_cosine_topk_scan_extra_chunks_matches_flat(data):
    """extra_chunks slack only widens the candidate set — results stay
    exact (near-tie margin knob, review finding round 3)."""
    from ircl_tpu.dense.scorer import cosine_topk_scan

    Q, C = data
    m = C.shape[0]
    block, chunk = 50, 10
    mm = m // block * block
    Cb = C[:mm]
    s0, i0 = cosine_topk(jnp.asarray(Q), jnp.asarray(Cb), k=5)
    s1, i1 = cosine_topk_scan(
        jnp.asarray(Q), jnp.asarray(Cb), k=5, chunk=chunk, block=block,
        extra_chunks=3,
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-6)
    for b in range(Q.shape[0]):
        assert set(np.asarray(i1)[b].tolist()) == set(
            np.asarray(i0)[b].tolist()
        )


def test_cosine_topk_twophase_small_corpus_k_exceeds_chunks():
    """k > number of chunks (M < k*chunk at default chunk): must not crash
    and must stay exact (review finding, round 3)."""
    from ircl_tpu.dense.scorer import cosine_topk_scan, cosine_topk_twophase

    rng = np.random.default_rng(9)
    Q = rng.normal(size=(4, 16)).astype(np.float32)
    C = rng.normal(size=(200, 16)).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    s0, i0 = cosine_topk(jnp.asarray(Q), jnp.asarray(C), k=5)
    s1, i1 = cosine_topk_twophase(jnp.asarray(Q), jnp.asarray(C), k=5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-6)
    s2, i2 = cosine_topk_scan(
        jnp.asarray(Q), jnp.asarray(C), k=5, chunk=50, block=100
    )
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s0), rtol=1e-6)
    for b in range(4):
        assert set(np.asarray(i1)[b].tolist()) == set(np.asarray(i0)[b].tolist())
        assert set(np.asarray(i2)[b].tolist()) == set(np.asarray(i0)[b].tolist())


def test_cosine_topk_fused_matches_flat(data):
    """Fused Pallas chunk-max phase 1 == flat top-k (interpret on CPU)."""
    from ircl_tpu.ops.dense_topk_pallas import cosine_topk_fused, pad_corpus_t

    Q, C = data
    s0, i0 = cosine_topk(jnp.asarray(Q), jnp.asarray(C), k=5)
    ct, m_real = pad_corpus_t(C, m_tile=100)  # M=200 not a 100*chunk case
    s1, i1 = cosine_topk_fused(
        jnp.asarray(Q), jnp.asarray(ct), k=5, chunk=25, m_tile=100,
        m_real=m_real, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-6)
    for b in range(Q.shape[0]):
        assert set(np.asarray(i1)[b].tolist()) == set(
            np.asarray(i0)[b].tolist()
        )


def test_cosine_topk_fused_fold_epilogue(data):
    """Interleaved fold chunk partition == flat top-k (any fixed partition
    of the columns keeps the chunk-max superset argument; phase 2 maps the
    fold's mod-npt chunks back to rows)."""
    from ircl_tpu.ops.dense_topk_pallas import cosine_topk_fused, pad_corpus_t

    Q, C = data
    s0, i0 = cosine_topk(jnp.asarray(Q), jnp.asarray(C), k=5)
    ct, m_real = pad_corpus_t(C, m_tile=128)  # M=200 -> pad 256, 2 tiles
    for chunk in (16, 32):  # npt = 8 / 4, both power-of-two
        s1, i1 = cosine_topk_fused(
            jnp.asarray(Q), jnp.asarray(ct), k=5, chunk=chunk, m_tile=128,
            m_real=m_real, epilogue="fold", interpret=True,
        )
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-6)
        for b in range(Q.shape[0]):
            assert set(np.asarray(i1)[b].tolist()) == set(
                np.asarray(i0)[b].tolist()
            )


def test_cosine_topk_fused_high3_matches_flat(data):
    """precision="high3" (manual in-kernel bf16_3x hi/lo split — Mosaic
    rejects Precision.HIGH) stays exact on well-separated data and matches
    the flat reference (interpret on CPU)."""
    from ircl_tpu.ops.dense_topk_pallas import cosine_topk_fused, pad_corpus_t

    Q, C = data
    s0, i0 = cosine_topk(jnp.asarray(Q), jnp.asarray(C), k=5)
    ct, m_real = pad_corpus_t(C, m_tile=128)
    s1, i1 = cosine_topk_fused(
        jnp.asarray(Q), jnp.asarray(ct), k=5, chunk=16, m_tile=128,
        m_real=m_real, epilogue="fold", precision="high3", interpret=True,
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-6)
    for b in range(Q.shape[0]):
        assert set(np.asarray(i1)[b].tolist()) == set(
            np.asarray(i0)[b].tolist()
        )


def test_cosine_topk_fused_bf16_corpus_with_slack(data):
    """bf16-stored corpus + extra_chunks slack + f32 rescore rows stays
    exact (the reduced-precision phase-1 path, interpret on CPU)."""
    from ircl_tpu.ops.dense_topk_pallas import cosine_topk_fused, pad_corpus_t

    Q, C = data
    s0, i0 = cosine_topk(jnp.asarray(Q), jnp.asarray(C), k=5)
    ct, m_real = pad_corpus_t(C, m_tile=100)
    rows = jnp.asarray(np.ascontiguousarray(ct.T))  # [M_pad, D] f32
    s1, i1 = cosine_topk_fused(
        jnp.asarray(Q), jnp.asarray(ct).astype(jnp.bfloat16),
        k=5, chunk=25, m_tile=100, m_real=m_real,
        precision="default", extra_chunks=2, corpus_rows=rows, interpret=True,
    )
    # rescore is f32 HIGHEST over f32 rows -> scores exact when the
    # superset holds (extra_chunks=2 gives bf16 chunk-maxima margin)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-6)
    for b in range(Q.shape[0]):
        assert set(np.asarray(i1)[b].tolist()) == set(
            np.asarray(i0)[b].tolist()
        )


def test_embed_corpus_sharded_matches_single_device():
    """embed_corpus(mesh=...) — batch rows sharded over the data axis via
    GSPMD — must reproduce the single-device sweep exactly."""
    from ircl_tpu.contrastive.state import TrainConfig, init_train_state
    from ircl_tpu.contrastive.train import make_embed_fn
    from ircl_tpu.dense.embed import embed_corpus
    from ircl_tpu.models.encoder import EncoderConfig
    from ircl_tpu.models.featurizer import FeaturizerConfig, HashEmbedFeaturizer

    cfg = TrainConfig(
        encoder=EncoderConfig(
            input_size=16, hidden_size=8, output_size=8, num_layers=1
        ),
        queue_size=16,
        micro_batch=8,
        accum_steps=2,
    )
    feat = HashEmbedFeaturizer(
        FeaturizerConfig(dim=16, max_len=8, vocab_buckets=1 << 10)
    )
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    embed_fn = make_embed_fn(cfg, feat)
    texts = [f"doc {i} alpha beta tok{i}" for i in range(37)]  # ragged tail
    ref = embed_corpus(embed_fn, state.params_q, feat, texts, batch_size=16)
    mesh = make_mesh(("data",))
    got = embed_corpus(
        embed_fn, state.params_q, feat, texts, batch_size=16, mesh=mesh
    )
    assert got.shape == ref.shape == (37, 8)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_sharded_topk_negative_cosines_with_padding():
    """Zero pad rows (cosine 0) must NOT displace real negative-cosine docs
    from the sharded top-k: pads are masked to -inf by row id pre-merge."""
    rng = np.random.default_rng(4)
    Q = _norm(rng.normal(size=(6, 16))).astype(np.float32)
    C = _norm(-Q[:1] + 0.01 * rng.normal(size=(13, 16))).astype(np.float32)
    # 13 docs on an 8-way mesh -> 3 zero pad rows; query 0's cosines are all
    # strongly negative, so every pad row would outrank every real doc.
    mesh = make_mesh(("corpus",))
    s, i = sharded_cosine_topk(Q, C, k=5, mesh=mesh)
    ref = Q @ C.T
    for b in range(Q.shape[0]):
        order = np.argsort(-ref[b])[:5]
        assert (i[b] >= 0).all() and (i[b] < 13).all(), i[b]
        np.testing.assert_allclose(s[b], ref[b][order], rtol=1e-5)
        assert set(i[b].tolist()) == set(order.tolist())


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cosine_topk_fused_config_fuzz(seed):
    """Random (M, m_tile, chunk, epilogue, k) configs vs numpy: the fold
    chunk->row mapping, tail-tile masking, and pad handling must hold for
    any power-of-two chunk dividing m_tile, any m_real (pads included),
    and k near the chunk count."""
    from ircl_tpu.ops.dense_topk_pallas import cosine_topk_fused, pad_corpus_t

    rng = np.random.default_rng(100 + seed)
    for _ in range(6):
        B = int(rng.integers(2, 9))
        D = int(rng.choice([8, 16, 32]))
        M = int(rng.integers(40, 400))
        m_tile = int(rng.choice([64, 128, 256]))
        chunk = int(rng.choice([8, 16, 32]))
        if chunk > m_tile:
            chunk = m_tile
        k = int(rng.integers(1, 6))
        epi = str(rng.choice(["loop", "fold"]))
        Q = _norm(rng.normal(size=(B, D))).astype(np.float32)
        C = _norm(rng.normal(size=(M, D))).astype(np.float32)
        ref = Q @ C.T
        ct, m_real = pad_corpus_t(C, m_tile=m_tile)
        s, i = cosine_topk_fused(
            jnp.asarray(Q), jnp.asarray(ct), k=k, chunk=chunk,
            m_tile=m_tile, m_real=m_real, epilogue=epi, interpret=True,
        )
        s, i = np.asarray(s), np.asarray(i)
        cfg = f"B={B} D={D} M={M} mt={m_tile} ch={chunk} k={k} {epi}"
        for b in range(B):
            order = np.argsort(-ref[b], kind="stable")[:k]
            np.testing.assert_allclose(
                s[b], np.sort(ref[b])[::-1][:k], rtol=1e-5, atol=1e-6,
                err_msg=cfg,
            )
            # id sets must agree above the tie cut
            cut = ref[b][order[-1]] - 1e-6
            got = {int(x) for x, v in zip(i[b], s[b]) if v > cut}
            want = {int(x) for x in order if ref[b][x] > cut}
            assert got == want, (cfg, b)
