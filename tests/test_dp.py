"""Data-parallel train step: 8-device mesh result equals single-device."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from ircl_tpu.contrastive.state import TrainConfig, init_train_state
from ircl_tpu.contrastive.train import make_train_step
from ircl_tpu.models.encoder import EncoderConfig
from ircl_tpu.models.featurizer import FeaturizerConfig, HashEmbedFeaturizer
from ircl_tpu.parallel.dp import make_dp_train_step
from ircl_tpu.parallel.mesh import make_mesh

CFG = TrainConfig(
    encoder=EncoderConfig(input_size=16, hidden_size=8, output_size=8, num_layers=1),
    queue_size=32,
    queue_start_steps=1,
    micro_batch=16,  # divisible by 8 devices
    accum_steps=2,
    learning_rate=1e-3,
)

FEAT = HashEmbedFeaturizer(FeaturizerConfig(dim=16, max_len=8, vocab_buckets=1 << 10))


def _batch(seed):
    rng = np.random.default_rng(seed)
    n = CFG.accum_steps * CFG.micro_batch
    texts_a = [f"ent{rng.integers(40)} foo bar" for _ in range(n)]
    texts_k = [f"baz ent{rng.integers(40)} qux" for _ in range(n)]
    ids_a, mask_a = FEAT.encode_host(texts_a)
    ids_k, mask_k = FEAT.encode_host(texts_k)
    shp = (CFG.accum_steps, CFG.micro_batch, 8)
    return tuple(
        jnp.asarray(a.reshape(shp)) for a in (ids_a, mask_a, ids_k, mask_k)
    )


def test_dp_equals_single_device():
    batch = _batch(0)

    state1 = init_train_state(jax.random.PRNGKey(0), CFG)
    single = make_train_step(CFG, FEAT)
    state1, loss1, gn1 = single(state1, *batch)
    state1, loss1b, _ = single(state1, *batch)

    mesh = make_mesh(("data",))
    dp_step, place_state, place_batch, _ = make_dp_train_step(CFG, FEAT, mesh)
    state8 = place_state(init_train_state(jax.random.PRNGKey(0), CFG))
    b8 = place_batch(*batch)
    state8, loss8, gn8 = dp_step(state8, *b8)
    state8, loss8b, _ = dp_step(state8, *b8)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4)
    np.testing.assert_allclose(float(loss1b), float(loss8b), rtol=1e-4)
    np.testing.assert_allclose(float(gn1), float(gn8), rtol=1e-4)
    for a, b in zip(
        jax.tree.leaves(state1.params_q), jax.tree.leaves(state8.params_q)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state1.queue), np.asarray(state8.queue), atol=1e-5
    )
    assert int(state8.queue_ptr) == int(state1.queue_ptr)


def test_dp_proto_equals_single_device():
    """ProtoNCE inputs ride the DP step: batch cluster ids shard with the
    batch, centroids/densities/negatives replicate — same loss and params
    as the single-device step."""
    cfg = dataclasses.replace(
        CFG, loss="ProtoNCE", num_clusters=(4, 6), num_neg_proto=2
    )
    batch = _batch(1)
    rng = np.random.default_rng(3)
    G, D = 2, CFG.encoder.output_size
    shape_ids = (CFG.accum_steps, CFG.micro_batch)
    proto = (
        [
            jnp.asarray(rng.integers(0, c, size=shape_ids).astype(np.int32))
            for c in cfg.num_clusters
        ],
        [
            jnp.asarray(rng.normal(size=(c, D)).astype(np.float32))
            for c in cfg.num_clusters
        ],
        [
            jnp.asarray(rng.uniform(0.5, 2.0, size=(c,)).astype(np.float32))
            for c in cfg.num_clusters
        ],
        [
            jnp.asarray(rng.integers(0, c, size=(2,)).astype(np.int32))
            for c in cfg.num_clusters
        ],
    )
    assert G == len(proto[0])

    state1 = init_train_state(jax.random.PRNGKey(0), cfg)
    single = make_train_step(cfg, FEAT)
    state1, loss1, gn1 = single(state1, *batch, proto)

    mesh = make_mesh(("data",))
    dp_step, place_state, place_batch, place_proto = make_dp_train_step(
        cfg, FEAT, mesh
    )
    state8 = place_state(init_train_state(jax.random.PRNGKey(0), cfg))
    state8, loss8, gn8 = dp_step(
        state8, *place_batch(*batch), place_proto(proto)
    )

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4)
    np.testing.assert_allclose(float(gn1), float(gn8), rtol=1e-4)
    for a, b in zip(
        jax.tree.leaves(state1.params_q), jax.tree.leaves(state8.params_q)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_trainer_dp_matches_single_device(tmp_path):
    """The production loop (ContrastiveTrainer) run on a DP mesh reproduces
    the single-device run: same sampler stream, same final params."""
    from ircl_tpu.contrastive.trainer import ContrastiveTrainer
    from ircl_tpu.data.pairs import DocPairSampler

    docs = [
        [f"tok{i} sent{j} common words here" for j in range(3)]
        for i in range(12)
    ]

    def run(mesh, sub):
        sampler = DocPairSampler(docs, sample="uniform", seed=3)
        t = ContrastiveTrainer(
            CFG,
            FEAT,
            sampler,
            ckptdir=str(tmp_path / sub / "ckpt"),
            logdir=str(tmp_path / sub / "log"),
            seed=5,
            mesh=mesh,
        )
        return t.train(total_steps=4, log_step=2)

    s_ref = run(None, "single")
    s_dp = run(make_mesh(("data",)), "dp")
    assert int(s_dp.step) == int(s_ref.step) == 4
    for a, b in zip(
        jax.tree.leaves(s_ref.params_q), jax.tree.leaves(s_dp.params_q)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
