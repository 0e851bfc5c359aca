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
    dp_step, place_state, place_batch = make_dp_train_step(CFG, FEAT, mesh)
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
