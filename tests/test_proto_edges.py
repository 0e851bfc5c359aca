"""Edge-case regressions from the contrastive-layer review:

- all-singleton clusterings (granularity >= corpus size) must yield finite
  positive prototype temperatures, not NaN/inf proto loss;
- a row's own prototype leaking into the sampled negatives must be masked
  out of its denominator;
- use_queue with a non-divisible micro_batch must fail fast (the reference
  silently never enqueues, training against the random-init queue);
- compute_dtype="bfloat16" must train with the default (masked_mean=False)
  encoder — bf16 keys are cast into the f32 queue buffer.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ircl_tpu.contrastive.cluster import run_hierarchical, run_kmeans
from ircl_tpu.contrastive.losses import proto_loss, sample_negative_prototypes
from ircl_tpu.contrastive.state import TrainConfig, init_train_state
from ircl_tpu.contrastive.train import make_train_step
from ircl_tpu.models.encoder import EncoderConfig
from ircl_tpu.models.featurizer import FeaturizerConfig, HashEmbedFeaturizer


def test_all_singleton_clusters_finite_temperatures():
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(12, 8)).astype(np.float32)
    for result in (
        run_hierarchical(emb, (64,), temperature=0.05),  # k > corpus
        run_kmeans(emb, (64,), temperature=0.05, num_iters=3, num_redo=1),
    ):
        dens = np.asarray(result.density[0])
        assert np.isfinite(dens).all() and (dens > 0).all(), dens
        # proto loss over these temperatures stays finite
        ids = result.emb2cluster[0][:4]
        q = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
        negs = sample_negative_prototypes(
            jax.random.PRNGKey(0), result.centroids[0].shape[0], ids, 3
        )
        loss = proto_loss(
            q, [ids], [result.centroids[0]], [result.density[0]], [negs]
        )
        assert np.isfinite(float(loss)), float(loss)


def test_proto_loss_masks_own_prototype_in_negatives():
    rng = np.random.default_rng(1)
    K, D, N = 4, 8, 3
    protos = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32))
    dens = jnp.ones((K,), jnp.float32)
    ids = jnp.asarray([0, 1, 2], jnp.int32)
    q = protos[ids]  # each row maximally similar to its own prototype
    # negatives deliberately contain every positive id
    negs = jnp.asarray([0, 1, 2, 3], jnp.int32)
    loss = float(proto_loss(q, [ids], [protos], [dens], [negs]))
    assert np.isfinite(loss)
    # without masking, each row's own prototype appears twice (label column
    # + negative column), flooring row loss at log(2) even for a perfect
    # embedding; with masking the floor is strictly below that
    scale = float(jnp.sum(q * q, axis=1).max())
    unmasked_floor = N * np.log(2.0)
    assert loss < unmasked_floor + 1e-6 or scale < 1.0


def test_queue_divisibility_fails_fast():
    cfg = TrainConfig(
        encoder=EncoderConfig(input_size=16, hidden_size=8, output_size=8,
                              num_layers=1),
        queue_size=20,  # not a multiple of micro_batch
        micro_batch=8,
        accum_steps=1,
    )
    feat = HashEmbedFeaturizer(
        FeaturizerConfig(dim=16, max_len=8, vocab_buckets=1 << 10)
    )
    with pytest.raises(ValueError, match="queue_size"):
        make_train_step(cfg, feat)


def test_bfloat16_step_with_default_encoder_runs():
    cfg = TrainConfig(
        encoder=EncoderConfig(input_size=16, hidden_size=8, output_size=8,
                              num_layers=1, masked_mean=False),
        queue_size=16,
        queue_start_steps=1,
        micro_batch=8,
        accum_steps=2,
        compute_dtype="bfloat16",
    )
    feat = HashEmbedFeaturizer(
        FeaturizerConfig(dim=16, max_len=8, vocab_buckets=1 << 10)
    )
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, feat)
    rng = np.random.default_rng(0)
    shape = (cfg.accum_steps, cfg.micro_batch, feat.config.max_len)
    ids = jnp.asarray(rng.integers(0, 1 << 10, size=shape).astype(np.int32))
    mask = jnp.ones(shape, jnp.float32)
    state, loss, _ = step(state, ids, mask, ids, mask, None)
    assert np.isfinite(float(loss))
    assert state.queue.dtype == jnp.float32
