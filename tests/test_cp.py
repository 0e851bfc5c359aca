"""Context parallelism (ring attention) == single-device.

`parallel/cp.py` shards the SEQUENCE over a "seq" mesh axis and runs
attention as blockwise ring attention (`ops/ring_attention.py`). These
tests prove, on the virtual 8-device CPU mesh, that the sharded program
computes the same numbers as the plain single-device verdict model —
forward logits, then losses AND final params over real AdamW-style steps.
The reference has no long-context or distributed capability at all
(SURVEY.md §2.2/§5); the parity oracle is our own single-device path.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ircl_tpu.models.transformer import TransformerConfig
from ircl_tpu.parallel.cp import (
    make_cp_mesh,
    make_cp_verdict_forward,
    make_cp_verdict_train_step,
)
from ircl_tpu.verdict.model import (
    VerdictConfig,
    init_verdict_params,
    verdict_apply,
)

B, L, VOCAB = 4, 64, 97


def _cfg(**enc_overrides):
    enc = TransformerConfig(
        vocab_size=VOCAB,
        hidden=16,
        layers=2,
        heads=2,
        intermediate=32,
        max_positions=L,
        **enc_overrides,
    )
    return VerdictConfig(encoder=enc, max_length=L)


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, VOCAB, size=(B, L)).astype(np.int32)
    # ragged real lengths so the pad bias differs per row and crosses
    # sequence-shard boundaries (shards hold L/n_seq tokens each)
    lens = rng.integers(L // 3, L + 1, size=B)
    mask = (np.arange(L)[None, :] < lens[:, None]).astype(np.float32)
    types = (rng.random((B, L)) < 0.5).astype(np.int32)
    labels = rng.integers(0, 2, size=B).astype(np.int32)
    return ids, mask, types, labels


@pytest.mark.parametrize("data,seq", [(1, 4), (2, 4), (1, 8)])
def test_cp_forward_matches_single_device(data, seq):
    cfg = _cfg()
    params = init_verdict_params(jax.random.PRNGKey(0), cfg)
    ids, mask, types, _ = _batch()
    want = np.asarray(verdict_apply(params, cfg, ids, mask, types))

    mesh = make_cp_mesh(seq=seq, data=data)
    fwd = make_cp_verdict_forward(cfg, mesh)
    got = np.asarray(fwd(params, ids, mask, types))
    # online softmax reassociates the f32 reductions; everything else is
    # the identical code path (transformer_block with seq_axis set)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_cp_train_matches_single_device():
    """3 Adam steps: per-step losses AND final params equal the plain
    single-device training on the identical global batch."""
    cfg = _cfg()
    params0 = init_verdict_params(jax.random.PRNGKey(1), cfg)
    tx = optax.adam(1e-3)

    def loss_fn(p, ids, mask, types, labels):
        logits = verdict_apply(p, cfg, ids, mask, types)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()

    @jax.jit
    def ref_step(p, o, ids, mask, types, labels):
        loss, g = jax.value_and_grad(loss_fn)(p, ids, mask, types, labels)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    mesh = make_cp_mesh(seq=4, data=2)
    cp_step, _ = make_cp_verdict_train_step(cfg, mesh, tx)

    p_ref, o_ref = params0, tx.init(params0)
    p_cp, o_cp = params0, tx.init(params0)
    for s in range(3):
        ids, mask, types, labels = _batch(seed=10 + s)
        p_ref, o_ref, l_ref = ref_step(p_ref, o_ref, ids, mask, types, labels)
        p_cp, o_cp, l_cp = cp_step(p_cp, o_cp, ids, mask, types, labels)
        np.testing.assert_allclose(
            float(l_cp), float(l_ref), rtol=2e-5,
            err_msg=f"loss diverged at step {s}",
        )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6
        ),
        p_cp,
        p_ref,
    )


def test_cp_rejects_moe_and_flash():
    from ircl_tpu.models.moe import MoEConfig

    mesh = make_cp_mesh(seq=4, data=2)
    with pytest.raises(ValueError, match="MoE"):
        make_cp_verdict_forward(
            _cfg(moe=MoEConfig(num_experts=2, capacity_factor=2.0)), mesh
        )
    with pytest.raises(ValueError, match="flash"):
        make_cp_verdict_forward(_cfg(attention="flash"), mesh)


def test_ring_attention_primitive_matches_local_softmax():
    """The primitive alone, outside the transformer: ring over 4 shards ==
    plain masked softmax attention on the gathered sequence."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ircl_tpu.ops.ring_attention import ring_attention

    rng = np.random.default_rng(3)
    Bq, H, Lf, D = 2, 2, 32, 8
    q = rng.normal(size=(Bq, H, Lf, D)).astype(np.float32)
    k = rng.normal(size=(Bq, H, Lf, D)).astype(np.float32)
    v = rng.normal(size=(Bq, H, Lf, D)).astype(np.float32)
    mask = (rng.random((Bq, Lf)) < 0.8).astype(np.float32)
    bias = (1.0 - mask[:, None, None, :]) * -1e9

    logits = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(D) + bias
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    want = np.einsum("bhqk,bhkd->bhqd", np.asarray(probs), v)

    mesh = make_cp_mesh(seq=4, data=1)
    spec = P(None, None, "seq", None)
    fn = jax.jit(
        shard_map(
            partial(ring_attention, axis_name="seq"),
            mesh=mesh,
            in_specs=(spec, spec, spec, P(None, None, None, "seq")),
            out_specs=spec,
        )
    )
    got = np.asarray(fn(q, k, v, bias))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
