"""Tensor-parallel verdict training == single-device training.

The TP layout (``parallel/tp.py``) must be semantics-free: the jitted
verdict train step run over a ("data", "model") mesh with Megatron-sharded
weights has to reproduce the unsharded single-device step — GSPMD inserts
the attention-o / ff2 all-reduces and the DP gradient psum, and none of it
may change the math beyond f32 reduction reordering.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ircl_tpu.models.transformer import TransformerConfig
from ircl_tpu.parallel.tp import (
    init_sharded_opt_state,
    make_tp_mesh,
    shard_batch,
    shard_tree,
    verdict_param_specs,
)
from ircl_tpu.verdict.model import (
    VerdictConfig,
    init_verdict_params,
    make_verdict_train_step,
    verdict_predict,
)

CFG = VerdictConfig(
    encoder=TransformerConfig(
        vocab_size=64,
        hidden=16,
        layers=2,
        heads=4,  # divisible by the model axis (4)
        intermediate=32,
        max_positions=16,
    ),
    warmup_steps=0,
    total_steps=100,
    freeze_body_until_warmup=False,
    max_length=16,
)


def _batch(seed, B=8, L=16):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, 64, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), np.float32)
    types = np.zeros((B, L), np.int32)
    labels = rng.integers(0, 2, size=(B,)).astype(np.int32)
    return ids, mask, types, labels


def _train(params, opt_state, step, batches, shard=None):
    losses = []
    for i, (ids, mask, types, labels) in enumerate(batches):
        if shard is not None:
            ids, mask, types, labels = shard(ids, mask, types, labels)
        params, opt_state, loss, _ = step(
            params, opt_state, jnp.asarray(i), ids, mask, types, labels
        )
        losses.append(float(loss))
    return params, losses


def test_tp_dp_matches_single_device():
    assert len(jax.devices()) == 8
    step, tx = make_verdict_train_step(CFG)
    params0 = init_verdict_params(jax.random.PRNGKey(0), CFG)
    batches = [_batch(s) for s in range(3)]

    # single device reference
    p_ref, losses_ref = _train(
        jax.tree.map(jnp.array, params0), tx.init(params0), step, batches
    )

    # TP(4) x DP(2)
    mesh = make_tp_mesh(model=4, data=2)
    specs = verdict_param_specs(params0)
    p_tp = shard_tree(jax.tree.map(jnp.array, params0), specs, mesh)
    o_tp = init_sharded_opt_state(tx, p_tp, mesh, specs)
    p_tp, losses_tp = _train(
        p_tp, o_tp, step, batches, shard=lambda *a: shard_batch(mesh, *a)
    )

    np.testing.assert_allclose(losses_tp, losses_ref, rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree.leaves(p_tp), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6
        )


def test_tp_sp_matches_single_device():
    """Sequence parallelism (make_sp_constrainer) is one GSPMD annotation on
    the inter-block activations — it must not change the math: TP(4) x DP(2)
    with SP reproduces the single-device training run."""
    from ircl_tpu.parallel.tp import make_sp_constrainer

    step_ref, tx = make_verdict_train_step(CFG)
    params0 = init_verdict_params(jax.random.PRNGKey(4), CFG)
    batches = [_batch(s + 20) for s in range(3)]
    p_ref, losses_ref = _train(
        jax.tree.map(jnp.array, params0), tx.init(params0), step_ref, batches
    )

    mesh = make_tp_mesh(model=4, data=2)
    step_sp, _ = make_verdict_train_step(CFG, constrain=make_sp_constrainer(mesh))
    specs = verdict_param_specs(params0)
    p_sp = shard_tree(jax.tree.map(jnp.array, params0), specs, mesh)
    o_sp = init_sharded_opt_state(tx, p_sp, mesh, specs)
    p_sp, losses_sp = _train(
        p_sp, o_sp, step_sp, batches, shard=lambda *a: shard_batch(mesh, *a)
    )

    np.testing.assert_allclose(losses_sp, losses_ref, rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree.leaves(p_sp), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6
        )


def test_tp_params_actually_sharded():
    mesh = make_tp_mesh(model=4, data=2)
    params = init_verdict_params(jax.random.PRNGKey(1), CFG)
    p = shard_tree(params, verdict_param_specs(params), mesh)
    w = p["body"]["layers"][0]["ff1"]["w"]  # [16, 32] column-sharded
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    assert shard_shapes == {(16, 8)}, shard_shapes  # 32 / model(4)
    wo = p["body"]["layers"][0]["o"]["w"]  # [16, 16] row-sharded
    assert {s.data.shape for s in wo.addressable_shards} == {(4, 16)}
    # optimizer moments inherit the layout
    import optax

    tx = optax.adamw(1e-4)
    o = init_sharded_opt_state(tx, p, mesh, verdict_param_specs(params))
    mu_w = o[0].mu["body"]["layers"][0]["ff1"]["w"]
    assert {s.data.shape for s in mu_w.addressable_shards} == {(16, 8)}


def test_tp_predict_matches():
    mesh = make_tp_mesh(model=4, data=2)
    params = init_verdict_params(jax.random.PRNGKey(2), CFG)
    ids, mask, types, _ = _batch(9)
    ref = np.asarray(verdict_predict(params, CFG, ids, mask, types))
    p = shard_tree(params, verdict_param_specs(params), mesh)
    got = np.asarray(
        verdict_predict(p, CFG, *shard_batch(mesh, ids, mask, types))
    )
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_tp_transformer_featurizer_inference_matches():
    """transformer_param_specs applies to any transformer params tree — the
    frozen TransformerFeaturizer body included: TP-sharded transformer_apply
    must reproduce the single-device last hidden state (pod-scale corpus
    embedding with a sharded frozen featurizer)."""
    from ircl_tpu.models.transformer import (
        init_transformer_params,
        transformer_apply,
    )
    from ircl_tpu.parallel.tp import transformer_param_specs

    tcfg = CFG.encoder
    params = init_transformer_params(jax.random.PRNGKey(5), tcfg)
    ids, mask, types, _ = _batch(3)
    ref = np.asarray(
        jax.jit(lambda p, i, m: transformer_apply(p, tcfg, i, m))(
            params, ids, mask
        )
    )
    mesh = make_tp_mesh(model=4, data=2)
    p_tp = shard_tree(params, transformer_param_specs(params), mesh)
    got = np.asarray(
        jax.jit(lambda p, i, m: transformer_apply(p, tcfg, i, m))(
            p_tp, *shard_batch(mesh, ids, mask)
        )
    )
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)
