"""Sharded checkpoint/resume (utils/checkpoint.py save_sharded/restore_sharded).

Multi-chip training must survive interruption without a host gather and
resume onto a possibly different mesh layout:

- TP(4) x DP(2): train 2 steps -> save sharded -> restore into the same
  shardings -> 1 more step == 3 uninterrupted steps (params bit-close).
- Elastic resume: the same checkpoint restores onto a TP(2) x DP(4) mesh
  (orbax reshards on read) and continues to the identical result.
- Restored leaves carry the requested shardings (physically sharded).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ircl_tpu.models.transformer import TransformerConfig
from ircl_tpu.parallel.tp import (
    init_sharded_opt_state,
    make_tp_mesh,
    shard_batch,
    shard_tree,
    verdict_param_specs,
)
from ircl_tpu.utils.checkpoint import restore_sharded, save_sharded
from ircl_tpu.verdict.model import (
    VerdictConfig,
    init_verdict_params,
    make_verdict_train_step,
)

CFG = VerdictConfig(
    encoder=TransformerConfig(
        vocab_size=64, hidden=16, layers=2, heads=4, intermediate=32,
        max_positions=16,
    ),
    warmup_steps=0, total_steps=100, freeze_body_until_warmup=False,
    max_length=16,
)


def _batch(seed, B=8, L=16):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(0, 64, size=(B, L)).astype(np.int32),
        np.ones((B, L), np.float32),
        np.zeros((B, L), np.int32),
        rng.integers(0, 2, size=(B,)).astype(np.int32),
    )


def _run(step, params, opt_state, mesh, batches, start=0):
    for i, b in enumerate(batches):
        params, opt_state, loss, _ = step(
            params, opt_state, jnp.asarray(start + i), *shard_batch(mesh, *b)
        )
    return params, opt_state, float(loss)


def test_sharded_save_restore_resumes_training(tmp_path):
    assert len(jax.devices()) == 8
    step, tx = make_verdict_train_step(CFG)
    params0 = init_verdict_params(jax.random.PRNGKey(0), CFG)
    specs = verdict_param_specs(params0)
    batches = [_batch(s) for s in range(3)]

    # uninterrupted 3 steps on TP(4) x DP(2)
    mesh = make_tp_mesh(model=4, data=2)
    p = shard_tree(jax.tree.map(jnp.array, params0), specs, mesh)
    o = init_sharded_opt_state(tx, p, mesh, specs)
    p_full, o_full, loss_full = _run(step, p, o, mesh, batches)

    # 2 steps -> sharded save (no host gather) -> restore -> 1 more step
    p = shard_tree(jax.tree.map(jnp.array, params0), specs, mesh)
    o = init_sharded_opt_state(tx, p, mesh, specs)
    p2, o2, _ = _run(step, p, o, mesh, batches[:2])
    path = save_sharded(str(tmp_path / "ckpt"), {"params": p2, "opt": o2})

    restored = restore_sharded(path, {"params": p2, "opt": o2})
    # restored leaves carry the exact requested shardings
    w = restored["params"]["body"]["layers"][0]["ff1"]["w"]
    assert {s.data.shape for s in w.addressable_shards} == {(16, 8)}
    p3, _, loss3 = _run(
        step, restored["params"], restored["opt"], mesh, batches[2:], start=2
    )
    np.testing.assert_allclose(loss3, loss_full, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p3), jax.tree.leaves(p_full)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
        )

    # elastic resume: same checkpoint onto a DIFFERENT mesh layout
    mesh2 = make_tp_mesh(model=2, data=4)
    p_t = shard_tree(jax.tree.map(jnp.array, params0), specs, mesh2)
    o_t = init_sharded_opt_state(tx, p_t, mesh2, specs)
    restored2 = restore_sharded(path, {"params": p_t, "opt": o_t})
    w2 = restored2["params"]["body"]["layers"][0]["ff1"]["w"]
    assert {s.data.shape for s in w2.addressable_shards} == {(16, 16)}  # 32/2
    p4, _, loss4 = _run(
        step, restored2["params"], restored2["opt"], mesh2, batches[2:], start=2
    )
    np.testing.assert_allclose(loss4, loss_full, rtol=2e-5)
    for a, b in zip(jax.tree.leaves(p4), jax.tree.leaves(p_full)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6
        )


def test_pp_sharded_save_restore_resumes_training(tmp_path):
    """PP(2) x DP(2): stage-stacked params save sharded (no host gather)
    and resume to the uninterrupted result; restack_pp_params re-partitions
    the checkpoint's stacking onto a different stage count for elastic
    resume."""
    from ircl_tpu.parallel.pp import (
        make_pp_mesh,
        make_pp_verdict_train_step,
        pp_verdict_params,
        pp_verdict_specs,
        restack_pp_params,
        verdict_params_from_pp,
    )

    S, M = 2, 4  # CFG's encoder has 2 layers -> 2 stages max
    mesh = make_pp_mesh(S, data=2)
    step, tx = make_pp_verdict_train_step(CFG, mesh, n_micro=M)
    params0 = init_verdict_params(jax.random.PRNGKey(4), CFG)
    pp0 = pp_verdict_params(params0, S)
    specs = pp_verdict_specs(pp0)
    batches = [_batch(s + 20) for s in range(3)]

    p = shard_tree(jax.tree.map(jnp.array, pp0), specs, mesh)
    o = init_sharded_opt_state(tx, p, mesh, specs)
    p_full, o_full, loss_full = _run(step, p, o, mesh, batches)

    p = shard_tree(jax.tree.map(jnp.array, pp0), specs, mesh)
    o = init_sharded_opt_state(tx, p, mesh, specs)
    p2, o2, _ = _run(step, p, o, mesh, batches[:2])
    path = save_sharded(str(tmp_path / "ppckpt"), {"params": p2, "opt": o2})

    restored = restore_sharded(path, {"params": p2, "opt": o2})
    w = restored["params"]["stages"]["ff1"]["w"]  # [2, 1, 16, 32] P("stage")
    assert {s.data.shape for s in w.addressable_shards} == {(1, 1, 16, 32)}
    # elastic stage count (checked BEFORE the resume step donates the
    # restored tree): re-partition the S=2 checkpoint onto a single stage
    # and verify layer order/values survive the [2,1,...] -> [1,2,...]
    # restack (the reshape-order bug an elastic resume would hit)
    from ircl_tpu.parallel.pp import unstack_layer_params

    restacked = restack_pp_params(restored["params"], 1)
    assert restacked["stages"]["ff1"]["w"].shape == (1, 2, 16, 32)
    for la, lb in zip(
        unstack_layer_params(restacked["stages"]),
        unstack_layer_params(restored["params"]["stages"]),
    ):
        for a, b in zip(jax.tree.leaves(la), jax.tree.leaves(lb)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert verdict_params_from_pp(restacked)["body"]["layers"]  # layout ok

    p3, _, loss3 = _run(
        step, restored["params"], restored["opt"], mesh, batches[2:], start=2
    )
    np.testing.assert_allclose(loss3, loss_full, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p3), jax.tree.leaves(p_full)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
        )
