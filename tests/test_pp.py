"""Pipeline-parallel training/inference == single-device (parallel/pp.py).

The GPipe schedule (stacked stage weights, ppermute shifts, AD-derived
backward pipeline) must be semantics-free: same blocks, same order, batch
elements independent — so PP(S) with M microbatches reproduces the
unsharded forward and the full AdamW train step up to f32 reordering.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ircl_tpu.models.transformer import (
    TransformerConfig,
    init_transformer_params,
    transformer_apply,
)
from ircl_tpu.parallel.pp import (
    make_pp_mesh,
    make_pp_transformer_apply,
    make_pp_verdict_train_step,
    pp_verdict_params,
    pp_verdict_specs,
    stack_layer_params,
    unstack_layer_params,
)
from ircl_tpu.parallel.tp import init_sharded_opt_state, shard_tree
from ircl_tpu.verdict.model import (
    VerdictConfig,
    init_verdict_params,
    make_verdict_train_step,
)

TCFG = TransformerConfig(
    vocab_size=64, hidden=16, layers=4, heads=4, intermediate=32,
    max_positions=16,
)
VCFG = VerdictConfig(
    encoder=TCFG, warmup_steps=0, total_steps=100,
    freeze_body_until_warmup=False, max_length=16,
)


def _batch(seed, B=8, L=16):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, 64, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), np.float32)
    mask[:, L - 2:] = 0.0  # real pad tokens so the bias path is exercised
    types = np.zeros((B, L), np.int32)
    labels = rng.integers(0, 2, size=(B,)).astype(np.int32)
    return ids, mask, types, labels


def test_stack_roundtrip():
    params = init_transformer_params(jax.random.PRNGKey(0), TCFG)
    stacked = stack_layer_params(params["layers"], 2)
    assert stacked["q"]["w"].shape == (2, 2, 16, 16)
    back = unstack_layer_params(stacked)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(params["layers"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError):
        stack_layer_params(params["layers"], 3)


@pytest.mark.parametrize("stages,n_micro", [(4, 4), (2, 8), (8, 2)])
def test_pp_forward_matches_single_device(stages, n_micro):
    assert len(jax.devices()) == 8
    if TCFG.layers % stages:
        pytest.skip("layers not divisible")
    params = init_transformer_params(jax.random.PRNGKey(1), TCFG)
    ids, mask, types, _ = _batch(7, B=16)
    ref = np.asarray(
        jax.jit(lambda p, i, m, t: transformer_apply(p, TCFG, i, m, t))(
            params, ids, mask, types
        )
    )
    mesh = make_pp_mesh(stages)
    apply = make_pp_transformer_apply(TCFG, mesh, n_micro=n_micro)
    embed = {k: v for k, v in params.items() if k != "layers"}
    stacked = shard_tree(
        stack_layer_params(params["layers"], stages),
        jax.tree.map(lambda _: jax.sharding.PartitionSpec("stage"),
                     stack_layer_params(params["layers"], stages)),
        mesh,
    )
    got = np.asarray(jax.jit(apply)(embed, stacked, ids, mask, types))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("remat", [False, True])
def test_pp_train_matches_single_device(remat):
    """3 AdamW steps: losses and every final param leaf match the
    single-device verdict step (stacked leaves compared layer-by-layer)."""
    step_ref, tx_ref = make_verdict_train_step(VCFG)
    params0 = init_verdict_params(jax.random.PRNGKey(2), VCFG)
    batches = [_batch(s, B=8) for s in range(3)]

    p_ref = jax.tree.map(jnp.array, params0)
    o_ref = tx_ref.init(p_ref)
    losses_ref = []
    for i, (ids, mask, types, labels) in enumerate(batches):
        p_ref, o_ref, loss, _ = step_ref(
            p_ref, o_ref, jnp.asarray(i), ids, mask, types, labels
        )
        losses_ref.append(float(loss))

    S, M = 4, 4
    mesh = make_pp_mesh(S)
    step_pp, tx_pp = make_pp_verdict_train_step(VCFG, mesh, n_micro=M, remat=remat)
    pp0 = pp_verdict_params(jax.tree.map(jnp.array, params0), S)
    specs = pp_verdict_specs(pp0)
    p_pp = shard_tree(pp0, specs, mesh)
    o_pp = init_sharded_opt_state(tx_pp, p_pp, mesh, specs)
    losses_pp = []
    for i, (ids, mask, types, labels) in enumerate(batches):
        p_pp, o_pp, loss, _ = step_pp(
            p_pp, o_pp, jnp.asarray(i), ids, mask, types, labels
        )
        losses_pp.append(float(loss))

    np.testing.assert_allclose(losses_pp, losses_ref, rtol=2e-5, atol=2e-6)
    got_layers = unstack_layer_params(p_pp["stages"])
    for got, ref in zip(got_layers, p_ref["body"]["layers"]):
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6
            )
    for key in ("head_dense", "head_out"):
        for a, b in zip(
            jax.tree.leaves(p_pp[key]), jax.tree.leaves(p_ref[key])
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6
            )


def test_pp_dp_train_matches_single_device():
    """PP(4) x DP(2) on a ("data", "stage") mesh: two pipeline replicas
    with microbatch elements sharded over "data"; GSPMD adds the gradient
    psum. Must reproduce single-device losses AND final params."""
    from ircl_tpu.parallel.tp import shard_batch

    step_ref, tx_ref = make_verdict_train_step(VCFG)
    params0 = init_verdict_params(jax.random.PRNGKey(6), VCFG)
    batches = [_batch(s + 40, B=8) for s in range(3)]

    p_ref = jax.tree.map(jnp.array, params0)
    o_ref = tx_ref.init(p_ref)
    losses_ref = []
    for i, (ids, mask, types, labels) in enumerate(batches):
        p_ref, o_ref, loss, _ = step_ref(
            p_ref, o_ref, jnp.asarray(i), ids, mask, types, labels
        )
        losses_ref.append(float(loss))

    S, M = 4, 4
    mesh = make_pp_mesh(S, data=2)
    step_pp, tx_pp = make_pp_verdict_train_step(VCFG, mesh, n_micro=M)
    pp0 = pp_verdict_params(jax.tree.map(jnp.array, params0), S)
    specs = pp_verdict_specs(pp0)
    p_pp = shard_tree(pp0, specs, mesh)
    o_pp = init_sharded_opt_state(tx_pp, p_pp, mesh, specs)
    losses_pp = []
    for i, (ids, mask, types, labels) in enumerate(batches):
        ids, mask, types, labels = shard_batch(mesh, ids, mask, types, labels)
        p_pp, o_pp, loss, _ = step_pp(
            p_pp, o_pp, jnp.asarray(i), ids, mask, types, labels
        )
        losses_pp.append(float(loss))

    np.testing.assert_allclose(losses_pp, losses_ref, rtol=2e-5, atol=2e-6)
    got_layers = unstack_layer_params(p_pp["stages"])
    for got, ref in zip(got_layers, p_ref["body"]["layers"]):
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6
            )


def test_pp_stage_params_actually_sharded():
    mesh = make_pp_mesh(4)
    params = init_verdict_params(jax.random.PRNGKey(3), VCFG)
    pp = pp_verdict_params(params, 4)
    p = shard_tree(pp, pp_verdict_specs(pp), mesh)
    w = p["stages"]["ff1"]["w"]  # [4, 1, 16, 32] stage-sharded
    assert {s.data.shape for s in w.addressable_shards} == {(1, 1, 16, 32)}
    # Adam moments inherit the stage sharding
    import optax

    tx = optax.adamw(1e-4)
    o = init_sharded_opt_state(tx, p, mesh, pp_verdict_specs(pp))
    mu = o[0].mu["stages"]["ff1"]["w"]
    assert {s.data.shape for s in mu.addressable_shards} == {(1, 1, 16, 32)}


# ---------------------------------------------------------------------------
# MoE blocks through the pipeline (stats-accumulated aux)
# ---------------------------------------------------------------------------

import dataclasses

from ircl_tpu.models.moe import MoEConfig
from ircl_tpu.models.transformer import transformer_apply_with_aux

# default capacity_factor=1.25 keeps capacity drops in play: routing groups
# are batch rows, so drops are microbatch-invariant and parity still holds
MOE_TCFG = dataclasses.replace(TCFG, moe=MoEConfig(num_experts=4, top_k=2))
MOE_VCFG = dataclasses.replace(VCFG, encoder=MOE_TCFG)


def test_pp_moe_forward_matches_single_device():
    """PP(4) over MoE blocks: hidden state AND the load-balance aux match
    the single-device transformer_apply_with_aux (stats accumulated across
    microbatches reproduce the global routing sums)."""
    params = init_transformer_params(jax.random.PRNGKey(11), MOE_TCFG)
    ids, mask, types, _ = _batch(17, B=16)
    ref_h, ref_aux = jax.jit(
        lambda p, i, m, t: transformer_apply_with_aux(p, MOE_TCFG, i, m, t)
    )(params, ids, mask, types)

    S, M = 4, 4
    mesh = make_pp_mesh(S)
    apply = make_pp_transformer_apply(MOE_TCFG, mesh, n_micro=M)
    embed = {k: v for k, v in params.items() if k != "layers"}
    stacked0 = stack_layer_params(params["layers"], S)
    stacked = shard_tree(
        stacked0,
        jax.tree.map(
            lambda _: jax.sharding.PartitionSpec("stage"), stacked0
        ),
        mesh,
    )
    got_h, got_aux = jax.jit(apply)(embed, stacked, ids, mask, types)
    np.testing.assert_allclose(
        np.asarray(got_h), np.asarray(ref_h), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(float(got_aux), float(ref_aux), rtol=1e-5)


def test_pp_dp_moe_train_matches_single_device():
    """PP(2) x DP(2) with MoE blocks: 3 AdamW steps reproduce the
    single-device losses (CE + aux) and final params — the routing-stat
    psum over "data" plus the per-stage layer aux sum recover the exact
    global load-balance loss."""
    from ircl_tpu.parallel.tp import shard_batch

    step_ref, tx_ref = make_verdict_train_step(MOE_VCFG)
    params0 = init_verdict_params(jax.random.PRNGKey(12), MOE_VCFG)
    batches = [_batch(s + 60, B=8) for s in range(3)]

    p_ref = jax.tree.map(jnp.array, params0)
    o_ref = tx_ref.init(p_ref)
    losses_ref = []
    for i, (ids, mask, types, labels) in enumerate(batches):
        p_ref, o_ref, loss, _ = step_ref(
            p_ref, o_ref, jnp.asarray(i), ids, mask, types, labels
        )
        losses_ref.append(float(loss))

    S, M = 2, 4
    mesh = make_pp_mesh(S, data=2)
    step_pp, tx_pp = make_pp_verdict_train_step(MOE_VCFG, mesh, n_micro=M)
    pp0 = pp_verdict_params(jax.tree.map(jnp.array, params0), S)
    specs = pp_verdict_specs(pp0)
    p_pp = shard_tree(pp0, specs, mesh)
    o_pp = init_sharded_opt_state(tx_pp, p_pp, mesh, specs)
    losses_pp = []
    for i, (ids, mask, types, labels) in enumerate(batches):
        ids, mask, types, labels = shard_batch(mesh, ids, mask, types, labels)
        p_pp, o_pp, loss, _ = step_pp(
            p_pp, o_pp, jnp.asarray(i), ids, mask, types, labels
        )
        losses_pp.append(float(loss))

    np.testing.assert_allclose(losses_pp, losses_ref, rtol=2e-5, atol=2e-6)
    got_layers = unstack_layer_params(p_pp["stages"])
    for got, ref in zip(got_layers, p_ref["body"]["layers"]):
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6
            )


# ---------------------------------------------------------------------------
# TP / EP inside the pipeline stages (explicit psum collectives)
# ---------------------------------------------------------------------------


def test_pp_tp_dp_train_matches_single_device():
    """PP(2) x TP(2) x DP(2) on a ("data", "stage", "model") mesh: the
    stage weights are Megatron-sharded and the block issues the two
    all-reduces as explicit psum("model") inside the GPipe shard_map.
    3 AdamW steps must reproduce single-device losses AND final params."""
    from ircl_tpu.parallel.tp import shard_batch

    step_ref, tx_ref = make_verdict_train_step(VCFG)
    params0 = init_verdict_params(jax.random.PRNGKey(21), VCFG)
    batches = [_batch(s + 80, B=8) for s in range(3)]

    p_ref = jax.tree.map(jnp.array, params0)
    o_ref = tx_ref.init(p_ref)
    losses_ref = []
    for i, (ids, mask, types, labels) in enumerate(batches):
        p_ref, o_ref, loss, _ = step_ref(
            p_ref, o_ref, jnp.asarray(i), ids, mask, types, labels
        )
        losses_ref.append(float(loss))

    S, M = 2, 4
    mesh = make_pp_mesh(S, data=2, model=2)
    assert mesh.axis_names == ("data", "stage", "model")
    step_pp, tx_pp = make_pp_verdict_train_step(VCFG, mesh, n_micro=M)
    pp0 = pp_verdict_params(jax.tree.map(jnp.array, params0), S)
    specs = pp_verdict_specs(pp0, mesh)
    p_pp = shard_tree(pp0, specs, mesh)
    # the Megatron layout is physically real: ff1 w [S, per, h, i] splits
    # its columns over "model"
    w = p_pp["stages"]["ff1"]["w"]
    assert {s.data.shape for s in w.addressable_shards} == {(1, 2, 16, 16)}
    o_pp = init_sharded_opt_state(tx_pp, p_pp, mesh, specs)
    losses_pp = []
    for i, (ids, mask, types, labels) in enumerate(batches):
        ids, mask, types, labels = shard_batch(mesh, ids, mask, types, labels)
        p_pp, o_pp, loss, _ = step_pp(
            p_pp, o_pp, jnp.asarray(i), ids, mask, types, labels
        )
        losses_pp.append(float(loss))

    np.testing.assert_allclose(losses_pp, losses_ref, rtol=2e-5, atol=2e-6)
    got_layers = unstack_layer_params(p_pp["stages"])
    for got, ref in zip(got_layers, p_ref["body"]["layers"]):
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6
            )


def test_pp_ep_dp_moe_train_matches_single_device():
    """PP(2) x EP(2) x DP(2) with MoE blocks: each stage shard runs its
    local experts on replicated activations (sliced dispatch/combine;
    psum("expert") completes the combine). Losses (CE + aux) and final
    params must match single-device."""
    from ircl_tpu.parallel.tp import shard_batch

    step_ref, tx_ref = make_verdict_train_step(MOE_VCFG)
    params0 = init_verdict_params(jax.random.PRNGKey(22), MOE_VCFG)
    batches = [_batch(s + 90, B=8) for s in range(3)]

    p_ref = jax.tree.map(jnp.array, params0)
    o_ref = tx_ref.init(p_ref)
    losses_ref = []
    for i, (ids, mask, types, labels) in enumerate(batches):
        p_ref, o_ref, loss, _ = step_ref(
            p_ref, o_ref, jnp.asarray(i), ids, mask, types, labels
        )
        losses_ref.append(float(loss))

    S, M = 2, 4
    mesh = make_pp_mesh(S, data=2, expert=2)
    assert mesh.axis_names == ("data", "stage", "expert")
    step_pp, tx_pp = make_pp_verdict_train_step(MOE_VCFG, mesh, n_micro=M)
    pp0 = pp_verdict_params(jax.tree.map(jnp.array, params0), S)
    specs = pp_verdict_specs(pp0, mesh)
    p_pp = shard_tree(pp0, specs, mesh)
    # expert weights physically split: moe ff1 w [S, per, E=4, h, i]
    w = p_pp["stages"]["moe"]["ff1"]["w"]
    assert {s.data.shape for s in w.addressable_shards} == {(1, 2, 2, 16, 32)}
    o_pp = init_sharded_opt_state(tx_pp, p_pp, mesh, specs)
    losses_pp = []
    for i, (ids, mask, types, labels) in enumerate(batches):
        ids, mask, types, labels = shard_batch(mesh, ids, mask, types, labels)
        p_pp, o_pp, loss, _ = step_pp(
            p_pp, o_pp, jnp.asarray(i), ids, mask, types, labels
        )
        losses_pp.append(float(loss))

    np.testing.assert_allclose(losses_pp, losses_ref, rtol=2e-5, atol=2e-6)
    got_layers = unstack_layer_params(p_pp["stages"])
    for got, ref in zip(got_layers, p_ref["body"]["layers"]):
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6
            )


def test_pp_ep_tp_moe_train_matches_single_device():
    """Full 4-axis training mesh PP(2) x EP(2) x TP(2) (data axis present,
    size 1): Megatron TP over "model" inside each stage, experts sharded
    over "expert", GPipe over "stage" — losses (CE + aux) and final params
    must match single-device, leaf for leaf. This is the standard pod
    layout for a model of this shape; the forward-only variant is
    test_pp_ep_tp_moe_forward_matches_single_device."""
    from ircl_tpu.parallel.tp import shard_batch

    step_ref, tx_ref = make_verdict_train_step(MOE_VCFG)
    params0 = init_verdict_params(jax.random.PRNGKey(29), MOE_VCFG)
    batches = [_batch(s + 150, B=8) for s in range(3)]

    p_ref = jax.tree.map(jnp.array, params0)
    o_ref = tx_ref.init(p_ref)
    losses_ref = []
    for i, (ids, mask, types, labels) in enumerate(batches):
        p_ref, o_ref, loss, _ = step_ref(
            p_ref, o_ref, jnp.asarray(i), ids, mask, types, labels
        )
        losses_ref.append(float(loss))

    S, M = 2, 4
    mesh = make_pp_mesh(S, expert=2, model=2)
    assert mesh.axis_names == ("data", "stage", "expert", "model")
    step_pp, tx_pp = make_pp_verdict_train_step(MOE_VCFG, mesh, n_micro=M)
    pp0 = pp_verdict_params(jax.tree.map(jnp.array, params0), S)
    specs = pp_verdict_specs(pp0, mesh)
    p_pp = shard_tree(pp0, specs, mesh)
    o_pp = init_sharded_opt_state(tx_pp, p_pp, mesh, specs)
    losses_pp = []
    for i, (ids, mask, types, labels) in enumerate(batches):
        ids, mask, types, labels = shard_batch(mesh, ids, mask, types, labels)
        p_pp, o_pp, loss, _ = step_pp(
            p_pp, o_pp, jnp.asarray(i), ids, mask, types, labels
        )
        losses_pp.append(float(loss))

    np.testing.assert_allclose(losses_pp, losses_ref, rtol=2e-5, atol=2e-6)
    got_layers = unstack_layer_params(p_pp["stages"])
    for got, ref in zip(got_layers, p_ref["body"]["layers"]):
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6
            )


def test_pp_ep_tp_moe_forward_matches_single_device():
    """4-axis PP(2) x EP(2) x TP(2) forward over MoE blocks: attention TP
    over "model", experts over "expert", stages over "stage" — hidden
    state and aux match transformer_apply_with_aux."""
    params = init_transformer_params(jax.random.PRNGKey(23), MOE_TCFG)
    ids, mask, types, _ = _batch(27, B=16)
    ref_h, ref_aux = jax.jit(
        lambda p, i, m, t: transformer_apply_with_aux(p, MOE_TCFG, i, m, t)
    )(params, ids, mask, types)

    S, M = 2, 4
    mesh = make_pp_mesh(S, expert=2, model=2)
    assert mesh.axis_names == ("data", "stage", "expert", "model")
    apply = make_pp_transformer_apply(MOE_TCFG, mesh, n_micro=M)
    embed = {k: v for k, v in params.items() if k != "layers"}
    stacked0 = stack_layer_params(params["layers"], S)
    from ircl_tpu.parallel.pp import stacked_stage_specs

    stacked = shard_tree(
        stacked0, stacked_stage_specs(moe=True, tp=True, ep=True), mesh
    )
    got_h, got_aux = jax.jit(apply)(embed, stacked, ids, mask, types)
    np.testing.assert_allclose(
        np.asarray(got_h), np.asarray(ref_h), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(float(got_aux), float(ref_aux), rtol=1e-5)


def test_pp_mesh_validates_divisibility():
    mesh = make_pp_mesh(2, model=2)
    bad = TransformerConfig(
        vocab_size=64, hidden=18, layers=4, heads=3, intermediate=32,
        max_positions=16,
    )
    with pytest.raises(ValueError, match="heads"):
        make_pp_transformer_apply(bad, mesh, n_micro=2)
    with pytest.raises(ValueError, match="expert"):
        make_pp_transformer_apply(
            TCFG, make_pp_mesh(2, expert=2), n_micro=2
        )
