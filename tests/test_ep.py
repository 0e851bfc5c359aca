"""MoE FFN + expert parallelism (models/moe.py, parallel/ep.py).

Pins: (1) the MoE layer reduces to the dense FFN at E=1/top_k=1 (the
dense-dispatch machinery is semantics-free); (2) routing respects the
capacity limit and never double-books a slot; (3) the load-balance aux
behaves (1.0 balanced, ~E collapsed); (4) EP(4) x DP(2) training over a
("data", "expert") mesh == single-device training (losses AND final
params — the all-to-alls GSPMD inserts may not change the math);
(5) expert weights and their Adam moments are physically sharded.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ircl_tpu.models.moe import (
    MoEConfig,
    init_moe_ffn_params,
    moe_capacity,
    moe_ffn,
    moe_route,
)
from ircl_tpu.models.transformer import (
    TransformerConfig,
    init_transformer_params,
    transformer_apply,
    transformer_apply_with_aux,
)
from ircl_tpu.parallel.ep import (
    make_ep_constrainer,
    make_ep_mesh,
    moe_verdict_param_specs,
)
from ircl_tpu.parallel.tp import (
    init_sharded_opt_state,
    shard_batch,
    shard_tree,
)
from ircl_tpu.verdict.model import (
    VerdictConfig,
    init_verdict_params,
    make_verdict_train_step,
)

MOE = MoEConfig(num_experts=4, top_k=2, capacity_factor=2.0)
ENC = TransformerConfig(
    vocab_size=64, hidden=16, layers=2, heads=4, intermediate=32,
    max_positions=16, moe=MOE,
)
CFG = VerdictConfig(
    encoder=ENC, warmup_steps=0, total_steps=100,
    freeze_body_until_warmup=False, max_length=16,
)


def _batch(seed, B=8, L=16):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, 64, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), np.float32)
    types = np.zeros((B, L), np.int32)
    labels = rng.integers(0, 2, size=(B,)).astype(np.int32)
    return ids, mask, types, labels


def test_moe_e1_matches_dense_ffn():
    """E=1/top_k=1/cf=1.0 routes every token through the single expert with
    gate ~1, so the MoE transformer == the dense transformer with the same
    FFN weights."""
    dense_cfg = dataclasses.replace(ENC, moe=None)
    moe_cfg = dataclasses.replace(
        ENC, moe=MoEConfig(num_experts=1, top_k=1, capacity_factor=1.0)
    )
    dp = init_transformer_params(jax.random.PRNGKey(0), dense_cfg)
    # build the MoE tree from the dense tree: same embeddings/attention,
    # dense FFN grafted into the single expert, router irrelevant (softmax
    # over one expert is 1.0 whatever the logits)
    mp = {k: v for k, v in dp.items() if k != "layers"}
    mp["layers"] = []
    for dl in dp["layers"]:
        ml = {k: dl[k] for k in ("q", "k", "v", "o", "attn_ln", "ff_ln")}
        ml["moe"] = {
            "router": {"w": jnp.zeros((16, 1))},
            "ff1": {"w": dl["ff1"]["w"][None], "b": dl["ff1"]["b"][None]},
            "ff2": {"w": dl["ff2"]["w"][None], "b": dl["ff2"]["b"][None]},
        }
        mp["layers"].append(ml)
    ids, mask, _, _ = _batch(1)
    ref = np.asarray(transformer_apply(dp, dense_cfg, ids, mask))
    got, aux = transformer_apply_with_aux(mp, moe_cfg, ids, mask)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=1e-6)
    # single expert: f = P = 1 -> aux == 1 exactly
    np.testing.assert_allclose(float(aux), 1.0, rtol=1e-6)


def test_moe_route_capacity_and_slots():
    ecfg = MoEConfig(num_experts=4, top_k=2, capacity_factor=0.5)
    B, S, E = 3, 16, 4
    C = moe_capacity(S, ecfg)  # ceil(0.5 * 2 * 16 / 4) = 4
    assert C == 4
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(B, S, E)).astype(np.float32))
    dispatch, combine, aux = moe_route(logits, ecfg, C)
    d = np.asarray(dispatch)
    # each (b, e, c) slot holds at most one token
    assert (d.sum(axis=1) <= 1.0 + 1e-6).all()
    # each expert receives at most C tokens per group
    assert (d.sum(axis=(1, 3)) <= C + 1e-6).all()
    # each token lands in at most top_k slots
    assert (d.sum(axis=(2, 3)) <= ecfg.top_k + 1e-6).all()
    # combine weights are positive only where dispatched, normalized <= 1
    c = np.asarray(combine)
    assert ((c > 0) <= (d > 0)).all()
    assert (c.sum(axis=(2, 3)) <= 1.0 + 1e-5).all()
    assert float(aux) > 0.9  # load-balance loss is ~1 for random logits


def test_moe_aux_detects_collapse():
    ecfg = MoEConfig(num_experts=4, top_k=1, capacity_factor=4.0)
    B, S, E = 2, 16, 4
    collapsed = jnp.zeros((B, S, E)).at[..., 0].set(10.0)
    _, _, aux = moe_route(collapsed, ecfg, moe_capacity(S, ecfg))
    assert float(aux) > 0.9 * E  # all mass on expert 0 -> aux ~ E


def test_moe_overflow_tokens_pass_through_residual():
    """capacity_factor small enough to drop tokens: the MoE layer output
    stays finite and dropped tokens contribute zero FFN delta."""
    ecfg = MoEConfig(num_experts=2, top_k=1, capacity_factor=0.25)
    p = init_moe_ffn_params(jax.random.PRNGKey(0), 16, 32, 2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16), jnp.float32)
    y, aux = moe_ffn(x, p, ecfg)
    assert np.isfinite(np.asarray(y)).all() and np.isfinite(float(aux))
    C = moe_capacity(16, ecfg)  # 2 slots per expert -> <= 4 tokens kept
    logits = jnp.einsum("bsh,he->bse", x, p["router"]["w"])
    d, _, _ = moe_route(logits, ecfg, C)
    kept = np.asarray(d).sum(axis=(2, 3)) > 0  # [B, S]
    assert kept.sum(axis=1).max() <= 2 * C
    # dropped tokens: FFN delta is exactly zero
    dropped = ~kept
    assert np.abs(np.asarray(y))[dropped].max() == 0.0


def test_ep_dp_matches_single_device():
    assert len(jax.devices()) == 8
    step, tx = make_verdict_train_step(CFG)
    params0 = init_verdict_params(jax.random.PRNGKey(0), CFG)
    batches = [_batch(s) for s in range(3)]

    def train(params, opt_state, step_fn, shard=None):
        losses = []
        for i, (ids, mask, types, labels) in enumerate(batches):
            if shard is not None:
                ids, mask, types, labels = shard(ids, mask, types, labels)
            params, opt_state, loss, _ = step_fn(
                params, opt_state, jnp.asarray(i), ids, mask, types, labels
            )
            losses.append(float(loss))
        return params, losses

    p_ref, losses_ref = train(
        jax.tree.map(jnp.array, params0), tx.init(params0), step
    )

    mesh = make_ep_mesh(expert=4, data=2)
    ep_step, _ = make_verdict_train_step(
        CFG, ep_constrain=make_ep_constrainer(mesh)
    )
    specs = moe_verdict_param_specs(params0)
    p_ep = shard_tree(jax.tree.map(jnp.array, params0), specs, mesh)
    o_ep = init_sharded_opt_state(tx, p_ep, mesh, specs)
    p_ep, losses_ep = train(
        p_ep, o_ep, ep_step, shard=lambda *a: shard_batch(mesh, *a)
    )

    np.testing.assert_allclose(losses_ep, losses_ref, rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree.leaves(p_ep), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6
        )


def test_ep_params_actually_sharded():
    mesh = make_ep_mesh(expert=4, data=2)
    params = init_verdict_params(jax.random.PRNGKey(1), CFG)
    specs = moe_verdict_param_specs(params)
    p = shard_tree(params, specs, mesh)
    w = p["body"]["layers"][0]["moe"]["ff1"]["w"]  # [4, 16, 32]
    assert {s.data.shape for s in w.addressable_shards} == {(1, 16, 32)}
    import optax

    tx = optax.adamw(1e-4)
    o = init_sharded_opt_state(tx, p, mesh, specs)
    mu_w = o[0].mu["body"]["layers"][0]["moe"]["ff1"]["w"]
    assert {s.data.shape for s in mu_w.addressable_shards} == {(1, 16, 32)}


def test_moe_config_json_roundtrip():
    """cli train-verdict persists the encoder config via dataclasses.asdict;
    eval-verdict must rebuild the same MoE config from the JSON dict."""
    import dataclasses
    import json

    d = json.loads(json.dumps(dataclasses.asdict(ENC) | {"dtype": None}))
    kwargs = {k: v for k, v in d.items() if k != "dtype"}
    if kwargs.get("moe"):
        kwargs["moe"] = MoEConfig(**kwargs["moe"])
    enc2 = TransformerConfig(**kwargs)
    assert enc2.moe == MOE and enc2 == ENC


def test_ep_tp_dp_matches_single_device():
    """3-axis composition: EP(2) x TP(2) x DP(2) on a ("data", "expert",
    "model") mesh — experts sharded over "expert", each expert's FFN AND
    the attention Megatron-sharded over "model", batch over "data". Must
    reproduce single-device training (losses AND final params)."""
    from ircl_tpu.parallel.ep import make_ep_tp_mesh

    step, tx = make_verdict_train_step(CFG)
    params0 = init_verdict_params(jax.random.PRNGKey(9), CFG)
    batches = [_batch(s + 60) for s in range(3)]

    def train(params, opt_state, step_fn, shard=None):
        losses = []
        for i, (ids, mask, types, labels) in enumerate(batches):
            if shard is not None:
                ids, mask, types, labels = shard(ids, mask, types, labels)
            params, opt_state, loss, _ = step_fn(
                params, opt_state, jnp.asarray(i), ids, mask, types, labels
            )
            losses.append(float(loss))
        return params, losses

    p_ref, losses_ref = train(
        jax.tree.map(jnp.array, params0), tx.init(params0), step
    )

    mesh = make_ep_tp_mesh(expert=2, model=2, data=2)
    ep_step, _ = make_verdict_train_step(
        CFG, ep_constrain=make_ep_constrainer(mesh)
    )
    specs = moe_verdict_param_specs(params0, tp=True)
    p_ep = shard_tree(jax.tree.map(jnp.array, params0), specs, mesh)
    o_ep = init_sharded_opt_state(tx, p_ep, mesh, specs)
    # expert ff1 [4, 16, 32]: 4/expert(2) x 32/model(2)
    w = p_ep["body"]["layers"][0]["moe"]["ff1"]["w"]
    assert {s.data.shape for s in w.addressable_shards} == {(2, 16, 16)}
    p_ep, losses_ep = train(
        p_ep, o_ep, ep_step, shard=lambda *a: shard_batch(mesh, *a)
    )

    np.testing.assert_allclose(losses_ep, losses_ref, rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree.leaves(p_ep), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6
        )


def test_moe_route_fuzz_invariants():
    """Routing invariants hold across random (E, top_k, cf, S) configs:
    slots never double-booked, per-expert load <= C, per-token fan-out
    <= top_k, combine gates normalized <= 1 and supported on dispatch."""
    rng = np.random.default_rng(42)
    for trial in range(25):
        E = int(rng.integers(1, 9))
        top_k = int(rng.integers(1, E + 1))
        cf = float(rng.uniform(0.2, 3.0))
        S = int(rng.integers(2, 33))
        B = int(rng.integers(1, 5))
        ecfg = MoEConfig(num_experts=E, top_k=top_k, capacity_factor=cf)
        C = moe_capacity(S, ecfg)
        logits = jnp.asarray(rng.normal(size=(B, S, E)).astype(np.float32))
        dispatch, combine, aux = moe_route(logits, ecfg, C)
        d = np.asarray(dispatch)
        c = np.asarray(combine)
        msg = f"trial {trial}: E={E} k={top_k} cf={cf:.2f} S={S} B={B} C={C}"
        assert (d.sum(axis=1) <= 1.0 + 1e-5).all(), msg
        assert (d.sum(axis=(1, 3)) <= C + 1e-5).all(), msg
        assert (d.sum(axis=(2, 3)) <= top_k + 1e-5).all(), msg
        assert ((c > 0) <= (d > 0)).all(), msg
        assert (c.sum(axis=(2, 3)) <= 1.0 + 1e-4).all(), msg
        assert np.isfinite(float(aux)), msg


def test_moe_mask_keeps_pads_out_of_routing():
    """Pad positions (mask=0) are never dispatched: zero FFN delta (the
    residual passes them through, like the dense block), no capacity slots
    consumed (trailing pads cannot evict real tokens), and the aux loss is
    computed over real tokens only."""
    ecfg = MoEConfig(num_experts=2, top_k=1, capacity_factor=1.0)
    p = init_moe_ffn_params(jax.random.PRNGKey(0), 16, 32, 2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16), jnp.float32)
    mask = np.ones((2, 16), np.float32)
    mask[:, 10:] = 0.0  # 6 trailing pads per row
    y, aux = moe_ffn(x, p, ecfg, mask=jnp.asarray(mask))
    y = np.asarray(y)
    assert np.abs(y[:, 10:, :]).max() == 0.0  # pads: exactly zero delta
    assert np.abs(y[:, :10, :]).max() > 0.0  # real tokens: routed
    # capacity check: C = ceil(1.0 * 1 * 16 / 2) = 8 slots/expert; 10 real
    # tokens per row fit even if all pick one expert only when pads don't
    # consume slots — verify via the route tensors directly
    logits = jnp.einsum("bsh,he->bse", x.astype(jnp.float32), p["router"]["w"])
    d_m, _, aux_m = moe_route(logits, ecfg, moe_capacity(16, ecfg),
                              jnp.asarray(mask))
    d = np.asarray(d_m)
    assert d[:, 10:].sum() == 0.0  # pads dispatched nowhere
    # pads consume no capacity: masked routing keeps at least as many real
    # tokens as unmasked routing (where pads can evict real tokens)
    d_u, _, aux_u = moe_route(logits, ecfg, moe_capacity(16, ecfg))
    kept_masked = d[:, :10].sum()
    kept_unmasked = np.asarray(d_u)[:, :10].sum()
    assert kept_masked >= kept_unmasked
    assert np.isfinite(float(aux_m)) and np.isfinite(float(aux_u))


def test_moe_group_size_matches_ungrouped_when_no_drops():
    """group_size subdivides routing groups (bounding the [G, g, E, C]
    dispatch memory); with generous capacity nothing drops, so the layer
    output matches the ungrouped layer exactly (same experts, same gates)."""
    p = init_moe_ffn_params(jax.random.PRNGKey(2), 16, 32, 4)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16), jnp.float32)
    base = MoEConfig(num_experts=4, top_k=2, capacity_factor=4.0)
    grouped = MoEConfig(
        num_experts=4, top_k=2, capacity_factor=4.0, group_size=4
    )
    y0, aux0 = moe_ffn(x, p, base)
    y1, aux1 = moe_ffn(x, p, grouped)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(float(aux1), float(aux0), rtol=1e-5)
    # group_size must divide S
    import pytest

    bad = MoEConfig(num_experts=4, top_k=2, group_size=5)
    with pytest.raises(ValueError):
        moe_ffn(x, p, bad)


def test_moe_config_validates_top_k():
    import pytest

    with pytest.raises(ValueError):
        MoEConfig(num_experts=2, top_k=3)
    with pytest.raises(ValueError):
        MoEConfig(num_experts=4, top_k=0)
