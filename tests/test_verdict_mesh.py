"""train_verdict(mesh=...) — the production verdict loop runs multi-chip.

The same loop (shuffled epochs, val split, metrics, checkpointing) must
produce the single-device result when handed a mesh: DP-only, TP x DP, and
the MoE 3-axis DP x EP x TP layout. Seeds fix the batch order, so the
histories (train loss, val F1) must match.
"""

import dataclasses

import jax
import numpy as np

from ircl_tpu.models.moe import MoEConfig
from ircl_tpu.models.transformer import TransformerConfig
from ircl_tpu.parallel.ep import make_ep_tp_mesh
from ircl_tpu.parallel.tp import make_tp_mesh
from ircl_tpu.verdict.model import VerdictConfig
from ircl_tpu.verdict.train import train_verdict

ENC = TransformerConfig(
    vocab_size=64, hidden=16, layers=2, heads=4, intermediate=32,
    max_positions=16,
)
CFG = VerdictConfig(
    encoder=ENC, warmup_steps=0, total_steps=200,
    freeze_body_until_warmup=False, max_length=16,
)


def _data(n=64, L=16, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(0, 64, size=(n, L)).astype(np.int32),
        np.ones((n, L), np.float32),
        np.zeros((n, L), np.int32),
        rng.integers(0, 2, size=(n,)).astype(np.int32),
    )


def _history(cfg, mesh):
    ids, mask, types, labels = _data()
    _, history = train_verdict(
        cfg, ids, mask, types, labels,
        epochs=2, batch_size=8, val_fraction=0.1, seed=7, mesh=mesh,
    )
    return history


def test_train_verdict_tp_dp_mesh_matches_single_device():
    assert len(jax.devices()) == 8
    ref = _history(CFG, None)
    got = _history(CFG, make_tp_mesh(model=4, data=2))
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g["train_loss"], r["train_loss"], rtol=2e-5)
        assert g["val_macro_f1"] == r["val_macro_f1"]


def test_train_verdict_dp_only_mesh_matches_single_device():
    ref = _history(CFG, None)
    got = _history(CFG, make_tp_mesh(model=1, data=8))
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g["train_loss"], r["train_loss"], rtol=2e-5)


def test_train_verdict_3axis_moe_mesh_matches_single_device():
    cfg = dataclasses.replace(
        CFG,
        encoder=dataclasses.replace(
            ENC, moe=MoEConfig(num_experts=4, top_k=2, capacity_factor=2.0)
        ),
    )
    ref = _history(cfg, None)
    got = _history(cfg, make_ep_tp_mesh(expert=2, model=2, data=2))
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g["train_loss"], r["train_loss"], rtol=2e-5)


def test_train_verdict_pp_dp_mesh_matches_single_device():
    """"stage" mesh: the SAME production loop runs the GPipe schedule —
    PP(2) x DP(2), histories (loss AND val F1 via the layout-converted
    params) == single-device; the returned params are standard-layout."""
    from ircl_tpu.parallel.pp import make_pp_mesh

    ref = _history(CFG, None)
    got = _history(CFG, make_pp_mesh(stages=2, data=2))
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g["train_loss"], r["train_loss"], rtol=2e-5)
        assert g["val_macro_f1"] == r["val_macro_f1"]


def test_train_verdict_pp_moe_mesh_matches_single_device():
    """PP over MoE blocks through the production loop (stats-accumulated
    aux), and the return layout matches init_verdict_params' tree."""
    from ircl_tpu.parallel.pp import make_pp_mesh

    cfg = dataclasses.replace(
        CFG,
        encoder=dataclasses.replace(
            ENC, moe=MoEConfig(num_experts=4, top_k=2, capacity_factor=2.0)
        ),
    )
    ids, mask, types, labels = _data()
    p_ref, ref = train_verdict(
        cfg, ids, mask, types, labels,
        epochs=2, batch_size=8, val_fraction=0.1, seed=7, mesh=None,
    )
    p_pp, got = train_verdict(
        cfg, ids, mask, types, labels,
        epochs=2, batch_size=8, val_fraction=0.1, seed=7,
        mesh=make_pp_mesh(stages=2, data=1),
    )
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g["train_loss"], r["train_loss"], rtol=2e-5)
    assert jax.tree.structure(p_pp) == jax.tree.structure(p_ref)
    for a, b in zip(jax.tree.leaves(p_pp), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6
        )


def test_train_verdict_rejects_pp_tp_mesh():
    import pytest
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    bad = Mesh(devs, ("stage", "model"))
    ids, mask, types, labels = _data(n=16)
    with pytest.raises(ValueError):
        train_verdict(
            CFG, ids, mask, types, labels,
            epochs=1, batch_size=8, val_fraction=0.0, mesh=bad,
        )
