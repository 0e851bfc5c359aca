"""Expert parallelism (EP) for the MoE transformer (models/moe.py).

The reference has no MoE and no distributed backend at all (SURVEY.md
§2.2); this is new TPU-native surface — the fifth parallelism axis next
to DP (``parallel/dp.py``), TP/SP (``parallel/tp.py``) and PP
(``parallel/pp.py``).

Design: expert weights carry a leading ``[E, ...]`` axis, sharded
``P("expert")`` over a ``("data", "expert")`` mesh, so each chip holds
``E / ep`` experts (and their Adam moments). The GShard dense
dispatch/combine einsums produce ``[E, B, C, h]`` expert slabs; pinning
those to ``P("expert", "data")`` (``make_ep_constrainer``) makes GSPMD
lower the dispatch into an all-to-all over ICI: tokens leave their
batch-shard and land on the chip owning their expert, and the combine
einsum routes them back. No model-code changes — sharding is a property
of the arrays plus that one activation constraint, same philosophy as
TP/SP.

Composes with DP on the same mesh (batch over ``data``); the gradient
psum over ``data`` and the expert all-to-alls over ``expert`` come out
of one jitted step. ``tests/test_ep.py`` pins EP(4)xDP(2) training ==
single-device (losses AND final params) and the physical shard layouts.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_ep_mesh(
    expert: Optional[int] = None, data: Optional[int] = None, devices=None
) -> Mesh:
    """("data", "expert") mesh; defaults to expert = all devices, data = 1."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if expert is None:
        expert = n if data is None else n // data
    if data is None:
        data = n // expert
    assert data * expert == n, (data, expert, n)
    arr = np.array(devices).reshape(data, expert)
    return Mesh(arr, ("data", "expert"))


def make_ep_tp_mesh(
    expert: int, model: int, data: Optional[int] = None, devices=None
) -> Mesh:
    """("data", "expert", "model") mesh for the 3-axis DP x EP x TP layout."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // (expert * model)
    assert data * expert * model == n, (data, expert, model, n)
    arr = np.array(devices).reshape(data, expert, model)
    return Mesh(arr, ("data", "expert", "model"))


def moe_layer_specs(tp: bool = False) -> Dict[str, Any]:
    """Specs for one ``init_moe_ffn_params`` tree: experts sharded on the
    leading axis, router replicated (it is [h, E] — tiny). ``tp=True``
    additionally Megatron-shards each expert's FFN over "model": ff1
    column-parallel, ff2 row-parallel — the per-expert all-reduce lands at
    the combine boundary, nested inside the expert all-to-alls."""
    if tp:
        return {
            "router": {"w": P()},
            "ff1": {
                "w": P("expert", None, "model"),
                "b": P("expert", "model"),
            },
            "ff2": {
                "w": P("expert", "model", None),
                "b": P("expert", None),
            },
        }
    return {
        "router": {"w": P()},
        "ff1": {"w": P("expert", None, None), "b": P("expert", None)},
        "ff2": {"w": P("expert", None, None), "b": P("expert", None)},
    }


def moe_transformer_param_specs(
    params: Dict[str, Any], tp: bool = False
) -> Dict[str, Any]:
    """PartitionSpec tree for an MoE ``init_transformer_params`` layout:
    expert weights ``P("expert")``; with ``tp=True`` the attention blocks
    take the Megatron layout over "model" (same as
    ``tp.transformer_param_specs``) and each expert's FFN is TP-sharded
    too — the full DP x EP x TP composition on a
    ``("data", "expert", "model")`` mesh."""
    rep = P()
    ln = {"scale": rep, "bias": rep}
    if tp:
        att_col = {"w": P(None, "model"), "b": P("model")}
        att_row = {"w": P("model", None), "b": rep}
    else:
        att_col = att_row = {"w": rep, "b": rep}
    layer = {
        "q": att_col, "k": att_col, "v": att_col, "o": att_row,
        "attn_ln": ln,
        "moe": moe_layer_specs(tp),
        "ff_ln": ln,
    }
    return {
        "tok_emb": rep,
        "pos_emb": rep,
        "type_emb": rep,
        "emb_ln": ln,
        "layers": [layer for _ in params["layers"]],
    }


def moe_verdict_param_specs(
    params: Dict[str, Any], tp: bool = False
) -> Dict[str, Any]:
    """Specs for ``init_verdict_params`` over an MoE encoder."""
    rep_dense = {"w": P(), "b": P()}
    return {
        "body": moe_transformer_param_specs(params["body"], tp),
        "head_dense": rep_dense,
        "head_out": rep_dense,
    }


def make_ep_constrainer(mesh: Mesh):
    """Hook for ``moe_ffn(..., ep_constrain=...)``: pins the [E, B, C, h]
    expert slabs to ``P("expert", "data")`` — the all-to-all boundary."""
    sharding = NamedSharding(mesh, P("expert", "data", None, None))

    def constrain(x):
        return jax.lax.with_sharding_constraint(x, sharding)

    return constrain
