"""Tensor parallelism (Megatron-style) for the transformer models.

The reference has no model parallelism of any kind (SURVEY.md §2.2 — its
RoBERTa verdict model and BERT featurizer are single-GPU,
``src/QA/model.py:10-37``). This module is new TPU-native surface: the
transformer's weight matrices are sharded over a ``model`` mesh axis and
XLA GSPMD partitions every matmul and inserts exactly the collectives the
Megatron pattern requires (an all-reduce after the attention output
projection and one after the second MLP matmul), riding ICI. No model-code
changes: sharding is a property of the parameter arrays, never of
``transformer_apply``.

Layout (hidden h, intermediate i, ``model`` axis m — pick m dividing the
head count so the [B, L, heads, head_dim] reshape splits on whole heads):

- q/k/v ``w [h, h]``: column-sharded ``P(None, "model")`` (heads split);
  biases ``P("model")``.
- o ``w [h, h]``: row-sharded ``P("model", None)`` — its matmul contracts
  the sharded head dim, producing the block's first partial-sum all-reduce.
- ff1 ``w [h, i]``: column-sharded; bias sharded.
- ff2 ``w [i, h]``: row-sharded — the second all-reduce.
- embeddings, layernorms, classifier heads: replicated (at these sizes the
  vocab table is small; sharding it buys nothing).

Composes with data parallelism on a ``("data", "model")`` mesh: batch
inputs are sharded over ``data``, so the gradient psum over ``data`` and
the TP all-reduces over ``model`` are both inserted by GSPMD from the same
jitted step (``tests/test_tp.py`` pins TP x DP == single-device).

Optimizer state inherits the parameter shardings by running ``tx.init``
jitted over committed sharded params (XLA propagates input shardings
through the init graph), so Adam moments are sharded exactly like their
parameters — per-device optimizer memory drops by the TP degree.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_tp_mesh(
    model: Optional[int] = None, data: Optional[int] = None, devices=None
) -> Mesh:
    """("data", "model") mesh; defaults to model = all devices, data = 1."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if model is None:
        model = n if data is None else n // data
    if data is None:
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def transformer_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec tree matching ``init_transformer_params``'s layout."""
    rep = P()
    ln = {"scale": rep, "bias": rep}
    layer = {
        "q": {"w": P(None, "model"), "b": P("model")},
        "k": {"w": P(None, "model"), "b": P("model")},
        "v": {"w": P(None, "model"), "b": P("model")},
        "o": {"w": P("model", None), "b": rep},
        "attn_ln": ln,
        "ff1": {"w": P(None, "model"), "b": P("model")},
        "ff2": {"w": P("model", None), "b": rep},
        "ff_ln": ln,
    }
    return {
        "tok_emb": rep,
        "pos_emb": rep,
        "type_emb": rep,
        "emb_ln": ln,
        "layers": [layer for _ in params["layers"]],
    }


def verdict_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """Specs for ``init_verdict_params``: TP body, replicated heads."""
    rep_dense = {"w": P(), "b": P()}
    return {
        "body": transformer_param_specs(params["body"]),
        "head_dense": rep_dense,
        "head_out": rep_dense,
    }


def shard_tree(tree, specs, mesh: Mesh):
    """device_put every leaf with its NamedSharding (commits the layout)."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def shard_batch(mesh: Mesh, *arrays):
    """Shard leading (batch) axis over ``data``, replicate over ``model``."""
    out = tuple(
        jax.device_put(a, NamedSharding(mesh, P("data")))
        for a in arrays
    )
    return out if len(out) > 1 else out[0]


def make_sp_constrainer(mesh: Mesh):
    """Megatron sequence parallelism (SP) as one GSPMD annotation.

    Returns a hook for ``transformer_apply(..., constrain=...)`` that pins
    the inter-block activations [B, L, hidden] to
    ``P("data", "model", None)`` — batch over ``data``, *sequence* over
    ``model``. With the weights Megatron-sharded (``transformer_param_specs``)
    the partial-sum all-reduces after attention-o and ff2 land exactly at
    these constraints, so XLA lowers each into a reduce-scatter (into the
    sequence-sharded LN + residual region) plus an all-gather before the
    next block's column-parallel matmuls — the Megatron-LM SP communication
    pattern (same total bytes, but the LN/residual/dropout work and its
    activation memory drop by the TP degree). The reference has no model
    parallelism at all (SURVEY.md §2.2); this is new TPU-native surface.
    """
    sharding = NamedSharding(mesh, P("data", "model", None))

    def constrain(x):
        return jax.lax.with_sharding_constraint(x, sharding)

    return constrain


def _state_specs(state, params_treedef, param_specs):
    """Specs for an optax state: any subtree with exactly the params'
    structure (mu, nu, trace, ...) gets the param specs; everything else
    (step counts, schedule state) is replicated."""
    try:
        if jax.tree.structure(state) == params_treedef:
            return param_specs
    except Exception:
        pass
    if isinstance(state, tuple) and hasattr(state, "_fields"):  # NamedTuple
        return type(state)(
            *(_state_specs(c, params_treedef, param_specs) for c in state)
        )
    if isinstance(state, (tuple, list)):
        return type(state)(
            _state_specs(c, params_treedef, param_specs) for c in state
        )
    if isinstance(state, dict):
        return {
            k: _state_specs(v, params_treedef, param_specs)
            for k, v in state.items()
        }
    return P()  # leaf


def init_sharded_opt_state(tx, sharded_params, mesh: Mesh, param_specs):
    """Optimizer state with Adam moments sharded like their parameters.

    jit alone does not commit output shardings to match inputs, so the
    state layout is forced explicitly: subtrees mirroring the param tree
    (mu/nu/trace) take the param PartitionSpecs, scalars stay replicated —
    per-device optimizer memory drops by the TP degree.
    """
    shapes = jax.eval_shape(tx.init, sharded_params)
    specs = _state_specs(shapes, jax.tree.structure(sharded_params), param_specs)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    return jax.jit(tx.init, out_shardings=shardings)(sharded_params)
