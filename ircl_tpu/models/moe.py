"""Mixture-of-Experts FFN (GShard-style dense dispatch) for the transformer.

The reference has no MoE and no model parallelism of any kind (SURVEY.md
§2.2 — its BERT featurizer and RoBERTa verdict model are single-GPU,
``src/QA/model.py:10-37``); this is new TPU-native surface: the scaling
path for the verdict/featurizer FFNs past what TP alone can hold, and the
expert-parallel ("ep") axis of the multi-chip design next to DP/TP/SP/PP.

Design (TPU-idiomatic — everything is static-shaped einsums on the MXU,
no gather/scatter):

- Top-k routing with a capacity limit, expressed as GShard's dense
  dispatch/combine tensors ``[B, S, E, C]`` (group = batch row, S tokens
  per group, E experts, C slots per expert). Tokens that overflow an
  expert's capacity are dropped (their FFN delta is zero; the residual
  connection passes them through) — the standard GShard/Switch semantics.
- Expert weights carry a leading ``[E, ...]`` axis; the per-expert FFN is
  one batched einsum pair, so sharding that axis ``P("expert")`` makes
  GSPMD turn the dispatch/combine einsums into all-to-alls over ICI
  (``parallel/ep.py``). No model-code changes for multi-chip: sharding is
  a property of the arrays plus one optional activation constraint.
- The router runs in f32 (softmax stability); the expert matmuls follow
  the same ``preferred_element_type=f32`` convention as the dense blocks.
- Load-balance auxiliary loss (Switch eq. 4): ``E * sum_e f_e * P_e``
  over the top-1 assignment fractions ``f`` and mean router probs ``P``;
  1.0 when perfectly balanced. Weighted into the training loss by
  ``VerdictConfig.moe_aux_weight``.

With ``num_experts=1, top_k=1, capacity_factor>=1`` the layer reduces to
the dense FFN exactly (up to the gate's 1e-9 normalizer) —
``tests/test_ep.py`` pins that, plus EP(4)xDP(2) == single-device
training, capacity enforcement, and shard layouts.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    num_experts: int = 8
    top_k: int = 2
    # per-expert slots C = ceil(capacity_factor * top_k * g / E) where g is
    # the routing-group length (group_size, or the full sequence if None)
    capacity_factor: float = 1.25
    # GShard group-dim subdivision: route in groups of this many tokens
    # instead of whole batch rows. The dense dispatch/combine tensors are
    # [G, g, E, C] with C proportional to g, so their memory is
    # O(B * S * capacity_factor * top_k * g) — LINEAR in g instead of in S.
    # At L=512 shapes with large batches, per-row grouping materializes
    # multi-GB one-hot tensors; set group_size (e.g. 64) to bound it.
    # Must divide the sequence length. None = one group per batch row.
    group_size: Optional[int] = None

    def __post_init__(self):
        if not 1 <= self.top_k <= self.num_experts:
            raise ValueError(
                f"top_k={self.top_k} must be in [1, num_experts="
                f"{self.num_experts}] — re-selecting an exhausted expert "
                "would double-book its capacity slots"
            )


def moe_capacity(group_len: int, ecfg: MoEConfig) -> int:
    """Static per-expert slot count for a given routing-group length."""
    return max(
        1,
        math.ceil(
            ecfg.capacity_factor * ecfg.top_k * group_len / ecfg.num_experts
        ),
    )


def init_moe_ffn_params(key: jax.Array, hidden: int, intermediate: int,
                        num_experts: int):
    """{"router","ff1","ff2"} with expert-leading ``[E, ...]`` weights."""
    kr, k1, k2 = jax.random.split(key, 3)
    E, h, i = num_experts, hidden, intermediate

    def init(k, shape):
        return 0.02 * jax.random.normal(k, shape, jnp.float32)

    return {
        "router": {"w": init(kr, (h, E))},
        "ff1": {"w": init(k1, (E, h, i)), "b": jnp.zeros((E, i))},
        "ff2": {"w": init(k2, (E, i, h)), "b": jnp.zeros((E, h))},
    }


def moe_aux_from_stats(stats) -> jnp.ndarray:
    """Switch load-balance aux from raw routing sums.

    ``stats`` = {"f_sum": [E] top-1 assignment counts, "p_sum": [E] summed
    router probs, "n": scalar real-token count}. Because the entries are
    plain sums over tokens, stats from disjoint token sets (e.g. pipeline
    microbatches, parallel/pp.py) ADD — summing them and applying this
    gives exactly the aux a single global routing pass would compute.

    Broadcasts over leading axes: f_sum/p_sum ``[..., E]`` with n ``[...]``
    give a ``[...]`` aux (one per stacked layer in the PP stage scan)."""
    n = jnp.maximum(stats["n"], 1.0)[..., None]
    E = stats["f_sum"].shape[-1]
    return E * jnp.sum((stats["f_sum"] / n) * (stats["p_sum"] / n), axis=-1)


def moe_route(
    logits: jnp.ndarray,
    ecfg: MoEConfig,
    capacity: int,
    mask: Optional[jnp.ndarray] = None,
    return_stats: bool = False,
):
    """Router logits [B, S, E] (f32) -> (dispatch, combine, aux).

    With ``return_stats=True`` the third element is instead the raw
    routing-sum dict consumed by ``moe_aux_from_stats`` (additive across
    token subsets — the pipeline schedule accumulates them per microbatch).

    ``dispatch`` [B, S, E, C]: one-hot token->slot assignment (0/1);
    ``combine`` is ``dispatch`` scaled by the normalized top-k gate.
    Slot order: all rank-0 picks pack an expert's slots before rank-1
    picks, each in token order; assignments past C are dropped.

    ``mask`` [B, S] (1 = real token): pad positions are never dispatched —
    they consume no capacity slots, contribute zero FFN delta (the
    residual passes them through, preserving the dense blocks' pad
    isolation), and are excluded from the load-balance statistics.
    """
    B, S, E = logits.shape
    C = capacity
    probs = jax.nn.softmax(logits, axis=-1)
    m = None if mask is None else mask.astype(probs.dtype)[..., None]  # [B,S,1]
    remaining = probs
    sels, gates = [], []
    for _ in range(ecfg.top_k):
        idx = jnp.argmax(remaining, axis=-1)  # [B, S]
        onehot = jax.nn.one_hot(idx, E, dtype=probs.dtype)
        if m is not None:
            onehot = onehot * m  # pads select nothing
        sels.append(onehot)
        gates.append(jnp.sum(probs * onehot, axis=-1))  # [B, S]
        remaining = remaining * (1.0 - onehot)
    denom = sum(gates) + 1e-9

    counts = jnp.zeros((B, 1, E), probs.dtype)  # slots already taken
    dispatch = jnp.zeros((B, S, E, C), probs.dtype)
    combine = jnp.zeros((B, S, E, C), probs.dtype)
    for onehot, gate in zip(sels, gates):
        # position of each selected token within its expert's slot list
        # (pads have all-zero onehot, so they advance no positions)
        pos = jnp.cumsum(onehot, axis=1) - onehot + counts  # [B, S, E]
        keep = onehot * (pos < C)
        # one_hot returns all-zeros for indices >= C, so overflow drops out
        slot = jax.nn.one_hot(
            pos.astype(jnp.int32), C, dtype=probs.dtype
        ) * keep[..., None]
        dispatch = dispatch + slot
        combine = combine + slot * (gate / denom)[..., None, None]
        counts = counts + jnp.sum(keep, axis=1, keepdims=True)

    # Switch load-balance loss over the top-1 assignment (real tokens
    # only): 1.0 == balanced. Kept as raw sums so microbatched schedules
    # can accumulate them (moe_aux_from_stats).
    if m is None:
        n_real = jnp.asarray(float(B * S), probs.dtype)
        p_sum = jnp.sum(probs, axis=(0, 1))  # [E] summed router prob
    else:
        n_real = jnp.sum(m)
        p_sum = jnp.sum(probs * m, axis=(0, 1))
    f_sum = jnp.sum(sels[0], axis=(0, 1))  # [E] tokens top-1-routed to e
    stats = {"f_sum": f_sum, "p_sum": p_sum, "n": n_real}
    if return_stats:
        return dispatch, combine, stats
    return dispatch, combine, moe_aux_from_stats(stats)


def moe_ffn(
    x: jnp.ndarray,
    p,
    ecfg: MoEConfig,
    ep_constrain=None,
    mask: Optional[jnp.ndarray] = None,
    return_stats: bool = False,
    model_axis: Optional[str] = None,
    expert_axis: Optional[str] = None,
):
    """MoE FFN sublayer: [B, S, h] -> ([B, S, h], aux loss scalar).

    ``ep_constrain`` (``parallel.ep.make_ep_constrainer``) pins the
    [E, G, C, h] expert slabs to ``P("expert", "data")`` so GSPMD lowers
    the dispatch/combine einsums into all-to-alls at exactly this
    boundary; None keeps the layer single-device. ``mask`` [B, S]
    (1 = real token) keeps pad positions out of routing entirely.
    ``return_stats=True`` returns the additive routing sums instead of the
    aux scalar (``moe_aux_from_stats``) for microbatched accumulation.

    ``expert_axis`` / ``model_axis``: explicit-collective EP/TP for
    shard_map callers (``parallel/pp.py`` PP x EP) where GSPMD cannot
    insert the collectives. The expert weights arrive sharded
    ``[E/ep, ...]`` on their leading axis (and Megatron-sharded on
    ff1-cols/ff2-rows under ``model_axis``); activations are replicated
    over those axes. Routing runs replicated (the router is tiny), each
    shard dispatches to and runs only its LOCAL experts (a static slice of
    the dispatch/combine tensors — per-expert slots are disjoint, so
    local combines are partial sums), and one ``lax.psum`` over the
    expert(+model) axes restores the full combine. Communication per
    layer: one [B, S, h] all-reduce — the TP-style formulation of expert
    parallelism (replicated activations / sharded experts), vs the
    all-to-all formulation ``ep_constrain`` gives GSPMD. Mutually
    exclusive with ``ep_constrain``.
    """
    if (model_axis or expert_axis) and ep_constrain is not None:
        raise ValueError("explicit axes and ep_constrain are exclusive")
    Bo, So, h = x.shape
    if ecfg.group_size is not None and ecfg.group_size < So:
        g = ecfg.group_size
        if So % g:
            raise ValueError(
                f"group_size={g} must divide the sequence length {So}"
            )
        x = x.reshape(Bo * (So // g), g, h)
        if mask is not None:
            mask = mask.reshape(Bo * (So // g), g)
    B, S, _ = x.shape  # G groups of g tokens (== batch rows if ungrouped)
    dtype = x.dtype
    C = moe_capacity(S, ecfg)
    logits = jnp.einsum(
        "bsh,he->bse",
        x.astype(jnp.float32),
        p["router"]["w"].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    dispatch, combine, aux = moe_route(
        logits, ecfg, C, mask, return_stats=return_stats
    )

    # Explicit EP: keep only this shard's experts. Slots are per-expert, so
    # the sliced combine later yields a PARTIAL sum completed by the psum.
    if expert_axis is not None:
        e_loc = p["ff1"]["w"].shape[0]
        e0 = jax.lax.axis_index(expert_axis) * e_loc
        dispatch = jax.lax.dynamic_slice_in_dim(dispatch, e0, e_loc, axis=2)
        combine = jax.lax.dynamic_slice_in_dim(combine, e0, e_loc, axis=2)

    # [E, B, C, h] expert slabs: leading axis shards over "expert"
    ein = jnp.einsum(
        "bsec,bsh->ebch", dispatch.astype(dtype), x,
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    if ep_constrain is not None:
        ein = ep_constrain(ein)
    h1 = jax.nn.gelu(
        jnp.einsum(
            "ebch,ehi->ebci", ein, p["ff1"]["w"].astype(dtype),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        + p["ff1"]["b"][:, None, None, :],
        approximate=False,
    )
    eout = jnp.einsum(
        "ebci,eih->ebch", h1, p["ff2"]["w"].astype(dtype),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    ff2_b = p["ff2"]["b"][:, None, None, :]
    if model_axis is not None:
        # ff2 rows are Megatron-sharded: eout is a partial sum; add the
        # (unsharded) bias on exactly one model shard so the psum below
        # restores full-precision eout + bias.
        first = (jax.lax.axis_index(model_axis) == 0).astype(dtype)
        eout = eout + ff2_b * first
    else:
        eout = eout + ff2_b
    if ep_constrain is not None:
        eout = ep_constrain(eout)
    y = jnp.einsum(
        "bsec,ebch->bsh", combine.astype(dtype), eout,
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    psum_axes = tuple(a for a in (expert_axis, model_axis) if a is not None)
    if psum_axes:
        y = jax.lax.psum(y, psum_axes)
    return y.reshape(Bo, So, h), aux
