"""BERT/RoBERTa-compatible transformer encoder in functional JAX.

Stands in for the reference's HuggingFace ``BertModel`` featurizer
(``src/contrastor/contrastive_module.py:32-41``) and the RoBERTa verdict
classifier body (``src/QA/model.py:10-37``). Architecture: learned word /
position / token-type embeddings + post-LN encoder blocks (MHA -> Add&LN ->
GELU FFN -> Add&LN), parameters as plain pytrees. ``from_huggingface`` loads
real bert-base/roberta-base weights when a local cache exists (this
environment has no network egress, so random init + trained heads are the
default; the contrastive head and QA classifier are featurizer-agnostic by
design).

TPU notes: all matmuls carry ``preferred_element_type=f32``; attention
defaults to plain jnp (XLA fuses the softmax chain). ``attention="flash"``
opts into the Pallas TPU flash-attention kernel
(``jax.experimental.pallas.ops.tpu.flash_attention``) — MEASURED NEGATIVE
at the reference verdict shape (12L/768h, B=8, L=512): 15.9 steps/s vs
29.5 for the XLA path (bench_verdict --attention flash, v5e), and the
kernel's in-kernel dots are bf16-class (~6e-3 output delta at f32 —
scripts/probe_flash_attn.py). The avoided [B, H, L, L] probs traffic does
not pay for the kernel's per-block overhead at this small B*H; kept as an
opt-in for long-sequence shapes where it would.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ircl_tpu.models.moe import MoEConfig, init_moe_ffn_params, moe_ffn


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int = 30522
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 512
    type_vocab: int = 2
    layernorm_eps: float = 1e-12
    # roberta uses padding_idx-offset position ids (first real position = 2)
    position_offset: int = 0
    dtype: Any = jnp.float32
    # "xla" (default; fused softmax chain, CPU-compatible) or "flash"
    # (Pallas TPU kernel; pad tokens are isolated via segment ids and
    # their garbage outputs masked by downstream pooling)
    attention: str = "xla"
    # Mixture-of-Experts FFN in every block (models/moe.py); None = dense.
    # When set, transformer_block returns (x, aux) and training should use
    # transformer_apply_with_aux for the load-balance loss.
    moe: Optional[MoEConfig] = None


def _dense_init(key, shape, scale=0.02):
    return scale * jax.random.normal(key, shape, jnp.float32)


def init_transformer_params(key: jax.Array, cfg: TransformerConfig) -> Dict:
    # NOTE: the split count is part of the RNG stream (split(key, N)[i]
    # depends on N) — the dense count must stay 8 + 12*L so existing golden
    # inits are stable; the MoE variant gets its own stream.
    n_keys = 8 + (16 if cfg.moe is not None else 12) * cfg.layers
    keys = iter(jax.random.split(key, n_keys))
    p: Dict[str, Any] = {
        "tok_emb": _dense_init(next(keys), (cfg.vocab_size, cfg.hidden)),
        "pos_emb": _dense_init(
            next(keys), (cfg.max_positions + cfg.position_offset, cfg.hidden)
        ),
        "type_emb": _dense_init(next(keys), (cfg.type_vocab, cfg.hidden)),
        "emb_ln": {"scale": jnp.ones(cfg.hidden), "bias": jnp.zeros(cfg.hidden)},
        "layers": [],
    }
    for _ in range(cfg.layers):
        h, i = cfg.hidden, cfg.intermediate
        lp = {
            "q": {"w": _dense_init(next(keys), (h, h)), "b": jnp.zeros(h)},
            "k": {"w": _dense_init(next(keys), (h, h)), "b": jnp.zeros(h)},
            "v": {"w": _dense_init(next(keys), (h, h)), "b": jnp.zeros(h)},
            "o": {"w": _dense_init(next(keys), (h, h)), "b": jnp.zeros(h)},
            "attn_ln": {"scale": jnp.ones(h), "bias": jnp.zeros(h)},
            "ff_ln": {"scale": jnp.ones(h), "bias": jnp.zeros(h)},
        }
        if cfg.moe is not None:
            lp["moe"] = init_moe_ffn_params(
                next(keys), h, i, cfg.moe.num_experts
            )
        else:
            lp["ff1"] = {"w": _dense_init(next(keys), (h, i)), "b": jnp.zeros(i)}
            lp["ff2"] = {"w": _dense_init(next(keys), (i, h)), "b": jnp.zeros(h)}
        p["layers"].append(lp)
    return p


def _ln(x, p, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _dense(x, p):
    return (
        jnp.einsum(
            "...i,io->...o", x, p["w"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        + p["b"]
    )


def transformer_embed(
    params: Dict,
    cfg: TransformerConfig,
    ids: jnp.ndarray,  # [B, L] int32
    type_ids: Optional[jnp.ndarray] = None,
    pos_start=0,  # first position index (context-parallel shards pass
    #   axis_index("seq") * L_local so each holds its global positions)
) -> jnp.ndarray:
    """Embedding sum + embedding layernorm -> [B, L, hidden]."""
    L = ids.shape[1]
    pos = jnp.arange(L) + cfg.position_offset + pos_start
    x = (
        params["tok_emb"][ids]
        + params["pos_emb"][pos][None, :, :]
        + (
            params["type_emb"][type_ids]
            if type_ids is not None
            else params["type_emb"][0][None, None, :]
        )
    ).astype(cfg.dtype)
    return _ln(x, params["emb_ln"], cfg.layernorm_eps)


def attention_mask_inputs(cfg: TransformerConfig, mask: jnp.ndarray):
    """Per-batch attention context: additive pad bias [B,1,1,L] for the
    "xla" path, SegmentIds for the "flash" kernel."""
    if cfg.attention == "flash":
        from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds

        # pad tokens get segment 0, real tokens segment 1: cross-segment
        # attention is masked inside the kernel, which reproduces the
        # additive -1e9 pad bias for every REAL query row (pad rows attend
        # pads; their outputs are garbage masked by downstream pooling)
        return SegmentIds(q=mask.astype(jnp.int32), kv=mask.astype(jnp.int32))
    neg = jnp.asarray(-1e9, cfg.dtype)
    return (1.0 - mask[:, None, None, :].astype(cfg.dtype)) * neg  # [B,1,1,L]


def attention_sublayer(
    x: jnp.ndarray,  # [B, L, hidden]
    lp: Dict,  # one entry of params["layers"]
    cfg: TransformerConfig,
    attn_ctx,  # attention_mask_inputs(cfg, mask)
    model_axis: Optional[str] = None,  # explicit Megatron TP under shard_map
    seq_axis: Optional[str] = None,  # ring-attention CP under shard_map
) -> jnp.ndarray:
    """MHA -> Add&LN (the first half of a post-LN block).

    ``model_axis``: when called inside a ``shard_map`` whose mesh carries a
    Megatron "model" axis (``parallel/pp.py`` PP x TP), the q/k/v/o weights
    arrive column/row-sharded; the head count is inferred from the local
    q-projection width and the o-projection partial sums are all-reduced
    with an explicit ``lax.psum`` (GSPMD cannot insert collectives inside
    shard_map). ``seq_axis``: context parallelism (``parallel/cp.py``) —
    x and attn_ctx arrive sequence-sharded over that mesh axis and the
    score/value reduction runs as blockwise ring attention
    (``ops/ring_attention.py``) instead of a local softmax. None = the
    normal GSPMD/single-device path, numerically identical code."""
    B, L, _ = x.shape
    dtype = cfg.dtype
    hd = cfg.hidden // cfg.heads
    nh = lp["q"]["w"].shape[-1] // hd  # local heads (== cfg.heads unsharded)
    q = _dense(x, lp["q"]).reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
    k = _dense(x, lp["k"]).reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
    v = _dense(x, lp["v"]).reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
    if seq_axis is not None:
        if cfg.attention == "flash":
            raise ValueError("ring-attention CP supports the XLA path")
        from ircl_tpu.ops.ring_attention import ring_attention

        ctx = ring_attention(q, k, v, attn_ctx, seq_axis)
    elif cfg.attention == "flash":
        if model_axis is not None:
            raise ValueError("explicit-TP attention supports the XLA path")
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention,
        )

        ctx = flash_attention(
            q, k, v, segment_ids=attn_ctx, causal=False,
            sm_scale=float(1.0 / np.sqrt(hd)),
        ).astype(dtype)
    else:
        logits = (
            jnp.einsum(
                "bhqd,bhkd->bhqk", q, k,
                preferred_element_type=jnp.float32,
            )
            / np.sqrt(hd)
            + attn_ctx
        )
        probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
        ctx = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, v,
            preferred_element_type=jnp.float32,
        ).astype(dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, nh * hd)
    proj = jnp.einsum(
        "...i,io->...o", ctx, lp["o"]["w"].astype(dtype),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    if model_axis is not None:  # row-sharded o: all-reduce the partial sums
        proj = jax.lax.psum(proj, model_axis)
    return _ln(x + (proj + lp["o"]["b"]), lp["attn_ln"], cfg.layernorm_eps)


def transformer_block(
    x: jnp.ndarray,  # [B, L, hidden]
    lp: Dict,  # one entry of params["layers"]
    cfg: TransformerConfig,
    attn_ctx,  # attention_mask_inputs(cfg, mask)
    ep_constrain=None,  # expert-parallel all-to-all hook (parallel/ep.py)
    moe_mask=None,  # [B, L] 1 = real token; keeps pads out of MoE routing
    moe_stats: bool = False,  # return additive routing sums instead of aux
    model_axis: Optional[str] = None,  # explicit TP axis (shard_map callers)
    expert_axis: Optional[str] = None,  # explicit EP axis (shard_map callers)
    seq_axis: Optional[str] = None,  # ring-attention CP axis (parallel/cp.py)
):
    """One post-LN encoder block (MHA -> Add&LN -> FFN -> Add&LN).

    Factored out so the pipeline-parallel stage runner (``parallel/pp.py``)
    can ``lax.scan`` it over stacked layer params; ``transformer_apply``'s
    python loop calls the same function, so PP == single-device numerics by
    construction.

    Returns the hidden state; with ``cfg.moe`` set, the FFN is the MoE
    layer and the return is ``(x, aux)`` (load-balance loss) instead —
    ``cfg`` is static so callers branch at trace time. ``moe_stats=True``
    swaps the aux scalar for the raw routing-sum dict
    (``models.moe.moe_aux_from_stats``) so microbatched schedulers
    (parallel/pp.py) can accumulate sums across microbatches and recover
    the exact global aux.

    ``model_axis`` / ``expert_axis``: explicit-collective TP/EP for
    shard_map callers (``parallel/pp.py`` PP x TP / PP x EP) — weights
    arrive Megatron-/expert-sharded and the all-reduces GSPMD would insert
    are issued as ``lax.psum`` over the named mesh axes. None (default) =
    the GSPMD/single-device path, numerically identical.

    ``seq_axis``: context parallelism (``parallel/cp.py``) — x/attn_ctx
    arrive sequence-sharded and attention streams K/V blocks around the
    ring; LN/FFN are position-wise, so they need no collective. MoE under
    CP is rejected (routing capacity groups would change shape per shard;
    compose EP/PP for MoE models instead)."""
    if seq_axis is not None and cfg.moe is not None:
        raise ValueError(
            "context parallelism does not compose with MoE blocks: local "
            "routing capacity would differ from the global routing"
        )
    x = attention_sublayer(
        x, lp, cfg, attn_ctx, model_axis=model_axis, seq_axis=seq_axis
    )
    if cfg.moe is not None:
        y, aux = moe_ffn(
            x, lp["moe"], cfg.moe, ep_constrain, moe_mask,
            return_stats=moe_stats,
            model_axis=model_axis, expert_axis=expert_axis,
        )
        return _ln(x + y, lp["ff_ln"], cfg.layernorm_eps), aux
    h1 = jax.nn.gelu(_dense(x, lp["ff1"]), approximate=False)
    ff = jnp.einsum(
        "...i,io->...o", h1, lp["ff2"]["w"].astype(h1.dtype),
        preferred_element_type=jnp.float32,
    ).astype(h1.dtype)
    if model_axis is not None:  # row-sharded ff2: all-reduce partial sums
        ff = jax.lax.psum(ff, model_axis)
    ff = ff + lp["ff2"]["b"]
    return _ln(x + ff, lp["ff_ln"], cfg.layernorm_eps)


def transformer_apply_with_aux(
    params: Dict,
    cfg: TransformerConfig,
    ids: jnp.ndarray,  # [B, L] int32
    mask: jnp.ndarray,  # [B, L] f32 (1 = real token)
    type_ids: Optional[jnp.ndarray] = None,
    constrain=None,  # optional activation-sharding hook (parallel/tp.py SP)
    ep_constrain=None,  # optional expert-parallel hook (parallel/ep.py)
):
    """(last hidden state [B, L, hidden], mean MoE aux loss — 0 if dense).

    ``constrain`` (e.g. ``parallel.tp.make_sp_constrainer``) is applied to
    the [B, L, hidden] activations after the embedding LN and after every
    block: under GSPMD that single annotation turns the Megatron TP
    all-reduces into reduce-scatter/all-gather pairs with the LN + residual
    regions sequence-sharded (Megatron sequence parallelism)."""
    x = transformer_embed(params, cfg, ids, type_ids)
    if constrain is not None:
        x = constrain(x)
    attn_ctx = attention_mask_inputs(cfg, mask)
    aux_total = jnp.zeros((), jnp.float32)
    for lp in params["layers"]:
        if cfg.moe is not None:
            x, aux = transformer_block(
                x, lp, cfg, attn_ctx, ep_constrain, moe_mask=mask
            )
            aux_total = aux_total + aux
        else:
            x = transformer_block(x, lp, cfg, attn_ctx)
        if constrain is not None:
            x = constrain(x)
    return x, aux_total / max(len(params["layers"]), 1)


def transformer_apply(
    params: Dict,
    cfg: TransformerConfig,
    ids: jnp.ndarray,  # [B, L] int32
    mask: jnp.ndarray,  # [B, L] f32 (1 = real token)
    type_ids: Optional[jnp.ndarray] = None,
    constrain=None,
    ep_constrain=None,
) -> jnp.ndarray:
    """Last hidden state [B, L, hidden] (MoE aux loss discarded —
    inference / frozen-featurizer path; training on an MoE config should
    use ``transformer_apply_with_aux``)."""
    return transformer_apply_with_aux(
        params, cfg, ids, mask, type_ids, constrain, ep_constrain
    )[0]


# ---------------------------------------------------------------------------
# Optional: load real HuggingFace weights when cached locally.
# ---------------------------------------------------------------------------


def from_huggingface(name: str = "bert-base-uncased"):
    """(cfg, params) from a locally cached HF checkpoint; raises if absent."""
    import os

    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
    from transformers import AutoModel

    model = AutoModel.from_pretrained(name)
    hc = model.config
    is_roberta = "roberta" in hc.model_type
    cfg = TransformerConfig(
        vocab_size=hc.vocab_size,
        hidden=hc.hidden_size,
        layers=hc.num_hidden_layers,
        heads=hc.num_attention_heads,
        intermediate=hc.intermediate_size,
        max_positions=hc.max_position_embeddings - (2 if is_roberta else 0),
        type_vocab=hc.type_vocab_size,
        layernorm_eps=hc.layer_norm_eps,
        position_offset=2 if is_roberta else 0,
    )
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    pre = "encoder.layer"

    def t(name):
        return jnp.asarray(sd[name])

    params = {
        "tok_emb": t("embeddings.word_embeddings.weight"),
        "pos_emb": t("embeddings.position_embeddings.weight"),
        "type_emb": t("embeddings.token_type_embeddings.weight"),
        "emb_ln": {
            "scale": t("embeddings.LayerNorm.weight"),
            "bias": t("embeddings.LayerNorm.bias"),
        },
        "layers": [],
    }
    for l in range(cfg.layers):
        b = f"{pre}.{l}."
        params["layers"].append(
            {
                "q": {"w": t(b + "attention.self.query.weight").T, "b": t(b + "attention.self.query.bias")},
                "k": {"w": t(b + "attention.self.key.weight").T, "b": t(b + "attention.self.key.bias")},
                "v": {"w": t(b + "attention.self.value.weight").T, "b": t(b + "attention.self.value.bias")},
                "o": {"w": t(b + "attention.output.dense.weight").T, "b": t(b + "attention.output.dense.bias")},
                "attn_ln": {"scale": t(b + "attention.output.LayerNorm.weight"), "bias": t(b + "attention.output.LayerNorm.bias")},
                "ff1": {"w": t(b + "intermediate.dense.weight").T, "b": t(b + "intermediate.dense.bias")},
                "ff2": {"w": t(b + "output.dense.weight").T, "b": t(b + "output.dense.bias")},
                "ff_ln": {"scale": t(b + "output.LayerNorm.weight"), "bias": t(b + "output.LayerNorm.bias")},
            }
        )
    return cfg, params
