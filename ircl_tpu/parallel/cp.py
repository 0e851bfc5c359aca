"""Context parallelism (CP): sequence-sharded verdict transformer.

The reference truncates every (claim, evidence) pair to 512 tokens
(``src/QA/train.py:31-43`` — its only answer to long evidence); it has no
distributed backend at all (SURVEY.md §2.2). CP is the standard TPU answer
for sequences past one chip's attention memory: shard the SEQUENCE over a
``"seq"`` mesh axis and run attention as blockwise ring attention
(``ops/ring_attention.py``) — per-device attention memory drops from
O(L^2) to O(L_local^2) and the K/V blocks ride ICI one hop per step.

Design, mirroring the other explicit-collective axes (``parallel/pp.py``):

- one ``shard_map`` over a ``("data", "seq")`` mesh runs the whole
  forward: ids/mask/type_ids arrive ``P("data", "seq")`` (batch over
  ``data``, sequence over ``seq``), params replicated;
- embeddings are position-wise given the global position offset
  (``transformer_embed(pos_start=axis_index("seq") * L_local)``); LN,
  residuals and the FFN are position-wise, so only attention needs a
  collective — the ring;
- the [CLS] position lives on seq-shard 0: ``psum`` of the masked
  contribution replicates it, then every shard runs the (tiny) head
  redundantly so outputs are replicated over ``seq``;
- training: the loss term is counted only on seq-rank 0 (the head compute
  is redundant elsewhere), local grads are ``psum`` ed over
  ``("data", "seq")``, and the optimizer applies the identical update to
  the replicated params outside the shard_map. ``jax.grad`` derives the
  reverse ring through ``ppermute``/``scan`` (same property the GPipe
  backward relies on).

Proven == single-device (forward logits, losses AND final params) on the
virtual 8-device mesh in ``tests/test_cp.py``. MoE blocks are rejected
(local routing capacity would diverge from global routing — compose EP/PP
for MoE models); dense blocks only, XLA attention path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ircl_tpu.models.transformer import (
    attention_mask_inputs,
    transformer_block,
    transformer_embed,
)
from ircl_tpu.verdict.model import VerdictConfig, verdict_head


def make_cp_mesh(seq: int = None, data: int = 1, devices=None) -> Mesh:
    """("data", "seq") mesh; defaults to data=1, seq=all devices."""
    devices = devices if devices is not None else jax.devices()
    if seq is None:
        seq = len(devices) // data
    arr = np.array(devices[: data * seq]).reshape(data, seq)
    return Mesh(arr, ("data", "seq"))


def _check(cfg: VerdictConfig) -> None:
    if cfg.encoder.moe is not None:
        raise ValueError("CP does not compose with MoE (see module doc)")
    if cfg.encoder.attention == "flash":
        raise ValueError("CP rings the XLA attention path, not flash")


def _cp_logits(params, cfg: VerdictConfig, ids, mask, type_ids):
    """Per-shard forward body: local [B_l, L_l] token block -> logits
    [B_l, num_labels], replicated over "seq" (the cls psum)."""
    enc = cfg.encoder
    start = jax.lax.axis_index("seq") * ids.shape[1]
    x = transformer_embed(params["body"], enc, ids, type_ids, pos_start=start)
    attn_ctx = attention_mask_inputs(enc, mask)  # local KV-block pad bias
    for lp in params["body"]["layers"]:
        x = transformer_block(x, lp, enc, attn_ctx, seq_axis="seq")
    # [CLS] is global position 0 — present only on seq-shard 0; psum of the
    # masked contribution replicates it to every shard (its AD transpose
    # routes the head gradient back to shard 0 alone, via the `where`)
    is_first = (jax.lax.axis_index("seq") == 0).astype(x.dtype)
    cls = jax.lax.psum(x[:, 0, :] * is_first, "seq")
    return verdict_head(params, cls)


def make_cp_verdict_forward(cfg: VerdictConfig, mesh: Mesh):
    """Jitted ``(params, ids, mask, type_ids) -> logits [B, num_labels]``
    with the sequence sharded over ``mesh``'s "seq" axis. Equals the
    single-device ``verdict_apply`` up to f32 reassociation (the online
    softmax)."""
    _check(cfg)

    def local(params, ids, mask, type_ids):
        return _cp_logits(params, cfg, ids, mask, type_ids)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("data", "seq"), P("data", "seq"), P("data", "seq")),
        out_specs=P("data"),
        check_vma=False,  # logits replicated over "seq" by the cls psum
    )
    return jax.jit(fn)


def make_cp_verdict_train_step(
    cfg: VerdictConfig, mesh: Mesh, tx: Optional[optax.GradientTransformation] = None
):
    """Jitted CP training step: ``(params, opt_state, ids, mask, type_ids,
    labels) -> (params, opt_state, loss)``, mean-xent over the global batch.

    Grads are computed inside the shard_map (loss term counted on seq-rank
    0 only — the head compute is redundant on other shards) and ``psum`` ed
    over both mesh axes; params stay replicated, so the optax update runs
    once outside the region. ``tx`` defaults to plain Adam(1e-3) for tests;
    pass ``make_verdict_optimizer(cfg)`` for the production schedule."""
    _check(cfg)
    tx = tx if tx is not None else optax.adam(1e-3)
    n_data = mesh.shape["data"]

    def local_loss(params, ids, mask, type_ids, labels):
        logits = _cp_logits(params, cfg, ids, mask, type_ids)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        count_here = jnp.where(jax.lax.axis_index("seq") == 0, 1.0, 0.0)
        total = jax.lax.psum(jnp.sum(nll) * count_here, ("data", "seq"))
        return total / (labels.shape[0] * n_data)

    n_total = n_data * mesh.shape["seq"]

    def local_grads(params, ids, mask, type_ids, labels):
        # JAX transposes psum to psum: differentiating the psum-replicated
        # loss starts cotangent 1 on EVERY shard, so each shard's local
        # grads carry a uniform n_total factor on top of that shard's own
        # contribution terms (measured 2x/4x/8x at data*seq=2/4/8).
        # Dividing it out and psum-ing the contributions yields the exact
        # global gradient, replicated on every shard.
        loss, grads = jax.value_and_grad(local_loss)(
            params, ids, mask, type_ids, labels
        )
        grads = jax.lax.psum(
            jax.tree.map(lambda g: g / n_total, grads), ("data", "seq")
        )
        return loss, grads

    gfn = shard_map(
        local_grads,
        mesh=mesh,
        in_specs=(
            P(),
            P("data", "seq"),
            P("data", "seq"),
            P("data", "seq"),
            P("data"),
        ),
        out_specs=(P(), P()),
        check_vma=False,  # replicated by the psums above
    )

    @jax.jit
    def step(params, opt_state, ids, mask, type_ids, labels):
        loss, grads = gfn(params, ids, mask, type_ids, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step, tx
