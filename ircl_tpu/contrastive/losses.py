"""Contrastive losses: NT-Xent with queue, MoCo InfoNCE, ProtoNCE.

Math matches the reference's ``NCELoss`` / ``InfoNCE``
(``src/contrastor/contrastive_loss.py``) but is re-expressed for XLA:

- no boolean-mask ``view`` reshapes (data-dependent); the diagonal and
  positive/negative structure is realized with static index arithmetic,
- the queue term is always present in the graph with an activation flag
  (additive -1e9 masking) so enabling the queue at ``queue_start_steps``
  (reference ``src/train.py:124-130``) does not change compiled shapes,
- CE(label=0, reduction='sum') is computed directly as
  ``logsumexp(logits) - logits[:, 0]`` summed over rows.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

_NEG_INF = -1.0e9


def nt_xent_loss(
    q: jnp.ndarray,  # [N, D] L2-normalized query embeddings
    k: jnp.ndarray,  # [N, D] L2-normalized key embeddings
    temperature: float,
    queue: Optional[jnp.ndarray] = None,  # [D, Q] normalized negatives
    use_queue: jnp.ndarray | bool = False,  # scalar flag (may be traced)
) -> jnp.ndarray:
    """Symmetric NT-Xent over [q; k] with optional queue negatives.

    Equivalent to reference ``NCELoss._compute_info_loss``
    (``contrastive_loss.py:56-93``): 2N rows; per row the positive is the
    cross-view twin, negatives are the other 2N-2 batch embeddings plus
    (optionally) ``q @ queue`` repeated for both views; CE-sum / 2.
    """
    n = q.shape[0]
    feats = jnp.concatenate([q, k], axis=0)  # [2N, D]
    sim = jnp.dot(feats, feats.T, preferred_element_type=jnp.float32)  # [2N, 2N]

    rows = jnp.arange(2 * n)
    pos_col = (rows + n) % (2 * n)
    l_pos = sim[rows, pos_col]  # [2N]

    # Mask the diagonal and the positive column out of the negative pool.
    neg_mask = jnp.ones((2 * n, 2 * n), dtype=bool)
    neg_mask = neg_mask.at[rows, rows].set(False)
    neg_mask = neg_mask.at[rows, pos_col].set(False)
    l_neg = jnp.where(neg_mask, sim, _NEG_INF)  # [2N, 2N] with 2N-2 live

    logits = jnp.concatenate([l_pos[:, None], l_neg], axis=1)

    if queue is not None:
        ql = jnp.dot(q, queue, preferred_element_type=jnp.float32)  # [N, Q]
        ql = jnp.tile(ql, (2, 1))  # both views use q-side queue logits
        flag = jnp.asarray(use_queue, dtype=ql.dtype)
        ql = ql * flag + (1.0 - flag) * _NEG_INF
        logits = jnp.concatenate([logits, ql], axis=1)

    logits = logits / temperature
    loss_rows = jax.nn.logsumexp(logits, axis=1) - logits[:, 0]
    return jnp.sum(loss_rows) / 2.0


def moco_infonce_loss(
    q: jnp.ndarray,  # [N, D]
    k: jnp.ndarray,  # [N, D]
    queue: jnp.ndarray,  # [D, Q]
    temperature: float,
) -> jnp.ndarray:
    """MoCo-style InfoNCE (reference ``InfoNCE``, ``contrastive_loss.py:
    20-44``): positive = q.k, negatives = q @ queue, CE mean."""
    l_pos = jnp.sum(q * k, axis=1, keepdims=True)  # [N, 1]
    l_neg = jnp.dot(q, queue, preferred_element_type=jnp.float32)  # [N, Q]
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
    loss_rows = jax.nn.logsumexp(logits, axis=1) - logits[:, 0]
    return jnp.mean(loss_rows)


def sample_negative_prototypes(
    key: jax.Array,
    num_clusters: int,
    pos_ids: jnp.ndarray,  # [N] positive cluster ids of the batch
    num_neg: int,
) -> jnp.ndarray:
    """Sample ``num_neg`` distinct cluster ids excluding the batch positives.

    XLA-friendly version of the reference's ``set`` difference + ``sample``
    (``contrastive_loss.py:105-110``): draw a random priority per cluster,
    push positives to the bottom, take the top ``num_neg``.
    """
    pri = jax.random.uniform(key, (num_clusters,))
    pri = pri.at[pos_ids].set(-1.0)
    _, neg_ids = jax.lax.top_k(pri, num_neg)
    return neg_ids


def proto_loss(
    q: jnp.ndarray,  # [N, D]
    batch_cluster_ids: Sequence[jnp.ndarray],  # per granularity: [N] ids
    centroids: Sequence[jnp.ndarray],  # per granularity: [K_g, D] normalized
    densities: Sequence[jnp.ndarray],  # per granularity: [K_g] temperatures
    neg_ids: Sequence[jnp.ndarray],  # per granularity: [R] sampled negatives
) -> jnp.ndarray:
    """ProtoNCE prototype loss (reference ``_compute_proto_loss``,
    ``contrastive_loss.py:95-135``).

    Per granularity: logits = q @ [pos_protos; neg_protos]^T with
    per-prototype temperature (the density vector), labels = arange(N)
    (each row's positive is its own prototype column), CE-sum; averaged over
    granularities.
    """
    n = q.shape[0]
    total = 0.0
    for ids, protos, dens, negs in zip(
        batch_cluster_ids, centroids, densities, neg_ids
    ):
        pos_protos = protos[ids]  # [N, D]
        neg_protos = protos[negs]  # [R, D]
        selected = jnp.concatenate([pos_protos, neg_protos], axis=0)  # [N+R, D]
        logits = jnp.dot(q, selected.T, preferred_element_type=jnp.float32)
        temp = jnp.concatenate([dens[ids], dens[negs]], axis=0)  # [N+R]
        logits = logits / temp[None, :]
        # When num_neg exceeds the count of non-positive clusters (small
        # corpora / few clusters), sample_negative_prototypes must still
        # return num_neg ids and batch positives leak in: mask each row's
        # OWN prototype out of its negative columns so the positive never
        # sits in the denominator twice.
        own = ids[:, None] == negs[None, :]  # [N, R]
        logits = jnp.concatenate(
            [logits[:, :n], jnp.where(own, -jnp.inf, logits[:, n:])], axis=1
        )
        labels = jnp.arange(n)
        row_loss = jax.nn.logsumexp(logits, axis=1) - logits[labels, labels]
        total = total + jnp.sum(row_loss)
    return total / len(centroids)
