"""Contrastive loss tests against direct numpy implementations of the
reference formulas (``src/contrastor/contrastive_loss.py``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ircl_tpu.contrastive.losses import (
    moco_infonce_loss,
    nt_xent_loss,
    proto_loss,
    sample_negative_prototypes,
)


def _normalize(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _ce_rows(logits, label_col=0):
    """Cross-entropy per row against a fixed label column (numerically via
    logsumexp)."""
    m = logits.max(axis=1, keepdims=True)
    lse = m.squeeze(1) + np.log(np.exp(logits - m).sum(axis=1))
    return lse - logits[:, label_col]


def _ref_nt_xent(q, k, T, queue=None):
    """Reference NCELoss._compute_info_loss in numpy."""
    n = len(q)
    feats = np.concatenate([q, k], 0)
    sim = feats @ feats.T
    rows = np.arange(2 * n)
    pos = sim[rows, (rows + n) % (2 * n)][:, None]
    neg_mask = ~np.eye(2 * n, dtype=bool)
    neg_mask[rows, (rows + n) % (2 * n)] = False
    negs = sim[neg_mask].reshape(2 * n, 2 * n - 2)
    logits = np.concatenate([pos, negs], 1)
    if queue is not None:
        ql = np.tile(q @ queue, (2, 1))
        logits = np.concatenate([logits, ql], 1)
    logits = logits / T
    return _ce_rows(logits).sum() / 2.0


@pytest.mark.parametrize("use_queue", [False, True])
def test_nt_xent_matches_reference_math(use_queue):
    rng = np.random.default_rng(0)
    n, d, qsz = 6, 8, 10
    q = _normalize(rng.normal(size=(n, d))).astype(np.float32)
    k = _normalize(rng.normal(size=(n, d))).astype(np.float32)
    queue = _normalize(rng.normal(size=(d, qsz)).T).T.astype(np.float32)

    expected = _ref_nt_xent(q, k, 0.05, queue if use_queue else None)
    got = nt_xent_loss(
        jnp.asarray(q),
        jnp.asarray(k),
        0.05,
        queue=jnp.asarray(queue),
        use_queue=use_queue,
    )
    np.testing.assert_allclose(float(got), expected, rtol=1e-4)


def test_nt_xent_queue_flag_off_equals_no_queue():
    rng = np.random.default_rng(1)
    q = _normalize(rng.normal(size=(4, 8))).astype(np.float32)
    k = _normalize(rng.normal(size=(4, 8))).astype(np.float32)
    queue = _normalize(rng.normal(size=(8, 16)).T).T.astype(np.float32)
    a = nt_xent_loss(jnp.asarray(q), jnp.asarray(k), 0.05, None, False)
    b = nt_xent_loss(
        jnp.asarray(q), jnp.asarray(k), 0.05, jnp.asarray(queue), False
    )
    np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


def test_moco_infonce_matches_reference_math():
    rng = np.random.default_rng(2)
    n, d, qsz = 5, 8, 12
    q = _normalize(rng.normal(size=(n, d))).astype(np.float32)
    k = _normalize(rng.normal(size=(n, d))).astype(np.float32)
    queue = rng.normal(size=(d, qsz)).astype(np.float32)

    l_pos = (q * k).sum(1)[:, None]
    l_neg = q @ queue
    logits = np.concatenate([l_pos, l_neg], 1) / 0.07
    expected = _ce_rows(logits).mean()

    got = moco_infonce_loss(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(queue), 0.07
    )
    np.testing.assert_allclose(float(got), expected, rtol=1e-4)


def test_proto_loss_matches_reference_math():
    rng = np.random.default_rng(3)
    n, d = 4, 8
    q = _normalize(rng.normal(size=(n, d))).astype(np.float32)
    # two granularities
    Ks = [6, 9]
    R = 3
    ids, cents, dens, negs = [], [], [], []
    expected = 0.0
    for K in Ks:
        cid = rng.integers(0, K, size=n)
        C = _normalize(rng.normal(size=(K, d))).astype(np.float32)
        den = rng.uniform(0.03, 0.1, size=K).astype(np.float32)
        neg = rng.choice([c for c in range(K) if c not in set(cid)], R, replace=False)
        ids.append(jnp.asarray(cid))
        cents.append(jnp.asarray(C))
        dens.append(jnp.asarray(den))
        negs.append(jnp.asarray(neg))

        sel = np.concatenate([C[cid], C[neg]], 0)
        logits = (q @ sel.T) / np.concatenate([den[cid], den[neg]])[None, :]
        # labels are arange(n): row i's positive is column i
        m = logits.max(axis=1, keepdims=True)
        lse = m.squeeze(1) + np.log(np.exp(logits - m).sum(axis=1))
        expected += (lse - logits[np.arange(n), np.arange(n)]).sum()
    expected /= len(Ks)

    got = proto_loss(jnp.asarray(q), ids, cents, dens, negs)
    np.testing.assert_allclose(float(got), expected, rtol=1e-4)


def test_sample_negative_prototypes_excludes_positives():
    key = jax.random.PRNGKey(0)
    pos = jnp.asarray([1, 5, 5, 7])
    negs = sample_negative_prototypes(key, 32, pos, 20)
    negs = np.asarray(negs)
    assert len(set(negs.tolist())) == 20
    assert not (set(negs.tolist()) & {1, 5, 7})
