"""Unit tests for the shared bench timing/parity helpers
(``ircl_tpu/utils/benchtime.py``) used by bench_dense and the dense probes."""

from __future__ import annotations

import numpy as np


def test_check_topk_passes_on_exact_results():
    from ircl_tpu.utils.benchtime import check_topk

    rng = np.random.default_rng(0)
    ref = rng.normal(size=(6, 50)).astype(np.float32)
    k = 4
    order = np.argsort(-ref, axis=1)[:, :k]
    s = np.take_along_axis(ref, order, axis=1)
    assert check_topk(s, order, ref, k, "exact") is True


def test_check_topk_fails_on_wrong_scores_and_ids():
    from ircl_tpu.utils.benchtime import check_topk

    rng = np.random.default_rng(1)
    ref = rng.normal(size=(4, 30)).astype(np.float32)
    k = 3
    order = np.argsort(-ref, axis=1)[:, :k]
    s = np.take_along_axis(ref, order, axis=1)
    # corrupt one row's scores
    s_bad = s.copy()
    s_bad[2, 0] += 1.0
    assert check_topk(s_bad, order, ref, k, "bad scores") is False
    # swap one row's ids for non-top ids (scores kept correct -> id check
    # must catch it)
    i_bad = order.copy()
    i_bad[1] = np.argsort(ref[1], axis=0)[:k]  # bottom-k ids
    assert check_topk(s, i_bad, ref, k, "bad ids") is False


def test_steady_counts_warmup_and_reps():
    """steady() must call fn warmup+reps times and return reps*batch/dt."""
    import jax.numpy as jnp

    from ircl_tpu.utils.benchtime import steady

    calls = []

    def fn():
        calls.append(1)
        return (jnp.zeros((2, 3)), jnp.zeros((2, 3), jnp.int32))

    qps = steady(fn, "unit", batch=7, reps=5, warmup=2)
    assert len(calls) == 7  # 2 warmup + 5 timed
    assert qps > 0


def test_bench_marker_keying_separates_select_rescore(tmp_path, monkeypatch):
    """The cold-cache fallback must key markers per select-rescore arm: a
    warm sr=0 shape must not convince an sr=16 run its compile is warm."""
    import bench

    monkeypatch.setattr(bench, "MARKER_DIR", str(tmp_path))
    assert bench._marker_path(4096, 512, 24, None) != bench._marker_path(
        4096, 512, 24, None, 16
    )
    # warm the sr=0 default shape only
    import os

    os.makedirs(str(tmp_path), exist_ok=True)
    open(bench._marker_path(4096, 512, 24, None), "w").close()
    assert bench._resolve_claims(None, 512, 24, None) == 4096
    # sr=16 sees nothing warmed -> default with salvage, not a false warm hit
    open(bench._marker_path(2048, 512, 24, None, 16), "w").close()
    assert bench._resolve_claims(None, 512, 24, None, 16) == 2048
