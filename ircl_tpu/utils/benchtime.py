"""Shared timing + parity helpers for the dense benches and probes.

One implementation of the axon-safe measurement rules (CLAUDE.md):

- ``block_until_ready`` alone can return before execution on the axon
  backend, so every timed window ends with a real ``np.asarray`` transfer.
- The first steady-state measurement of a variant in a fresh process reads
  ~3x slow (lazy upload / allocator warm-up through the tunnel), so
  ``steady`` burns ``warmup`` blocked calls before opening the timer.

Used by ``bench_dense.py``, ``scripts/probe_dense_precision.py`` and
``scripts/probe_dense_tiles.py`` — fix timing policy here, not per-file.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(*a) -> None:
    print(*a, file=sys.stderr, flush=True)


def steady(fn, label: str, batch: int, reps: int = 20, warmup: int = 2):
    """Steady-state queries/s of ``fn`` (returning a (scores, ids) tuple).

    ``warmup`` executed-and-blocked calls are discarded before the timed
    window; the window closes with a host transfer of the last output.
    """
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.time()
    outs = [fn() for _ in range(reps)]
    jax.block_until_ready(outs)
    _ = np.asarray(outs[-1][0][:1])  # real transfer (axon timing rule)
    dt = time.time() - t0
    qps = reps * batch / dt
    log(f"{label}: {qps:.0f} q/s ({dt / reps * 1000:.2f} ms/batch)")
    return qps


def probe_backend(timeout_s: float = 600.0) -> bool:
    """Bounded TPU-backend liveness check.

    The axon tunnel can go down for hours at a time; ``jax.devices()`` then
    hangs indefinitely inside backend init. Probing in a subprocess lets a
    bench fail loudly (one JSON line) instead of hanging its caller. Costs
    one extra backend init (~seconds) when healthy; skipped for explicitly
    non-axon backends, which init locally.
    """
    import os
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "axon") not in ("", "axon"):
        return True
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def unavailable_line(metric: str, unit: str) -> None:
    """Emit the one-JSON-line failure record for a dead backend."""
    import json

    log("TPU backend unavailable (axon init timed out); aborting bench")
    print(
        json.dumps(
            {
                "metric": metric,
                "value": 0.0,
                "unit": unit,
                "vs_baseline": None,
                "error": "axon backend unavailable (init timeout)",
            }
        )
    )


def check_topk(s, i, ref: np.ndarray, k: int, label: str, rtol: float = 1e-5):
    """Top-k parity vs a numpy f32 reference score matrix ``ref [n_chk, M]``:
    scores must match the reference's sorted top-k to ``rtol`` AND the id
    set must agree exactly. Returns True when every checked query passes."""
    s, i = np.asarray(s), np.asarray(i)
    n_chk = ref.shape[0]
    bad = 0
    for b in range(n_chk):
        order = np.argsort(-ref[b], kind="stable")[:k]
        ok = np.allclose(s[b], ref[b][order], rtol=rtol) and set(
            i[b].tolist()
        ) == set(order.tolist())
        bad += not ok
    log(f"{label}: parity {n_chk - bad}/{n_chk}")
    return bad == 0
