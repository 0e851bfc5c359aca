"""Profiling helpers: jax.profiler traces + simple step timers.

The reference's only instrumentation is wall-clock prints around per-claim
retrieval (``src/evaluation.py:96-104``). Here: a context manager that
captures a jax profiler trace (viewable in TensorBoard/Perfetto) and a
throughput meter used by the trainer and bench.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Sliding throughput meter: items/sec over the last window."""

    def __init__(self):
        self._t0: Optional[float] = None
        self._items = 0

    def start(self) -> None:
        self._t0 = time.time()
        self._items = 0

    def add(self, n: int = 1) -> None:
        if self._t0 is None:
            self.start()
        self._items += n

    def rate(self) -> float:
        if self._t0 is None or self._items == 0:
            return 0.0
        return self._items / max(time.time() - self._t0, 1e-9)
