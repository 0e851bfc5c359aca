"""Mesh construction helpers.

The reference is single-GPU (SURVEY.md section 2.2: no distributed backend at
all); every multi-chip capability here is new surface. One flat axis layout
covers this workload:

- ``data``: batch-parallel training (DP gradient psum) and query-parallel
  retrieval;
- ``corpus``: shards the corpus dimension — postings of the sparse index and
  rows of the dense embedding matrix — so scoring is local and only the tiny
  (k values, k indices) tuples ride ICI for the merge.

Both names can map onto the same physical axis (a v5e-8 is a flat ring);
helpers default to a 1-D mesh over all devices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_names: Sequence[str] = ("corpus",),
    shape: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)
