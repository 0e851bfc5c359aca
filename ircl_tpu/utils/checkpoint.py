"""Checkpoint save/restore for the contrastive train state.

Covers the reference's ``save_model`` / ``load_model``
(``src/model.py:76-99``): full state — query params, EMA key params,
optimizer state, the negative queue + pointer (the reference carries these as
registered buffers inside ``state_dict``), and the step counter — written via
orbax. Filenames follow the reference's
``{sample}_{loss}_{model}_{step}`` convention.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ircl_tpu.contrastive.state import TrainConfig, TrainState


def _ckpt_path(ckptdir: str, tag: str, step: int) -> str:
    return os.path.abspath(os.path.join(ckptdir, f"{tag}_{step}"))


def save_state(ckptdir: str, tag: str, state: TrainState) -> str:
    step = int(state.step)
    path = _ckpt_path(ckptdir, tag, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, dict(
        params_q=state.params_q,
        params_k=state.params_k,
        opt_state=state.opt_state,
        queue=state.queue,
        queue_ptr=state.queue_ptr,
        step=state.step,
    )), force=True)
    ckptr.wait_until_finished()
    return path


def restore_state(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of ``template`` (built from the same
    TrainConfig — the reference analogously rebuilds the model from pickled
    Args before loading the state dict)."""
    ckptr = ocp.StandardCheckpointer()
    tmpl = jax.tree.map(np.asarray, dict(
        params_q=template.params_q,
        params_k=template.params_k,
        opt_state=template.opt_state,
        queue=template.queue,
        queue_ptr=template.queue_ptr,
        step=template.step,
    ))
    restored = ckptr.restore(os.path.abspath(path), tmpl)
    return TrainState(**{k: jax.tree.map(jax.numpy.asarray, v) for k, v in restored.items()})


# ---------------------------------------------------------------------------
# Sharded (multi-chip) checkpointing: save a TP/PP/EP/DP-sharded train state
# without a host gather, and restore it directly INTO target shardings —
# including a DIFFERENT mesh layout than it was saved from (elastic resume).
# The reference is single-GPU (its save_model pickles a state_dict,
# ``src/model.py:76-99``); this is new TPU-native surface.
# ---------------------------------------------------------------------------


def save_sharded(path: str, tree) -> str:
    """Save a pytree of (possibly sharded) jax.Arrays as-is via orbax.

    No ``np.asarray`` host gather: each process writes its addressable
    shards, so checkpoint IO scales with the mesh instead of serializing
    through one host (the single-device ``save_state`` path keeps the
    host-gather behavior for the contrastive trainer's small states).
    """
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def restore_sharded(path: str, like):
    """Restore into the shardings of ``like`` (a pytree of jax.Arrays or
    ShapeDtypeStructs carrying ``.sharding``). Orbax reshards on read, so
    a state saved from one mesh layout (e.g. TP(4) x DP(2)) restores onto
    another (e.g. TP(2) x DP(4)) without a host round-trip."""

    def abstract(x):
        sharding = getattr(x, "sharding", None)
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), jax.tree.map(abstract, like))


def latest_checkpoint(ckptdir: str, tag: str) -> Optional[str]:
    if not os.path.isdir(ckptdir):
        return None
    best: Tuple[int, Optional[str]] = (-1, None)
    prefix = f"{tag}_"
    for name in os.listdir(ckptdir):
        if name.startswith(prefix):
            try:
                step = int(name[len(prefix):])
            except ValueError:
                continue
            if step > best[0]:
                best = (step, os.path.join(ckptdir, name))
    return best[1]
