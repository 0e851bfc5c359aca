"""Secondary benchmark: contrastive train-step throughput on one chip.

Measures compiled steps/sec (effective batch 256 = 128 x 2 micro-batches,
reference training shape: BiLSTM 3x256 head over 768-d features, NT-Xent
with 12544-slot queue) — the workload of ``src/train.py``'s inner loop.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ircl_jax_cache")

    from ircl_tpu.contrastive.state import TrainConfig, init_train_state
    from ircl_tpu.contrastive.train import make_train_step
    from ircl_tpu.models.featurizer import FeaturizerConfig, HashEmbedFeaturizer

    cfg = TrainConfig()  # reference shapes: 768 -> 3x256 bi -> 128, queue 12544
    feat = HashEmbedFeaturizer(FeaturizerConfig(dim=768, max_len=64))
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, feat)

    rng = np.random.default_rng(0)
    shape = (cfg.accum_steps, cfg.micro_batch, feat.config.max_len)
    ids = jnp.asarray(
        rng.integers(0, feat.config.vocab_buckets, size=shape).astype(np.int32)
    )
    ids_k = jnp.asarray(
        rng.integers(0, feat.config.vocab_buckets, size=shape).astype(np.int32)
    )
    mask = jnp.asarray((rng.random(shape) < 0.8).astype(np.float32))

    t0 = time.time()
    state, loss, gn = step(state, ids, mask, ids_k, mask)
    jax.block_until_ready(loss)
    log(f"first step (compile) {time.time()-t0:.1f}s loss={float(loss):.3f}")

    reps = 30
    t0 = time.time()
    for _ in range(reps):
        state, loss, gn = step(state, ids, mask, ids_k, mask)
    jax.block_until_ready(loss)
    dt = time.time() - t0
    sps = reps / dt
    log(f"steady {sps:.2f} steps/s ({sps * cfg.micro_batch * cfg.accum_steps:.0f} pairs/s)")
    print(
        json.dumps(
            {
                "metric": "contrastive_train_steps_per_sec_effbatch256",
                "value": round(sps, 2),
                "unit": "steps/s",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
