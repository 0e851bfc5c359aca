"""Secondary benchmark: contrastive train-step throughput on one chip.

Default mode measures compiled steps/sec with pre-staged device batches
(effective batch 256 = 128 x 2 micro-batches, reference training shape:
BiLSTM 3x256 head over 768-d features, NT-Xent with 12544-slot queue) — the
pure-device workload of ``src/train.py``'s inner loop.

``--e2e`` measures the REAL training loop instead: ``ContrastiveTrainer``
over a synthetic corpus, i.e. host pair sampling + C++ tokenize/hash
(``encode_host``) + async dispatch — the path the reference's DataLoader
workers feed (``src/dataset.py:159-182`` + ``src/train.py:86-199``). The
gap between the two modes is exactly the host-assembly overhead that JAX
async dispatch must hide; before the round-3 host-runtime pass it capped
end-to-end training at ~11 steps/s against a ~70 steps/s compiled step.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main_e2e(args):
    """End-to-end trainer throughput: sampler -> encode_host -> train step."""
    import os
    import tempfile

    if args.cpu:
        # beat the pinned axon plugin: env var alone is insufficient
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if "PYTEST_CURRENT_TEST" not in os.environ:
        # Persistent cache only for real bench runs. Under pytest this
        # would silently switch the WHOLE test process onto the shared
        # /tmp cache for every later test — and one truncated entry (a
        # bench killed mid-write) then SIGABRTs an unrelated test's
        # deserialization. Round 5 lost a day's suite runs to exactly
        # that (deterministic abort in test_pp, green standalone).
        jax.config.update("jax_compilation_cache_dir", "/tmp/ircl_jax_cache")

    from ircl_tpu.contrastive.state import TrainConfig
    from ircl_tpu.contrastive.trainer import ContrastiveTrainer
    from ircl_tpu.corpus.synthetic import generate
    from ircl_tpu.data.pairs import DocPairSampler
    from ircl_tpu.models.featurizer import FeaturizerConfig, HashEmbedFeaturizer

    wiki = generate(num_docs=args.docs, num_claims=1, seed=11)
    docs = list(wiki.sentences.values())
    sampler = DocPairSampler(docs, sample="augment", seed=7)
    if args.tiny:
        # smoke-test shapes (CPU-runnable); throughput numbers meaningless
        from ircl_tpu.models.encoder import EncoderConfig

        feat = HashEmbedFeaturizer(
            FeaturizerConfig(dim=16, max_len=8, vocab_buckets=1 << 10)
        )
        cfg = TrainConfig(
            encoder=EncoderConfig(
                input_size=16, hidden_size=8, output_size=8, num_layers=1
            ),
            queue_size=16,
            queue_start_steps=2,
            micro_batch=8,
            accum_steps=2,
        )
    else:
        feat = HashEmbedFeaturizer(FeaturizerConfig(dim=768, max_len=64))
        cfg = TrainConfig()

    with tempfile.TemporaryDirectory() as td:
        tr = ContrastiveTrainer(
            cfg, feat, sampler, ckptdir=td + "/c", logdir=td + "/l"
        )
        t0 = time.time()
        tr.train(total_steps=args.warmup_steps, log_step=10**9)
        # real host<->device sync (device scalar transfer); on axon,
        # block_until_ready alone can return before execution finishes
        assert int(tr.state.step) == args.warmup_steps
        log(f"warmup {args.warmup_steps} steps (incl. compile) "
            f"{time.time()-t0:.1f}s")

        total = args.warmup_steps + args.steps
        t0 = time.time()
        tr.train(total_steps=total, log_step=10**9)
        assert int(tr.state.step) == total
        dt = time.time() - t0
    sps = args.steps / dt
    log(f"e2e {sps:.2f} steps/s ({sps * cfg.micro_batch * cfg.accum_steps:.0f}"
        f" pairs/s) over {args.steps} steps")
    print(
        json.dumps(
            {
                "metric": "contrastive_train_e2e_steps_per_sec_effbatch256",
                "value": round(sps, 2),
                "unit": "steps/s",
                "vs_baseline": None,
            }
        )
    )


def main(args=None):
    import os

    if args is not None and args.cpu:
        # beat the pinned axon plugin: env var alone is insufficient
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp

    if args is not None and args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if "PYTEST_CURRENT_TEST" not in os.environ:
        # see main_e2e: never leak the shared persistent cache into pytest
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
    p = argparse.ArgumentParser()
    p.add_argument("--e2e", action="store_true",
                   help="measure the real trainer loop (host assembly "
                        "included) instead of pre-staged device batches")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--warmup-steps", type=int, default=20)
    p.add_argument("--docs", type=int, default=2000)
    p.add_argument("--tiny", action="store_true",
                   help="smoke-test shapes (CPU-runnable)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (for smoke tests while the "
                        "TPU tunnel is down)")
    a = p.parse_args()
    if not a.cpu:
        from ircl_tpu.utils.benchtime import probe_backend, unavailable_line

        if not probe_backend():
            unavailable_line(
                "contrastive_train_e2e_steps_per_sec_effbatch256"
                if a.e2e
                else "contrastive_train_steps_per_sec_effbatch256",
                "steps/s",
            )
            sys.exit(0)
    main_e2e(a) if a.e2e else main(a)
