"""Secondary benchmark: verdict classifier at the reference's shape.

The reference fine-tunes roberta-base for SUPPORTS/REFUTES classification at
batch 8, max_length 512 (``src/QA/train.py:31-43``, ``src/QA/model.py:10-37``)
— reported as hours-per-epoch on its GPU. This measures the jitted TPU train
step (AdamW + linear warmup + traced body-freeze) and batched prediction at
exactly that shape, random-init (no pretrained weights offline; the compute
cost is identical).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    # "flash": Pallas TPU flash-attention kernel — at L=512 the XLA path
    # materializes [B, 12, 512, 512] probs per layer for backward
    ap.add_argument("--attention", choices=("xla", "flash"), default="xla")
    # reference shape is B=8 (src/QA/train.py:31-43); bigger batches show
    # the chip's actual headroom at the same model shape
    ap.add_argument("--batch", type=int, default=8)
    # N-expert MoE FFN instead of the dense FFN (models/moe.py); measures
    # the single-chip cost of the expert-parallel model variant
    ap.add_argument("--moe-experts", type=int, default=0)
    ap.add_argument("--moe-topk", type=int, default=2)
    # which dtypes to run; at B=64 f32 the XLA path's materialized
    # attention probs alone are ~19GB (12 x [64,12,512,512] f32) and OOM
    # a 16GB v5e — run bf16-only there (or --attention flash)
    ap.add_argument(
        "--dtypes", nargs="+", choices=("f32", "bf16"),
        default=["f32", "bf16"],
    )
    args = ap.parse_args()

    from ircl_tpu.utils.benchtime import probe_backend, unavailable_line

    if not probe_backend():
        unavailable_line(
            "verdict_train_steps_per_s_roberta_base_shape", "steps/s (B=8, L=512)"
        )
        return

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ircl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ircl_tpu.models.transformer import TransformerConfig
    from ircl_tpu.verdict.model import (
        VerdictConfig,
        init_verdict_params,
        make_verdict_train_step,
        verdict_predict,
    )

    moe = None
    if args.moe_experts:
        from ircl_tpu.models.moe import MoEConfig

        moe = MoEConfig(
            num_experts=args.moe_experts,
            top_k=min(args.moe_topk, args.moe_experts),
        )

    B, L = args.batch, 512  # reference: B=8, src/QA/train.py:31-43
    results = {}
    for tag, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        if tag not in args.dtypes:
            continue
        enc = TransformerConfig(
            vocab_size=50265,  # roberta-base
            hidden=768,
            layers=12,
            heads=12,
            intermediate=3072,
            max_positions=512,
            type_vocab=1,
            position_offset=2,
            layernorm_eps=1e-5,
            dtype=dtype,
            attention=args.attention,
            moe=moe,
        )
        cfg = VerdictConfig(encoder=enc, warmup_steps=100, max_length=L)
        params = init_verdict_params(jax.random.PRNGKey(0), cfg)
        step, tx = make_verdict_train_step(cfg)
        opt_state = tx.init(params)

        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(3, 50000, size=(B, L)), jnp.int32)
        mask = jnp.ones((B, L), jnp.float32)
        types = jnp.zeros((B, L), jnp.int32)
        labels = jnp.asarray(rng.integers(0, 2, size=(B,)), jnp.int32)

        t0 = time.time()
        params, opt_state, loss, _ = step(
            params, opt_state, jnp.int32(0), ids, mask, types, labels
        )
        float(loss)
        log(f"[{tag}] first train step (compile) {time.time()-t0:.0f}s")

        best = 0.0
        for _ in range(3):
            n = 20
            t0 = time.time()
            for i in range(n):
                params, opt_state, loss, _ = step(
                    params, opt_state, jnp.int32(i), ids, mask, types, labels
                )
            np.asarray(loss)
            best = max(best, n / (time.time() - t0))
        results[f"train_steps_per_s_{tag}"] = round(best, 2)
        results[f"train_examples_per_s_{tag}"] = round(best * B, 1)
        log(f"[{tag}] train: {best:.2f} steps/s ({best*B:.0f} ex/s)")

        # batched prediction throughput (eval pass, bigger batch)
        PB = 64
        pids = jnp.asarray(rng.integers(3, 50000, size=(PB, L)), jnp.int32)
        pmask = jnp.ones((PB, L), jnp.float32)
        ptypes = jnp.zeros((PB, L), jnp.int32)
        t0 = time.time()
        np.asarray(verdict_predict(params, cfg, pids, pmask, ptypes))
        log(f"[{tag}] predict compile {time.time()-t0:.0f}s")
        best_p = 0.0
        for _ in range(3):
            n = 10
            t0 = time.time()
            outs = [verdict_predict(params, cfg, pids, pmask, ptypes) for _ in range(n)]
            jax.block_until_ready(outs)
            np.asarray(outs[-1])
            best_p = max(best_p, n * PB / (time.time() - t0))
        results[f"predict_examples_per_s_{tag}"] = round(best_p, 1)
        log(f"[{tag}] predict: {best_p:.0f} ex/s (batch {PB})")
        del params, opt_state

    results["attention"] = args.attention
    results["batch"] = B
    if moe is not None:
        results["moe_experts"] = moe.num_experts
        results["moe_topk"] = moe.top_k
    print(
        json.dumps(
            {
                "metric": "verdict_train_steps_per_s_roberta_base_shape",
                "value": results.get(
                    "train_steps_per_s_bf16",
                    results.get("train_steps_per_s_f32"),
                ),
                "unit": f"steps/s (B={B}, L=512)",
                "detail": results,
            }
        )
    )


if __name__ == "__main__":
    main()
