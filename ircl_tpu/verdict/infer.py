"""Verdict inference: reload a trained checkpoint and classify claims.

Serving-side completion of the reference pipeline — retrieve evidence,
then classify the claim against it (``src/QA/evaluate.py``; labels per
``src/QA/dataset.py:77,90``). ``load_verdict_checkpoint`` reloads the
artifacts ``cli train-verdict`` persists (verdict_config.json,
verdict_vocab.txt, the orbax params dir) and ``VerdictClassifier`` runs
pinned-shape batched prediction: every device call is exactly
``(batch_size, max_length)``, so after ``warmup()`` the /verdict serving
endpoint never recompiles.
"""

from __future__ import annotations

import functools
import json
import os
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ircl_tpu.verdict.model import VerdictConfig, verdict_apply

# inverse of corpus.fever.LABEL_MAP (SUPPORTS=1 / REFUTES=0)
LABEL_NAMES = {1: "SUPPORTS", 0: "REFUTES"}


def load_verdict_checkpoint(ckptdir: str):
    """(cfg, params, tokenizer) from a ``cli train-verdict`` output dir."""
    import orbax.checkpoint as ocp

    from ircl_tpu.models.transformer import TransformerConfig
    from ircl_tpu.models.wordpiece import WordPieceTokenizer
    from ircl_tpu.verdict.model import init_verdict_params

    with open(os.path.join(ckptdir, "verdict_config.json")) as f:
        meta = json.load(f)
    enc_kwargs = {k: v for k, v in meta["encoder"].items() if k != "dtype"}
    if enc_kwargs.get("moe"):  # dataclasses.asdict flattened MoEConfig
        from ircl_tpu.models.moe import MoEConfig

        enc_kwargs["moe"] = MoEConfig(**enc_kwargs["moe"])
    cfg = VerdictConfig(
        encoder=TransformerConfig(**enc_kwargs),
        num_labels=meta["num_labels"],
        max_length=meta["max_length"],
    )
    tok = WordPieceTokenizer.from_vocab_file(
        os.path.join(ckptdir, "verdict_vocab.txt")
    )
    template = init_verdict_params(jax.random.PRNGKey(0), cfg)
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(
        os.path.abspath(os.path.join(ckptdir, "verdict")),
        jax.tree.map(np.asarray, template),
    )
    return cfg, params, tok


@functools.partial(jax.jit, static_argnames=("cfg",))
def _probs_batch(params, cfg: VerdictConfig, ids, mask, types):
    return jax.nn.softmax(
        verdict_apply(params, cfg, ids, mask, types), axis=-1
    )


class VerdictClassifier:
    """Pinned-shape claim classifier over (claim, evidence-text) pairs.

    ``classify`` accepts any number of pairs and always dispatches device
    batches of exactly ``batch_size`` (tail padded with empty pairs,
    dropped from the output) at the checkpoint's ``max_length`` — the
    compile key never changes after the first call (``warmup``)."""

    def __init__(self, cfg: VerdictConfig, params, tokenizer,
                 batch_size: int = 32):
        if batch_size <= 0:
            raise ValueError(f"batch_size must be positive, got {batch_size}")
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        # device-put once: numpy trees would re-ride the transfer tunnel
        # on every dispatch
        self.params = jax.device_put(params)

    @classmethod
    def from_checkpoint(cls, ckptdir: str, batch_size: int = 32):
        cfg, params, tok = load_verdict_checkpoint(ckptdir)
        return cls(cfg, params, tok, batch_size=batch_size)

    def warmup(self) -> None:
        self.classify(["warmup"], ["warmup evidence"])

    def classify(
        self, claims: Sequence[str], evidence_texts: Sequence[str]
    ) -> List[dict]:
        """One ``{"label", "label_id", "confidence"}`` per claim;
        ``confidence`` is the softmax probability of the argmax label."""
        if len(claims) != len(evidence_texts):
            raise ValueError(
                f"{len(claims)} claims vs {len(evidence_texts)} evidence texts"
            )
        out: List[dict] = []
        B = self.batch_size
        for lo in range(0, len(claims), B):
            pairs = [
                (c, e)
                for c, e in zip(claims[lo : lo + B], evidence_texts[lo : lo + B])
            ]
            n_real = len(pairs)
            pairs += [("", "")] * (B - n_real)
            ids, mask, types = self.tokenizer.encode_batch(
                pairs, self.cfg.max_length
            )
            probs = np.asarray(
                _probs_batch(
                    self.params, self.cfg,
                    jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types),
                )
            )[:n_real]
            pred = probs.argmax(axis=-1)
            out.extend(
                {
                    "label": LABEL_NAMES.get(int(p), str(int(p))),
                    "label_id": int(p),
                    "confidence": float(probs[i, p]),
                }
                for i, p in enumerate(pred)
            )
        return out
