"""Claim-verdict classification (extrinsic evaluation of retrieval)."""

from ircl_tpu.verdict.model import VerdictConfig, init_verdict_params, verdict_apply
from ircl_tpu.verdict.evaluate import classification_report

__all__ = [
    "VerdictConfig",
    "init_verdict_params",
    "verdict_apply",
    "classification_report",
]
