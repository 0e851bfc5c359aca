"""Two-stage retrieval pipeline and recall@k evaluation harness."""

from ircl_tpu.pipeline.recall import doc_recall_at_k, sentence_recall_at_k

__all__ = ["doc_recall_at_k", "sentence_recall_at_k"]
