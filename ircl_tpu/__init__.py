"""ircl_tpu — TPU-native FEVER evidence retrieval framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
PM25/Information-Retrieval-with-Contrastive-Learning:

- ``corpus``      host-side text layer: tokenization, feature hashing, FEVER parsing,
                  document stores (reference: ``preprocessing/``).
- ``index``       hashed-ngram count / TF-IDF sparse index, built host-side and
                  resident in HBM as CSR; batched query scoring on TPU
                  (reference: ``preprocessing/drqa/``).
- ``ops``         TPU compute kernels: Pallas sparse matvec/top-k, BiLSTM via
                  ``lax.scan``, k-means, blocked similarity.
- ``models``      JAX transformer featurizer + BiLSTM projection head + verdict
                  classifier (reference: ``src/model.py``, ``src/QA/model.py``).
- ``contrastive`` jit'd InfoNCE/ProtoNCE training with momentum encoder and
                  negative queue as functional state (reference: ``src/contrastor/``).
- ``dense``       corpus embedding sweeps and blocked cosine top-k scoring
                  (reference: ``src/evaluation.py`` dense path).
- ``pipeline``    two-stage retrieval (sparse candidates -> dense re-rank) and the
                  recall@k harness (the judged metric).
- ``parallel``    device mesh, shardings, and distributed top-k merge over ICI.
- ``utils``       checkpointing, logging, profiling.
"""

__version__ = "0.1.0"
