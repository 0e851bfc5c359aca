"""Host training driver: sampling, jitted steps, clustering refresh,
checkpointing, metrics.

The single compiled ``train_step`` replaces the reference's Python inner loop
(``src/train.py:86-199``); this module is the thin host orchestration around
it: per-step pair sampling, the ProtoNCE/HProtoNCE cluster refresh schedule
(``src/train.py:96-122``: every ``cluster_update_steps`` after
``cluster_start_steps``), negative-prototype sampling, checkpoint + metrics
every ``log_step``, and resume. Queue activation needs no host logic — it is
a traced flag inside the step.

The reference's CUDA-OOM catch-and-continue (``src/train.py:190-195``) has no
analogue: shapes are static, so memory use is fixed at compile time.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ircl_tpu.contrastive.cluster import ClusterResult, run_hierarchical, run_kmeans
from ircl_tpu.contrastive.losses import sample_negative_prototypes
from ircl_tpu.contrastive.state import TrainConfig, init_train_state
from ircl_tpu.contrastive.train import make_embed_fn, make_train_step
from ircl_tpu.data.pairs import DocPairSampler
from ircl_tpu.dense.embed import embed_corpus
from ircl_tpu.utils.checkpoint import latest_checkpoint, restore_state, save_state
from ircl_tpu.utils.metrics import MetricsLogger


class ContrastiveTrainer:
    def __init__(
        self,
        config: TrainConfig,
        featurizer,
        sampler: DocPairSampler,
        ckptdir: str = "ckpt",
        logdir: str = "log",
        tag: Optional[str] = None,
        seed: int = 1337,
        mesh=None,  # jax.sharding.Mesh with a "data" axis: real DP training
    ):
        self.config = config
        self.featurizer = featurizer
        self.sampler = sampler
        self.ckptdir = ckptdir
        self.tag = tag or f"{sampler.sample}_{config.loss}_LSTM"
        self.metrics = MetricsLogger(logdir, self.tag)
        if mesh is not None:
            # Data-parallel step (parallel/dp.py): same math, global batch
            # sharded over the mesh's "data" axis; micro_batch must divide
            # the axis size. Batches/proto inputs are committed per call.
            from ircl_tpu.parallel.dp import make_dp_train_step

            dp_step, self._place_state, place_batch, place_proto = (
                make_dp_train_step(config, featurizer, mesh)
            )

            def step_fn(state, ids_a, mask_a, ids_k, mask_k, proto=None):
                return dp_step(
                    state,
                    *place_batch(ids_a, mask_a, ids_k, mask_k),
                    place_proto(proto),
                )

            self.step_fn = step_fn
        else:
            self._place_state = lambda s: s
            self.step_fn = make_train_step(config, featurizer)
        self.embed_fn = make_embed_fn(config, featurizer)
        self.state = self._place_state(
            init_train_state(jax.random.PRNGKey(seed), config)
        )
        self._proto_key = jax.random.PRNGKey(seed + 1)
        self.cluster_result: Optional[ClusterResult] = None
        # cumulative cluster-refresh cost (full-corpus embed + clustering);
        # the reference never measures this (src/train.py:96-122)
        self.refresh_seconds = 0.0
        self.refresh_count = 0

    # -- resume -------------------------------------------------------------

    def maybe_resume(self) -> int:
        path = latest_checkpoint(self.ckptdir, self.tag)
        if path:
            self.state = self._place_state(restore_state(path, self.state))
        return int(self.state.step)

    # -- clustering ---------------------------------------------------------

    def _refresh_clusters(self) -> None:
        t0 = time.time()
        cfg = self.config
        # Embed one anchor sentence per document, in document order, so
        # emb2cluster[doc_idx] is well-defined. (The reference embeds both
        # random views of every item and indexes the stacked list by dataset
        # idx — an index/embedding mismatch we do not reproduce.) Docs with
        # no sentences (kept in sampler.docs for index stability; never
        # sampled) embed the empty string rather than crashing.
        texts = [doc[0] if doc else "" for doc in self.sampler.docs]
        emb = embed_corpus(
            self.embed_fn, self.state.params_q, self.featurizer, texts
        )
        if cfg.loss == "HProtoNCE":
            self.cluster_result = run_hierarchical(
                emb, cfg.num_clusters, cfg.temperature
            )
        else:
            self.cluster_result = run_kmeans(
                emb, cfg.num_clusters, cfg.temperature
            )
        self.refresh_seconds += time.time() - t0
        self.refresh_count += 1

    def _proto_inputs(self, doc_idx: np.ndarray):
        """Per-granularity batch cluster ids + sampled negative prototypes."""
        if self.cluster_result is None:
            return None
        cr = self.cluster_result
        ids, negs = [], []
        for g in range(cr.num_granularities):
            batch_ids = cr.emb2cluster[g][jnp.asarray(doc_idx)]
            ids.append(batch_ids)
            self._proto_key, sub = jax.random.split(self._proto_key)
            num_neg = min(
                self.config.num_neg_proto, cr.centroids[g].shape[0] - 1
            )
            negs.append(
                sample_negative_prototypes(
                    sub,
                    cr.centroids[g].shape[0],
                    batch_ids.reshape(-1),
                    num_neg,
                )
            )
        return (ids, cr.centroids, cr.density, negs)

    # -- main loop ----------------------------------------------------------

    def train(self, total_steps: Optional[int] = None, log_step: int = 100):
        cfg = self.config
        total = total_steps or cfg.total_steps
        start = int(self.state.step)
        uses_proto = cfg.loss in ("ProtoNCE", "HProtoNCE")

        # Resume: an uninterrupted Proto run past cluster_start_steps always
        # has live prototypes, but a restart leaves cluster_result None until
        # the next update boundary — up to cluster_update_steps-1 steps of
        # silently proto-free training. Refresh immediately instead.
        if (
            uses_proto
            and self.cluster_result is None
            and start >= cfg.cluster_start_steps
            and start % cfg.cluster_update_steps != 0  # loop refreshes then
        ):
            self._refresh_clusters()

        losses = []
        t0 = time.time()
        batch_iter = self.sampler.batches(
            self.featurizer, cfg.accum_steps, cfg.micro_batch, total - start
        )
        for i, (doc_idx, ids_a, mask_a, ids_k, mask_k) in enumerate(
            batch_iter
        ):
            # Host-side step counter: int(self.state.step) would read a
            # device scalar — a full sync per step that serializes batch
            # assembly behind device execution. The train step advances
            # state.step by exactly 1 (tests pin this), so host counting
            # is equivalent.
            step = start + i
            # Reference schedule (src/train.py:96-122): refresh when
            # step >= cluster_start_steps and step % update_steps == 0.
            if (
                uses_proto
                and step >= cfg.cluster_start_steps
                and step % cfg.cluster_update_steps == 0
            ):
                self._refresh_clusters()

            proto = self._proto_inputs(doc_idx) if uses_proto else None
            self.state, loss, grad_norm = self.step_fn(
                self.state,
                jnp.asarray(ids_a),
                jnp.asarray(mask_a),
                jnp.asarray(ids_k),
                jnp.asarray(mask_k),
                proto,
            )
            # Keep the loss as a device array: float(loss) here would block
            # on every step, serializing host batch assembly behind device
            # execution (async dispatch is the pipeline — the sync happens
            # once per log interval below).
            losses.append(loss)

            new_step = step + 1
            if new_step % log_step == 0:
                # one sync per interval; also validates the host counter
                assert int(self.state.step) == new_step, (
                    int(self.state.step), new_step,
                )
                avg = float(jnp.mean(jnp.stack(losses)))
                losses = []
                sps = log_step / max(time.time() - t0, 1e-9)
                t0 = time.time()
                self.metrics.scalar("train_loss", avg, new_step)
                self.metrics.scalar("grad_norm", float(grad_norm), new_step)
                self.metrics.scalar("steps_per_sec", sps, new_step)
                save_state(self.ckptdir, self.tag, self.state)
        return self.state
