"""Client: local trainer for one federated participant.

Orchestration analog of the reference Client (client.py:116-582), with all
math in the jitted steps of ``trainer.py``.  State lives in explicit pytrees;
between rounds the heavyweight pieces (last-round backbone, BCE params, local
FC) persist on host, and the train state is assembled on device per round.
"""

from __future__ import annotations

import contextlib
import logging
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FedFRConfig
from ..data.datasets import BatchLoader, CombinedDataset, FaceRecordDataset
from ..data.pipeline import DevicePrefetcher
from ..utils.optim import step_lr
from .embed import (auto_embed_fn, class_mean_features, embed_dataset,
                    hard_negative_mask, max_similarity)
from .trainer import (init_client_state, make_branch_train_step,
                      make_plain_train_step, use_cached_contrastive)

logger = logging.getLogger("fedfr_tpu.client")


@jax.jit
def _metrics_sum(acc, m):
    """Running on-device sum of the four loss components — one tiny fused
    add per step instead of a per-step host sync, so the reported average
    is the all-step mean (reference AverageMeter semantics,
    client.py:349-352,404) at zero pipeline cost."""
    return acc + jnp.stack(list(m))


def _run_key(seed: int, round_seed: int, cid: int):
    """Per-(round, client) PRNG key for the jitted step's augmentation
    stream.  Folds both ids into the stream — the old ``seed + 31*round +
    cid`` summing collided across (round, client) pairs once num_clients
    exceeded the multiplier (round 1 client 0 == round 0 client 31)."""
    return jax.random.fold_in(jax.random.fold_in(
        jax.random.PRNGKey(seed), round_seed), cid)


def _loader_seed(seed: int, round_seed: int, cid: int) -> int:
    """Per-(round, client) loader shuffle seed, collision-free for any
    realistic client count (the old ``seed + 17*round + cid`` reused
    streams across runs)."""
    return seed + 1_000_003 * round_seed + cid


def _clone_tree(tree):
    """Fresh device buffers for a pytree (host arrays upload).

    The train step donates its state; cloning here keeps the server's
    device-resident global model (and anything else aliasing these buffers)
    valid after donation."""
    return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), tree)


class Client:
    def __init__(self, cid: int, cfg: FedFRConfig, dataset: FaceRecordDataset,
                 backbone, bce_module, rng: np.random.Generator,
                 embed_fn=None):
        self.cid = cid
        self.cfg = cfg
        self.dataset = dataset
        self.backbone = backbone
        self.bce_module = bce_module
        self.num_classes = int(dataset.num_classes or 0)
        self.dataset_size = len(dataset)
        self.id_base = int(dataset.id_base or cid * self.num_classes)
        self.target_ids = list(range(self.id_base, self.id_base + self.num_classes))
        self.rng = rng

        # Per-client initializations run on the in-process CPU backend: the
        # values are PRNG-determined (backend-independent), the arrays are
        # tiny-to-moderate and upload in one burst at first use, and N
        # clients x a few one-off device programs would otherwise serialize
        # through the accelerator's compile path at startup (remote-compile
        # rigs pay minutes per program).
        E = cfg.model.embedding_size
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            key = jax.random.PRNGKey(cfg.runtime.seed + 1000 + cid)
            # FC_module init: N(0, 0.01) rows (client.py:66)
            self.fc_local = np.asarray(
                0.01 * jax.random.normal(key, (self.num_classes, E)),
                np.float32)
            self.bce_vars: Optional[Dict[str, Any]] = None
            if cfg.fed.bce_local:
                bkey = jax.random.PRNGKey(cfg.runtime.seed + 2000 + cid)
                self.bce_vars = jax.device_get(bce_module.init(
                    bkey, jnp.zeros((1, E)), jnp.zeros((1,), jnp.int32)))
            # MOON "last model": randomly initialized at client creation
            # (client.py:153), replaced by the trained backbone each round
            if cfg.fed.contrastive:
                lkey = jax.random.PRNGKey(cfg.runtime.seed + 3000 + cid)
                hw = cfg.data.image_size
                self.last_backbone = jax.device_get(backbone.init(
                    lkey, jnp.zeros((1, hw, hw, 3)), train=False))
            else:
                self.last_backbone = None

        self.last_loss = 0.0
        self.trained_backbone: Optional[Dict[str, Any]] = None
        self.global_fc: Optional[np.ndarray] = None
        self.timer = None  # server-shared SpanTimer (phase breakdown)

        # one compiled embed executable is shared across the server and all
        # clients (the Server passes its own in; a per-client auto_embed_fn
        # would trace N copies and, on multi-device meshes, retain N
        # replicated backbone copies in HBM)
        self._embed_fn = embed_fn if embed_fn is not None else auto_embed_fn(backbone)

    def _span(self, name: str):
        return (self.timer.span(name) if self.timer is not None
                else contextlib.nullcontext())

    # ------------------------------------------------------------- FC init

    def init_fc_from_means(self, backbone_vars, normalize_before: bool = False) -> None:
        """Mean-embedding FC initialization (reference data_update_fc,
        client.py:159-188)."""
        feats, labels = embed_dataset(self._embed_fn, backbone_vars, self.dataset,
                                      self.cfg.data.eval_batch_size, l2norm=False)
        self.fc_local = class_mean_features(feats, labels, self.num_classes,
                                            normalize_before)

    def init_bce_from_fc(self) -> None:
        """BCE weight := local FC rows (reference server.py:128-133)."""
        if self.bce_vars is not None:
            self.bce_vars = dict(self.bce_vars)
            params = dict(self.bce_vars["params"])
            params["weight"] = jnp.asarray(self.fc_local)
            self.bce_vars["params"] = params

    # ------------------------------------------------------------ training

    def select_hard_negatives(self, backbone_vars, public_dataset: FaceRecordDataset,
                              public_feats: np.ndarray,
                              public_labels: np.ndarray) -> FaceRecordDataset:
        """Feature-based mining (client.py:191-224): embed the local set with
        the current backbone, keep public images with cos-sim > threshold."""
        local_feats, _ = embed_dataset(self._embed_fn, backbone_vars, self.dataset,
                                       self.cfg.data.eval_batch_size, l2norm=True,
                                       return_device=True)
        scores = max_similarity(local_feats, public_feats)
        mask = scores > self.cfg.fed.hn_threshold
        cap = self.cfg.fed.hn_cap
        if cap and int(mask.sum()) > cap:
            # bounded-cost variant: keep only the cap HARDEST images (highest
            # max cos-sim).  Deterministic: argsort on scores with the image
            # index as tiebreak via stable kind.
            over = np.nonzero(mask)[0]
            keep = over[np.argsort(scores[over], kind="stable")[::-1][:cap]]
            mask = np.zeros_like(mask)
            mask[keep] = True
            logger.info("client %d: mining capped at %d hardest (of %d above "
                        "threshold)", self.cid, cap, len(over))
        imgidx = np.nonzero(mask)[0] + 1  # record keys are 1-based
        num_ids = len(np.unique(public_labels[mask])) if mask.any() else 0
        logger.info("client %d: %d imgs (%d IDs) hard negative @ > %.2f",
                    self.cid, len(imgidx), num_ids, self.cfg.fed.hn_threshold)
        if len(imgidx) == 0:
            imgidx = np.array([1])
        return public_dataset.subset(imgidx)

    def select_hard_negatives_fc(self, pretrain_fc: np.ndarray,
                                 public_dataset: FaceRecordDataset,
                                 public_labels: np.ndarray,
                                 threshold: float = 0.2) -> FaceRecordDataset:
        """FC-based mining (reference choose_hard_negative, client.py:227-267):
        cosine similarity between the client's local FC rows and the public FC
        rows selects hard-negative identities; all their images survive."""
        sim = np.asarray(jax.jit(
            lambda a, b: jnp.dot(
                a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-12),
                (b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-12)).T,
                precision=jax.lax.Precision.HIGHEST))(
            jnp.asarray(self.fc_local), jnp.asarray(pretrain_fc)))
        ids = np.unique(np.nonzero(sim > threshold)[1])
        logger.info("client %d: %d IDs are hard negative (FC-based)",
                    self.cid, len(ids))
        keep = np.isin(public_labels, ids)
        imgidx = np.nonzero(keep)[0] + 1
        if len(imgidx) == 0:
            imgidx = np.array([1])
        return public_dataset.subset(imgidx)

    def prepare_local_run(self, backbone_vars, public_dataset,
                          pretrained_fc: np.ndarray,
                          public_feats: Optional[np.ndarray],
                          public_labels: Optional[np.ndarray],
                          round_seed: int = 0):
        """Mining + combined loader + initial device state for one local run.

        Shared by the sequential path (train_with_public_data) and the
        client-parallel round (server.train_round_parallel).
        """
        cfg = self.cfg
        with self._span("phase/mining"):
            if cfg.fed.hn_strategy == "fc":
                public_subset = self.select_hard_negatives_fc(
                    pretrained_fc, public_dataset, public_labels,
                    threshold=cfg.fed.hn_fc_threshold)
            elif public_feats is not None:
                public_subset = self.select_hard_negatives(
                    backbone_vars, public_dataset, public_feats, public_labels)
            else:
                public_subset = public_dataset
        combined = CombinedDataset(self.dataset, public_subset)
        self.dataset_size = len(combined)  # FedAvg weight update (client.py:303)

        loader = BatchLoader(combined, cfg.data.combined_batch_size, shuffle=True,
                             seed=_loader_seed(cfg.runtime.seed, round_seed, self.cid),
                             drop_last=True, num_workers=cfg.data.num_workers)

        # assemble device state: fc = [local ; global] (client.py:313).
        # The backbone is CLONED into the state: the step donates its state
        # buffers, and under --device_cache the incoming tree aliases the
        # server's device-resident global model.
        fc = jnp.concatenate([jnp.asarray(self.fc_local), jnp.asarray(pretrained_fc)])
        state = init_client_state(
            _clone_tree(backbone_vars), fc,
            jax.tree_util.tree_map(jnp.asarray, self.bce_vars))
        last_vars = (jax.tree_util.tree_map(jnp.asarray, self.last_backbone)
                     if self.last_backbone is not None
                     else jax.tree_util.tree_map(jnp.asarray, backbone_vars))
        return combined, loader, state, last_vars

    def finalize_local_run(self, state, avg_loss: float) -> None:
        """Persist the trained state (client.py:468-508).

        The FC / BCE heads always come back to host (small, and consumed by
        host-side bookkeeping: SpreadOut, FC FedAvg, checkpointing).  The
        trained backbone comes to host too UNLESS ``runtime.device_cache``:
        then it stays device-resident — aggregation and the next round's
        contrastive forward read it in place, so a round moves no backbone
        bytes over the host link at all.  The optimizer momentum is dropped
        either way (the reference builds a fresh SGD per local run,
        client.py:335).
        """
        if not np.isfinite(avg_loss):
            logger.warning(
                "client %d: NON-FINITE loss %r — the local run diverged and "
                "FedAvg will propagate it to the global model (sphere nets "
                "typically need lr <= 0.001, reference run.sh:2)",
                self.cid, avg_loss)
        from ..utils.transfer import chunked_device_get

        fc_np = chunked_device_get(state.fc)
        self.fc_local = fc_np[: self.num_classes]
        self.global_fc = fc_np[self.num_classes:]
        self.bce_vars = (chunked_device_get(state.bce)
                         if state.bce is not None else None)
        if self.cfg.runtime.device_cache:
            self.trained_backbone = state.backbone
        else:
            self.trained_backbone = chunked_device_get(state.backbone)
        if self.last_backbone is not None:
            self.last_backbone = self.trained_backbone
        self.last_loss = float(avg_loss)

    def train_with_public_data(self, backbone_vars, public_dataset,
                               pretrained_fc: np.ndarray,
                               public_feats: Optional[np.ndarray],
                               public_labels: Optional[np.ndarray],
                               local_epochs: int, train_decay: int,
                               step_fn=None, round_seed: int = 0) -> Dict[str, float]:
        """One local run of the joint objective (client.py:287-508)."""
        cfg = self.cfg
        combined, base_loader, state, last_vars = self.prepare_local_run(
            backbone_vars, public_dataset, pretrained_fc, public_feats,
            public_labels, round_seed)
        loader = DevicePrefetcher(base_loader, depth=cfg.data.prefetch)
        global_vars = jax.tree_util.tree_map(jnp.asarray, backbone_vars)

        if len(loader) == 0:  # fail fast BEFORE the cache build below
            raise ValueError(
                f"client {self.cid}: combined dataset ({len(combined)} imgs) "
                f"smaller than the batch size {cfg.data.combined_batch_size}")

        use_cache = use_cached_contrastive(cfg)
        if use_cache:
            # both frozen MOON models are fixed for this whole local run (and
            # eval-mode), so embed the combined dataset ONCE (one decode/
            # upload pass, both models per batch) at full embedding batch
            # size; the step gathers by (position, flip)
            from .embed import embed_flip_caches

            with self._span("phase/contrastive_cache"):
                g_cache, l_cache = embed_flip_caches(
                    self._embed_fn, [global_vars, last_vars], combined,
                    cfg.data.eval_batch_size)

        if step_fn is None:
            step_fn = make_branch_train_step(
                self.backbone, self.bce_module, margin=cfg.loss.loss,
                s=cfg.loss.margin_s, m=cfg.loss.margin_m,
                bce_weight=cfg.loss.bce_weight, bce_r=cfg.loss.bce_r,
                bce_lambda=cfg.loss.bce_lambda, mu=cfg.loss.mu,
                temperature=cfg.loss.temperature, momentum=cfg.optim.momentum,
                weight_decay=cfg.optim.weight_decay, bce_detach=cfg.fed.bce_detach,
                contrastive=cfg.fed.contrastive, reweight=cfg.fed.reweight_cosface,
                num_local=self.num_classes, num_clients=cfg.data.num_clients,
                fedprox_mu=cfg.fed.fedprox_mu, cached_contrastive=use_cache)

        import time

        key = jnp.asarray(_run_key(cfg.runtime.seed, round_seed, self.cid))
        # all-step loss accumulation happens ON DEVICE (one fused 4-float
        # add per step); the reported average is the mean over every step of
        # the run — the reference's AverageMeter semantics
        # (client.py:349-352,404) — with still only one host sync per epoch
        acc = jnp.zeros(4)
        n_steps = 0
        sums = np.zeros(4, np.float32)  # stays zero if local_epochs == 0
        cos_trace = []
        try:
            for epoch in range(local_epochs):
                lr = step_lr(cfg.optim.lr, epoch, train_decay,
                             cfg.optim.lr_gamma)
                tic = time.time()
                epoch_steps = 0
                with self._span("phase/local_train"):
                    for batch in loader.epoch(with_positions=use_cache):
                        if use_cache:
                            imgs, labels, valid, idx = batch
                            state, metrics = step_fn(state, g_cache, l_cache,
                                                     imgs, labels, valid, idx,
                                                     lr, key, n_steps)
                        else:
                            imgs, labels, valid = batch
                            state, metrics = step_fn(state, global_vars,
                                                     last_vars, imgs, labels,
                                                     valid, lr, key, n_steps)
                        acc = _metrics_sum(acc, metrics)
                        n_steps += 1
                        epoch_steps += 1
                    # pull the running sums once per epoch (this device_get
                    # is also the epoch's completion barrier for timing)
                    sums = np.asarray(jax.device_get(acc))
                speed = (epoch_steps * cfg.data.combined_batch_size
                         / max(time.time() - tic, 1e-9))
                mean = sums / max(n_steps, 1)
                cos_trace.append(float(mean[1]))
                logger.info("client %d epoch %d/%d lr %.5f loss %.3f "
                            "(cos %.3f bce %.3f con %.3f) %.1f samples/sec",
                            self.cid, epoch + 1, local_epochs, lr,
                            mean[0], mean[1], mean[2], mean[3], speed)
        finally:
            base_loader.close()  # even on a mid-run failure
        loss_sum = sums

        # collapsed-feature diagnostic: with every pair cosine equal (e.g. an
        # exploded pretrained backbone, XNorm ~1e18), the CosFace CE pins at
        # s*m + log(C-1) and its gradient cancels — the run silently learns
        # nothing until fp overflow turns it NaN.  Catch it from the logged
        # metrics (zero extra compute).
        if (cfg.loss.loss == "CosFace" and len(cos_trace) >= 2
                and abs(cos_trace[-1] - cos_trace[0]) < 1e-3):
            sat = (cfg.loss.margin_s * cfg.loss.margin_m
                   + float(np.log(max(int(state.fc.shape[0]) - 1, 1))))
            if abs(cos_trace[-1] - sat) < 0.1:
                logger.warning(
                    "client %d: cos loss pinned at the all-equal-cosine "
                    "saturation value %.3f for %d epochs — features look "
                    "collapsed; check the pretrained backbone (feature-norm "
                    "explosion upstream, e.g. too-high pretrain lr)",
                    self.cid, sat, len(cos_trace))

        self.finalize_local_run(state, loss_sum[0] / max(n_steps, 1))
        return {"loss": self.last_loss, "steps": n_steps,
                "dataset_size": self.dataset_size}

    def prepare_plain_run(self, backbone_vars, round_seed: int = 0):
        """Loader + initial device state for one plain local run; shared by
        the sequential path (train) and the plain client-parallel round."""
        cfg = self.cfg
        loader = BatchLoader(
            self.dataset, cfg.data.batch_size, shuffle=True,
            seed=_loader_seed(cfg.runtime.seed, round_seed, self.cid),
            drop_last=False, num_workers=cfg.data.num_workers)
        state = init_client_state(
            _clone_tree(backbone_vars), jnp.asarray(self.fc_local), None)
        return loader, state

    def finalize_plain_run(self, state, avg_loss: float) -> None:
        """Persist a plain run's state (client.py:566-570 semantics)."""
        if not np.isfinite(avg_loss):
            logger.warning("client %d: NON-FINITE loss %r in plain local "
                           "training", self.cid, avg_loss)
        from ..utils.transfer import chunked_device_get

        self.fc_local = chunked_device_get(state.fc)
        if self.cfg.runtime.device_cache:
            self.trained_backbone = state.backbone
        else:
            self.trained_backbone = chunked_device_get(state.backbone)
        self.last_loss = float(avg_loss)
        self.dataset_size = len(self.dataset)

    def train(self, backbone_vars, local_epochs: int, lr: float,
              step_fn=None, round_seed: int = 0) -> Dict[str, float]:
        """Plain CosFace-only local training (client.py:511-571)."""
        cfg = self.cfg
        base_loader, state = self.prepare_plain_run(backbone_vars, round_seed)
        loader = DevicePrefetcher(base_loader, depth=cfg.data.prefetch)
        if step_fn is None:
            step_fn = make_plain_train_step(
                self.backbone, margin=cfg.loss.loss, s=cfg.loss.margin_s,
                m=cfg.loss.margin_m, momentum=cfg.optim.momentum,
                weight_decay=cfg.optim.weight_decay)
        key = jnp.asarray(_run_key(cfg.runtime.seed, round_seed, self.cid))
        loss_acc = jnp.zeros(())
        n_steps = 0
        try:
            with self._span("phase/local_train"):
                for _ in range(local_epochs):
                    for imgs, labels, valid in loader.epoch():
                        state, loss = step_fn(state, imgs, labels, valid, lr,
                                              key, n_steps)
                        loss_acc = loss_acc + loss  # on-device running sum
                        n_steps += 1
        finally:
            base_loader.close()
        # all-step mean, as the reference's AverageMeter (client.py:541-548)
        self.finalize_plain_run(state, float(loss_acc) / max(n_steps, 1))
        return {"loss": self.last_loss, "steps": n_steps,
                "dataset_size": self.dataset_size}
