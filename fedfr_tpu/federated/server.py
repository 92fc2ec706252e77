"""Server: the federated coordinator.

Orchestration analog of the reference Server (server.py:68-371): holds the
global backbone, dispatches sampled clients each round, aggregates with
dataset-size-weighted FedAvg over every state leaf (BN statistics included),
averages the shared global FC, and optionally SpreadOuts the local class
centers.  Evaluation is delegated to pluggable callbacks (evalsuite).
"""

from __future__ import annotations

import contextlib
import logging
import os
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FedFRConfig
from ..data.datasets import AllClientData
from ..models import BCEModule, build_backbone
from ..parallel.fedavg import (
    fedavg_on_fc,
    spreadout,
    streaming_weighted_average,
)
from ..utils import torch_interop
from .client import Client, _run_key
from .embed import auto_embed_fn, class_mean_features, embed_dataset
from .trainer import (make_branch_train_step, make_plain_train_step,
                      use_cached_contrastive)

logger = logging.getLogger("fedfr_tpu.server")


class Server:
    def __init__(self, cfg: FedFRConfig, data: AllClientData,
                 eval_callback: Optional[Callable] = None,
                 local_eval_callback: Optional[Callable] = None):
        self.cfg = cfg
        self.data = data
        self.eval_callback = eval_callback
        self.local_eval_callback = local_eval_callback
        self.rng = np.random.default_rng(cfg.runtime.seed)

        self.backbone = build_backbone(cfg.model.network, cfg.model.embedding_size,
                                       cfg.model.dropout, cfg.model.bf16,
                                       scan_blocks=cfg.model.scan_blocks,
                                       freeze_bn=cfg.model.freeze_bn,
                                       remat_blocks=cfg.model.remat_blocks)
        self.bce_module = BCEModule(cfg.model.embedding_size,
                                    data.train_class_sizes[0],
                                    cfg.model.converter_layers,
                                    m=cfg.loss.bce_margin, r=cfg.loss.bce_scale,
                                    t=cfg.loss.bce_t)
        self._embed_fn = auto_embed_fn(self.backbone)

        # global federated model
        pre_root = cfg.runtime.pretrained_root
        bb_path = os.path.join(pre_root, "backbone.pth") if pre_root else ""
        bb_npz = os.path.join(pre_root, "backbone.npz") if pre_root else ""
        if bb_path and os.path.exists(bb_path):
            sd = torch_interop.load_pth(bb_path)
            self.federated_vars = torch_interop.backbone_from_torch(
                cfg.model.network, sd, scan_blocks=cfg.model.scan_blocks)
            logger.info("loaded pretrained backbone from %s", bb_path)
        elif bb_npz and os.path.exists(bb_npz):
            from ..utils.checkpoint import load_native

            self.federated_vars = load_native(bb_npz)
            logger.info("loaded pretrained backbone from %s", bb_npz)
        else:
            key = jax.random.PRNGKey(cfg.runtime.seed)
            hw = cfg.data.image_size
            from ..utils.transfer import chunked_device_get

            self.federated_vars = chunked_device_get(self.backbone.init(
                key, jnp.zeros((1, hw, hw, 3)), train=False))
            logger.info("train from scratch")

        from ..utils.profiling import SpanTimer

        self.timer = SpanTimer()  # per-phase round breakdown
        self.clients: List[Client] = [
            Client(cid, cfg, data.client(cid), self.backbone, self.bce_module,
                   self.rng, embed_fn=self._embed_fn)
            for cid in range(cfg.data.num_clients)]
        for c in self.clients:
            c.timer = self.timer

        # clients sampled for per-round local verification (server.py:107)
        self.local_candidates = sorted(
            self.rng.permutation(cfg.data.num_clients)[
                : cfg.fed.num_local_eval_clients].tolist())
        logger.info("local veri candidates %s", self.local_candidates)

        self.local_epoch = cfg.fed.local_epochs
        self.train_decay = cfg.optim.train_decay
        self.global_round = 0
        self.global_epoch = 0
        self.current_client_list: List[int] = []

        # pretrained (public) FC + labels
        self.pretrained_fc: Optional[np.ndarray] = None
        self.pretrained_labels: Optional[np.ndarray] = None
        if cfg.fed.add_pretrained_data:
            self._init_pretrain_fc()
        if cfg.fed.init_fc:
            self.initialize_local_fcs()
        if cfg.fed.bce_local:
            for c in self.clients:
                c.init_bce_from_fc()

        # shared compiled train steps across all clients and rounds
        # (identical shapes -> one executable each)
        self._branch_step = None
        self._plain_step = None
        self._parallel_step = None
        self._parallel_plain_step = None

    # ------------------------------------------------------------- FC init

    def _init_pretrain_fc(self) -> None:
        cfg = self.cfg
        pre_root = cfg.runtime.pretrained_root
        fc_path = os.path.join(pre_root, "fc.pth") if pre_root else ""
        lbl_path = os.path.join(pre_root, "preCos_pretrain_labels.pth") if pre_root else ""
        if lbl_path and os.path.exists(lbl_path):
            self.pretrained_labels = np.asarray(
                torch_interop.load_pth(lbl_path).numpy(), dtype=np.int64)
            logger.info("loaded pretrain labels %s", self.pretrained_labels.shape)
        elif self.data.public_dataset is not None:
            self.pretrained_labels = self.data.public_dataset.all_labels().astype(np.int64)

        if (not cfg.fed.init_fc) and fc_path and os.path.exists(fc_path):
            self.pretrained_fc = np.asarray(
                torch_interop.load_pth(fc_path).numpy(), dtype=np.float32)
            logger.info("loaded pretrained perfect FC %s", self.pretrained_fc.shape)
        else:
            # mean-embedding init over the public set (server.py:182-240)
            feats, labels = embed_dataset(
                self._embed_fn, self.federated_vars, self.data.public_dataset,
                cfg.data.public_batch_size, l2norm=False)
            n_ids = int(labels.max()) + 1
            self.pretrained_fc = class_mean_features(feats, labels, n_ids)
            logger.info("generated pretrain FC %s", self.pretrained_fc.shape)

    def initialize_local_fcs(self) -> None:
        """Mean-embedding init of every client's local FC (server.py:157-180).

        A cached init matrix (preCos_init_AN.pth, all clients' rows stacked)
        in the pretrained root is preloaded instead of re-deriving, mirroring
        server.py:158-167.
        """
        pre_root = self.cfg.runtime.pretrained_root
        cache = os.path.join(pre_root, "preCos_init_AN.pth") if pre_root else ""
        if cache and os.path.exists(cache):
            init_matrix = np.asarray(torch_interop.load_pth(cache).numpy(),
                                     dtype=np.float32)
            logger.info("preload clients FC init %s", init_matrix.shape)
            start = 0
            for c in self.clients:
                c.fc_local = init_matrix[start:start + c.num_classes]
                start += c.num_classes
            return
        for c in self.clients:
            c.init_fc_from_means(self.federated_vars)
            logger.info("client %d FC initialized", c.cid)

    # ------------------------------------------------------------ rounds

    def generate_public_features(self):
        """Per-round embed of the whole public set for HN mining
        (server.py:242-263).  Features stay resident on device — every
        client's mining kernel reads them without re-upload."""
        with self.timer.span("phase/public_embed"):
            feats, _ = embed_dataset(self._embed_fn, self.federated_vars,
                                     self.data.public_dataset,
                                     self.cfg.data.public_batch_size,
                                     l2norm=True, return_device=True)
            # completion barrier via a one-row device_get:
            # block_until_ready can return before the queued dispatches
            # finish on some PJRT transports (measured: a 420k-image embed
            # "completing" above the chip's roofline, the tail bleeding
            # into the next phase's span), while a fetch of row 0 of the
            # final array orders after every producing dispatch
            np.asarray(jax.device_get(feats[:1]))
        return feats

    def _ensure_residency(self) -> None:
        """Under ``runtime.device_cache`` move the global model to device
        once per round (a fresh or resumed server holds a host tree); a
        no-op when it is already device-resident."""
        if self.cfg.runtime.device_cache:
            self.federated_vars = jax.tree_util.tree_map(jnp.asarray,
                                                         self.federated_vars)

    def host_federated_vars(self):
        """The global model as host numpy (chunked fetch when device-resident);
        checkpoint/interop paths use this instead of touching
        ``federated_vars`` directly."""
        from ..utils.transfer import chunked_device_get

        return chunked_device_get(self.federated_vars)

    def sample_clients(self) -> List[int]:
        n = self.cfg.data.num_clients
        k = int(round(self.cfg.fed.client_sampled_ratio * n))
        return sorted(self.rng.choice(n, size=k, replace=False).tolist())

    def _group_keys(self, members, client_shard):
        """Per-client base keys, stacked on the client axis — same streams
        as the sequential loop (the shared step counter folds in inside the
        jitted step)."""
        return jax.device_put(np.stack([np.asarray(_run_key(
            self.cfg.runtime.seed, self.global_round, cid))
            for cid in members]), client_shard)

    @staticmethod
    def _stack_for_group(parts, pad, shard):
        """Stack per-client pytrees (padding slots repeat slot 0 — their
        results are discarded after the run) and shard on the client axis."""
        from ..parallel.fedavg import stack_trees

        stacked = stack_trees(list(parts) + [parts[0]] * pad)
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, shard),
                                      stacked)

    @contextlib.contextmanager
    def _group_feed(self, group, loaders, pad, batch_shard, batch_size,
                    with_positions: bool = False):
        """Background-producer batch feed for one client-parallel group.

        Shared plumbing of both parallel rounds: wrap-around per-client
        iterators in lockstep, pad-slot batches (discarded later), an
        empty-loader guard (one empty loader would make its cycling
        generator never yield and hang the whole group's producer), and
        guaranteed feed+loader shutdown on any exit path.
        ``with_positions`` appends stacked (K, B) dataset positions to each
        batch (the cached-contrastive step's gather indices)."""
        if min(len(l) for l in loaders) == 0:
            empty = [cid for cid, l in zip(group, loaders) if len(l) == 0]
            raise ValueError(f"clients {empty}: dataset smaller than the "
                             f"batch size {batch_size}")
        steps_per_epoch = max(len(l) for l in loaders)

        def cycling(loader):
            while True:
                yield from loader.epoch(with_positions=with_positions)

        iters = [cycling(l) for l in loaders]
        n_dispatches = self.local_epoch * steps_per_epoch

        def device_batches():
            from ..parallel.client_parallel import stack_client_batches

            for _ in range(n_dispatches):
                batches = [next(it) for it in iters]
                batches += [batches[0]] * pad
                yield tuple(jax.device_put(comp, batch_shard)
                            for comp in stack_client_batches(batches))

        from ..data.pipeline import prefetched

        feed = prefetched(device_batches(),
                          depth=max(1, self.cfg.data.prefetch))
        try:
            yield feed, steps_per_epoch
        finally:
            feed.close()  # joins the producer even on error
            for l in loaders:
                l.close()

    def _check_uniform_classes(self) -> None:
        """The shared branch step bakes ``num_local`` from client 0 (the
        reweight split of local vs global logit columns depends on it); a
        client with a different local class count would silently split at
        the wrong boundary.  The reference assumes uniform 100-ID clients
        (split_FL.py); fail loudly on ragged shards."""
        counts = {c.num_classes for c in self.clients}
        if len(counts) > 1:
            raise ValueError(
                f"clients have ragged local class counts {sorted(counts)}; "
                f"the joint branch objective requires uniform shards "
                f"(reference split_FL.py relabels every client 0..99)")

    def _lockstep_group_size(self, mesh) -> int:
        """Clients per vmapped group: client-axis size x ``fed.lockstep``,
        clamped so one group never exceeds the per-round sampled client
        count — an oversized ``--lockstep`` would otherwise burn the excess
        slots every round on padded duplicate-client compute whose results
        are discarded.  ``sample_clients`` draws a fixed count per run, so
        the clamp (and the jitted step's stacked shapes) is round-stable."""
        axis = mesh.shape["client"]
        lockstep = max(1, self.cfg.fed.lockstep)
        n = max(1, len(self.current_client_list))
        max_useful = -(-n // axis)  # ceil: smallest lockstep covering n
        if lockstep > max_useful:
            # warn once per run, not once per round (long runs call this
            # every round from each parallel path)
            log = (logger.debug if getattr(self, "_lockstep_warned", False)
                   else logger.warning)
            self._lockstep_warned = True
            log("lockstep %d oversized for %d sampled clients on a %d-wide "
                "client axis (padded duplicate compute); clamping to %d",
                lockstep, n, axis, max_useful)
            lockstep = max_useful
        return axis * lockstep

    def train_round(self) -> Dict[str, float]:
        cfg = self.cfg
        if not self.current_client_list:
            self.current_client_list = self.sample_clients()
        self._ensure_residency()

        public_feats = None
        if cfg.fed.add_pretrained_data and cfg.fed.hn_strategy != "fc":
            # FC-row mining never consumes image features; skip the 420k-img
            # per-round public embed in that mode
            public_feats = self.generate_public_features()

        # adaptive local-epoch schedule (server.py:278-280)
        if cfg.fed.adaptive_local_epoch and self.global_round != 0:
            self.local_epoch = max(4, self.local_epoch - 2)
            self.train_decay = max(1, int(3 / 4 * self.local_epoch))

        if cfg.fed.add_pretrained_data:
            self._check_uniform_classes()
        if self._branch_step is None and cfg.fed.add_pretrained_data:
            self._branch_step = make_branch_train_step(
                self.backbone, self.bce_module, margin=cfg.loss.loss,
                s=cfg.loss.margin_s, m=cfg.loss.margin_m,
                bce_weight=cfg.loss.bce_weight, bce_r=cfg.loss.bce_r,
                bce_lambda=cfg.loss.bce_lambda, mu=cfg.loss.mu,
                temperature=cfg.loss.temperature, momentum=cfg.optim.momentum,
                weight_decay=cfg.optim.weight_decay, bce_detach=cfg.fed.bce_detach,
                contrastive=cfg.fed.contrastive, reweight=cfg.fed.reweight_cosface,
                num_local=self.clients[0].num_classes,
                num_clients=cfg.data.num_clients,
                fedprox_mu=cfg.fed.fedprox_mu,
                cached_contrastive=use_cached_contrastive(cfg))

        models, fcs, sizes, losses = [], [], [], []
        for pos, cid in enumerate(self.current_client_list):
            client = self.clients[cid]
            logger.info("round %d [%d/%d] client %d training", self.global_round,
                        pos + 1, len(self.current_client_list), cid)
            if (self.local_eval_callback is not None and self.global_round == 0
                    and cid in self.local_candidates):
                # pretrain baseline entry, epoch -1 (client.py:331-333)
                self.local_eval_callback(self, client, epoch=-1,
                                         variables=self.federated_vars)
            if cfg.fed.add_pretrained_data:
                stats = client.train_with_public_data(
                    self.federated_vars, self.data.public_dataset,
                    self.pretrained_fc, public_feats, self.pretrained_labels,
                    self.local_epoch, self.train_decay,
                    step_fn=self._branch_step, round_seed=self.global_round)
            else:
                lr = self.cfg.optim.lr
                if self._plain_step is None:
                    # NO reweighting here: the reference applies
                    # reweight_cosface only in the public-data branch
                    # (client.py:269-285); plain-mode logits have exactly
                    # num_local columns and reweighting would index past them
                    self._plain_step = make_plain_train_step(
                        self.backbone, margin=cfg.loss.loss,
                        s=cfg.loss.margin_s, m=cfg.loss.margin_m,
                        momentum=cfg.optim.momentum,
                        weight_decay=cfg.optim.weight_decay)
                stats = client.train(self.federated_vars, self.local_epoch, lr,
                                     step_fn=self._plain_step,
                                     round_seed=self.global_round)
            losses.append(stats["loss"])
            sizes.append(stats["dataset_size"])
            models.append(client.trained_backbone)
            if cfg.fed.return_all and client.global_fc is not None:
                fcs.append(client.global_fc)
            if self.local_eval_callback is not None and cid in self.local_candidates:
                self.local_eval_callback(self, client)

        weights = jnp.asarray(sizes, jnp.float32)
        logger.info("round %d avg client loss %.5f", self.global_round,
                    float(np.mean(losses)))

        with self.timer.span("phase/aggregate"):
            # FedAvg over every leaf, BN stats included (server.py:322-338);
            # streamed one client at a time so peak HBM stays at one state +
            # accumulator even for 40 x iresnet200.  Under device_cache the
            # client states are already device-resident and the result stays
            # on device.
            aggregated = streaming_weighted_average(models, weights)
            if cfg.runtime.device_cache:
                self.federated_vars = aggregated
            else:
                from ..utils.transfer import chunked_device_get

                self.federated_vars = chunked_device_get(aggregated)

            if cfg.fed.return_all and fcs:
                from ..utils.transfer import chunked_device_get

                # (6000, E) f32 ~ 12 MB: bounded-slice fetch, not one buffer
                self.pretrained_fc = chunked_device_get(fedavg_on_fc(
                    jnp.asarray(self.pretrained_fc),
                    jnp.stack([jnp.asarray(f) for f in fcs]),
                    weights, p=1.0))

            if cfg.fed.spreadout:
                self.spread_out()

        return {"avg_loss": float(np.mean(losses))}

    def train_round_parallel(self, mesh) -> Dict[str, float]:
        """Train K clients per step concurrently over the mesh ``client`` axis.

        Replaces the reference's sequential client loop (server.py:283-316)
        with lockstep vmapped training: the sampled clients are chunked into
        groups of K = mesh client-axis size; within a group every client
        advances one step per dispatch, each on its own mesh slice.  Clients
        whose (hard-negative-dependent) epoch is shorter than the group's
        longest simply wrap around their shuffled loader — a documented
        deviation from strict per-client epoch boundaries.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.client_parallel import make_parallel_branch_step
        from ..parallel.fedavg import unstack_tree
        from ..utils.transfer import chunked_device_get

        cfg = self.cfg
        if not cfg.fed.add_pretrained_data:
            return self._train_round_parallel_plain(mesh)
        if not self.current_client_list:
            self.current_client_list = self.sample_clients()
        self._ensure_residency()
        public_feats = None
        if cfg.fed.add_pretrained_data and cfg.fed.hn_strategy != "fc":
            # FC-row mining never consumes image features; skip the 420k-img
            # per-round public embed in that mode
            public_feats = self.generate_public_features()
        if cfg.fed.adaptive_local_epoch and self.global_round != 0:
            self.local_epoch = max(4, self.local_epoch - 2)
            self.train_decay = max(1, int(3 / 4 * self.local_epoch))

        # lockstep > 1 stacks several clients per client-axis slice: the
        # vmapped step batches their convs into one XLA program (the leading
        # K axis shards evenly because K = lockstep * axis size)
        K = self._lockstep_group_size(mesh)
        self._check_uniform_classes()
        use_cache = use_cached_contrastive(cfg)
        if self._parallel_step is None:  # one executable for all rounds
            self._parallel_step = make_parallel_branch_step(
                self.backbone, self.bce_module, margin=cfg.loss.loss,
                s=cfg.loss.margin_s, m=cfg.loss.margin_m,
                bce_weight=cfg.loss.bce_weight, bce_r=cfg.loss.bce_r,
                bce_lambda=cfg.loss.bce_lambda, mu=cfg.loss.mu,
                temperature=cfg.loss.temperature, momentum=cfg.optim.momentum,
                weight_decay=cfg.optim.weight_decay,
                bce_detach=cfg.fed.bce_detach,
                contrastive=cfg.fed.contrastive,
                reweight=cfg.fed.reweight_cosface,
                num_local=self.clients[0].num_classes,
                num_clients=cfg.data.num_clients,
                fedprox_mu=cfg.fed.fedprox_mu,
                cached_contrastive=use_cache)
        step_fn = self._parallel_step

        from ..utils.optim import step_lr

        client_shard = NamedSharding(mesh, P("client"))
        # batches additionally split over the data axis inside each client's
        # slice (replaces per-client nn.DataParallel)
        batch_shard = NamedSharding(mesh, P("client", "data"))
        repl = NamedSharding(mesh, P())
        models, fcs, sizes, losses = [], [], [], []
        todo = list(self.current_client_list)
        if self.local_eval_callback is not None and self.global_round == 0:
            for cid in todo:
                if cid in self.local_candidates:
                    self.local_eval_callback(self, self.clients[cid], epoch=-1,
                                             variables=self.federated_vars)
        for g0 in range(0, len(todo), K):
            group = todo[g0:g0 + K]
            pad = K - len(group)
            members = group + [group[0]] * pad  # padded slots discarded below
            # prepare only the REAL clients (a padded slot reusing client 0's
            # prep would otherwise re-run its full mining pass and consume
            # its loader's rng stream)
            preps = []
            for cid in group:
                preps.append(self.clients[cid].prepare_local_run(
                    self.federated_vars, self.data.public_dataset,
                    self.pretrained_fc, public_feats, self.pretrained_labels,
                    round_seed=self.global_round))
            loaders = [p[1] for p in preps]
            stacked = self._stack_for_group([p[2] for p in preps], pad,
                                            client_shard)
            last_stacked = global_repl = None
            if use_cache:
                # frozen MOON features precomputed per client (ONE data pass
                # per client covers both models) and stacked over the group
                # (bucket-padded by embed_flip_caches, further zero-padded to
                # the group max — gathers never reach pad rows); replaces the
                # per-step frozen forwards
                from .embed import embed_flip_caches

                with self.timer.span("phase/contrastive_cache"):
                    g_list, l_list = [], []
                    for p in preps:
                        g, l = embed_flip_caches(
                            self._embed_fn, [self.federated_vars, p[3]],
                            p[0], cfg.data.eval_batch_size)
                        g_list.append(g)
                        l_list.append(l)
                    nmax = max(c.shape[0] for c in g_list + l_list)

                    def _stackpad(caches):
                        # assemble the (K, nmax, 2, E) group cache SHARD BY
                        # SHARD: each client's padded cache is placed
                        # directly on its mesh slice's devices, so the full
                        # group cache is never materialized on one device
                        # (tens of GB when mining keeps most of the public
                        # set) and the per-host transient is one client's
                        # cache.  The embed fn may also have produced the
                        # caches on a different (full data-mesh) device set.
                        shape = (len(caches), nmax) + caches[0].shape[1:]
                        padded: dict = {}

                        def pad_i(i):
                            if i not in padded:
                                c = caches[i]
                                if c.shape[0] < nmax:
                                    c = jnp.pad(c, ((0, nmax - c.shape[0]),
                                                    (0, 0), (0, 0)))
                                padded[i] = c[None]
                            return padded[i]

                        # a device's shard covers fed.lockstep clients (one
                        # when lockstep == 1): concatenate exactly the rows
                        # its index slice asks for
                        arrays = []
                        for dev, index in client_shard.devices_indices_map(
                                shape).items():
                            lo = index[0].start or 0
                            hi = index[0].stop or shape[0]
                            part = (pad_i(lo) if hi - lo == 1 else
                                    jnp.concatenate(
                                        [pad_i(i) for i in range(lo, hi)]))
                            arrays.append(jax.device_put(part, dev))
                        return jax.make_array_from_single_device_arrays(
                            shape, client_shard, arrays)

                    g_stacked = _stackpad(g_list + [g_list[0]] * pad)
                    l_stacked = _stackpad(l_list + [l_list[0]] * pad)
                    del g_list, l_list
            else:
                last_stacked = self._stack_for_group([p[3] for p in preps],
                                                     pad, client_shard)
                global_repl = jax.tree_util.tree_map(
                    lambda x: jax.device_put(jnp.asarray(x), repl),
                    self.federated_vars)
            keys = self._group_keys(members, client_shard)

            from ..federated.client import _metrics_sum

            acc = jnp.zeros((4, K))
            step_no = 0
            with self._group_feed(group, loaders, pad, batch_shard,
                                  cfg.data.combined_batch_size,
                                  with_positions=use_cache) as (
                    feed, steps_per_epoch):
                with self.timer.span("phase/local_train"):
                    for epoch in range(self.local_epoch):
                        lr = step_lr(cfg.optim.lr, epoch, self.train_decay,
                                     cfg.optim.lr_gamma)
                        for s in range(steps_per_epoch):
                            if use_cache:
                                imgs_d, labels_d, valid_d, idx_d = next(feed)
                                stacked, metrics = step_fn(
                                    stacked, g_stacked, l_stacked,
                                    imgs_d, labels_d, valid_d, idx_d,
                                    jnp.float32(lr), keys, step_no)
                            else:
                                imgs_d, labels_d, valid_d = next(feed)
                                stacked, metrics = step_fn(
                                    stacked, global_repl, last_stacked,
                                    imgs_d, labels_d, valid_d,
                                    jnp.float32(lr), keys, step_no)
                            # on-device running sum -> the reported loss is
                            # the all-step mean (reference AverageMeter
                            # semantics), identical on the sequential path
                            acc = _metrics_sum(acc, metrics)
                            step_no += 1
                        logger.info("parallel group %s epoch %d/%d done",
                                    group, epoch + 1, self.local_epoch)

            avg_loss = np.asarray(jax.device_get(acc))[0] / max(step_no, 1)
            # unstack ON DEVICE: finalize_local_run fetches only the leaves
            # it keeps (fc/bce, + backbone unless --device_cache) — the
            # optimizer momentum it discards never crosses the host link,
            # and under device_cache backbones stay device-resident exactly
            # like the sequential path
            states = unstack_tree(stacked, len(group))
            for slot, cid in enumerate(group):
                client = self.clients[cid]
                client.finalize_local_run(states[slot], float(avg_loss[slot]))
                losses.append(client.last_loss)
                sizes.append(client.dataset_size)
                models.append(client.trained_backbone)
                if cfg.fed.return_all and client.global_fc is not None:
                    fcs.append(client.global_fc)
                if (self.local_eval_callback is not None
                        and cid in self.local_candidates):
                    self.local_eval_callback(self, client)

        weights = jnp.asarray(sizes, jnp.float32)
        logger.info("round %d (parallel) avg client loss %.5f",
                    self.global_round, float(np.mean(losses)))
        with self.timer.span("phase/aggregate"):
            aggregated = streaming_weighted_average(models, weights)
            self.federated_vars = (aggregated if cfg.runtime.device_cache
                                   else chunked_device_get(aggregated))
            if cfg.fed.return_all and fcs:
                self.pretrained_fc = chunked_device_get(fedavg_on_fc(
                    jnp.asarray(self.pretrained_fc),
                    jnp.stack([jnp.asarray(f) for f in fcs]), weights, p=1.0))
            if cfg.fed.spreadout:
                self.spread_out()
        return {"avg_loss": float(np.mean(losses))}

    def _train_round_parallel_plain(self, mesh) -> Dict[str, float]:
        """Plain-objective (CosFace-only, Client.train client.py:511-571)
        client-parallel round: K clients advance in vmapped lockstep, same
        wrap-around epoch semantics as the branch-objective parallel round.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.client_parallel import make_parallel_plain_step
        from ..parallel.fedavg import unstack_tree
        from ..utils.transfer import chunked_device_get

        cfg = self.cfg
        if not self.current_client_list:
            self.current_client_list = self.sample_clients()
        self._ensure_residency()
        # same adaptive local-epoch schedule as every other round path
        # (reference server.py:278-280)
        if cfg.fed.adaptive_local_epoch and self.global_round != 0:
            self.local_epoch = max(4, self.local_epoch - 2)
            self.train_decay = max(1, int(3 / 4 * self.local_epoch))
        K = self._lockstep_group_size(mesh)
        if len({self.clients[cid].num_classes
                for cid in self.current_client_list}) > 1:
            raise ValueError("plain client-parallel requires uniform local "
                             "class counts (ragged FC rows cannot stack); "
                             "run sequentially")
        if self._parallel_plain_step is None:
            self._parallel_plain_step = make_parallel_plain_step(
                self.backbone, margin=cfg.loss.loss, s=cfg.loss.margin_s,
                m=cfg.loss.margin_m, momentum=cfg.optim.momentum,
                weight_decay=cfg.optim.weight_decay)
        step_fn = self._parallel_plain_step

        client_shard = NamedSharding(mesh, P("client"))
        batch_shard = NamedSharding(mesh, P("client", "data"))
        models, sizes, losses = [], [], []
        todo = list(self.current_client_list)
        if self.local_eval_callback is not None and self.global_round == 0:
            # pretrain baseline entry, epoch -1 (client.py:331-333) — same
            # artifact as the sequential and branch-parallel paths
            for cid in todo:
                if cid in self.local_candidates:
                    self.local_eval_callback(self, self.clients[cid], epoch=-1,
                                             variables=self.federated_vars)
        lr = jnp.float32(cfg.optim.lr)  # constant over the run, as the
        # sequential path and the reference (client.py:528-530, no scheduler)
        for g0 in range(0, len(todo), K):
            group = todo[g0:g0 + K]
            pad = K - len(group)
            members = group + [group[0]] * pad
            preps = [self.clients[cid].prepare_plain_run(
                self.federated_vars, round_seed=self.global_round)
                for cid in group]
            loaders = [p[0] for p in preps]
            stacked = self._stack_for_group([p[1] for p in preps], pad,
                                            client_shard)
            keys = self._group_keys(members, client_shard)

            acc = jnp.zeros(K)
            step_no = 0
            with self._group_feed(group, loaders, pad, batch_shard,
                                  cfg.data.batch_size) as (
                    feed, steps_per_epoch):
                with self.timer.span("phase/local_train"):
                    for epoch in range(self.local_epoch):
                        for s in range(steps_per_epoch):
                            imgs_d, labels_d, valid_d = next(feed)
                            stacked, loss = step_fn(stacked, imgs_d, labels_d,
                                                    valid_d, lr, keys, step_no)
                            acc = acc + loss
                            step_no += 1

            avg_loss = np.asarray(jax.device_get(acc)) / max(step_no, 1)
            # device-side unstack, as in the branch-parallel round above
            states = unstack_tree(stacked, len(group))
            for slot, cid in enumerate(group):
                client = self.clients[cid]
                client.finalize_plain_run(states[slot], float(avg_loss[slot]))
                losses.append(client.last_loss)
                sizes.append(client.dataset_size)
                models.append(client.trained_backbone)
                if (self.local_eval_callback is not None
                        and cid in self.local_candidates):
                    self.local_eval_callback(self, client)

        weights = jnp.asarray(sizes, jnp.float32)
        logger.info("round %d (parallel plain) avg client loss %.5f",
                    self.global_round, float(np.mean(losses)))
        with self.timer.span("phase/aggregate"):
            aggregated = streaming_weighted_average(models, weights)
            self.federated_vars = (aggregated if cfg.runtime.device_cache
                                   else chunked_device_get(aggregated))
            if cfg.fed.spreadout:
                self.spread_out()
        return {"avg_loss": float(np.mean(losses))}

    def spread_out(self) -> None:
        """SpreadOut over the sampled clients' local FCs (server.py:340-371)."""
        from ..utils.transfer import chunked_device_get

        cfg = self.cfg
        fcs = [self.clients[cid].fc_local for cid in self.current_client_list]
        fc_all = jnp.asarray(np.concatenate(fcs, axis=0))
        # bounded-slice fetch: 40 x 100 x 512 f32 = 8.2 MB, over the
        # single-buffer collapse threshold of some transports
        out = chunked_device_get(spreadout(
            fc_all, margin=cfg.fed.spreadout_margin, iters=cfg.fed.spreadout_iters,
            lr=cfg.optim.lr * 10, momentum=cfg.optim.momentum,
            weight_decay=cfg.optim.weight_decay, mode=cfg.fed.spreadout_mode))
        start = 0
        for cid in self.current_client_list:
            n = self.clients[cid].num_classes
            self.clients[cid].fc_local = out[start:start + n]
            start += n

    def advance_round(self) -> None:
        """Counter bookkeeping after a round (reference train.py:87-88).

        Clears the round's client sample so the next round draws a fresh
        one — without this a driver looping plain ``train_round()`` with
        client_sampled_ratio < 1 would silently train the round-0 subset
        forever (train.py resamples explicitly; library callers may not).
        """
        self.global_epoch += self.local_epoch
        self.global_round += 1
        self.current_client_list = []

    def test(self) -> Optional[Dict[str, float]]:
        if self.eval_callback is not None:
            return self.eval_callback(self)
        return None

    # --------------------------------------------------------- checkpoints

    def save_round_checkpoint(self, output_dir: str) -> str:
        """torch-compatible per-round global backbone (server.py:148)."""
        os.makedirs(output_dir, exist_ok=True)
        path = os.path.join(output_dir, f"backbone_{self.global_round}.pth")
        host_vars = self.host_federated_vars()
        try:
            sd = torch_interop.backbone_to_torch(self.cfg.model.network,
                                                 host_vars)
        except NotImplementedError:
            from ..utils.checkpoint import save_native

            path = os.path.join(output_dir,
                                f"backbone_{self.global_round}.npz")
            save_native(host_vars, path)
            return path
        torch_interop.save_pth(sd, path)
        return path

    def save_client_checkpoints(self, output_dir: str) -> None:
        """Per-client backbone + bce_module artifacts (client.py:484-495)."""
        from ..utils.checkpoint import save_native
        from ..utils.transfer import chunked_device_get

        for c in self.clients:
            if c.trained_backbone is None:
                continue
            cdir = os.path.join(output_dir, "clients", f"client_{c.cid}")
            os.makedirs(cdir, exist_ok=True)
            trained = chunked_device_get(c.trained_backbone)
            try:
                sd = torch_interop.backbone_to_torch(self.cfg.model.network,
                                                     trained)
                torch_interop.save_pth(sd, os.path.join(cdir, "backbone.pth"))
            except NotImplementedError:
                save_native(trained, os.path.join(cdir, "backbone.npz"))
            if c.bce_vars is not None:
                try:
                    bsd = torch_interop.bce_to_torch(c.bce_vars,
                                                     self.cfg.model.converter_layers)
                    torch_interop.save_pth(bsd, os.path.join(cdir, "bce_module.pth"))
                except NotImplementedError:
                    save_native(c.bce_vars, os.path.join(cdir, "bce_module.npz"))
