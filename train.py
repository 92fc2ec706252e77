"""FedFR federated training CLI (reference-compatible flags).

Mirrors the reference train.py argparse surface (train.py:94-126) while
driving the TPU-native engine.  run.sh-equivalent:

    python train.py --pretrained_root ./pretrain --network sphnet \
        --output_dir ./ckpt/FedFR --loss CosFace --batch_size 64 \
        --num_client 40 --client_sampled_ratio 1.0 --lr 0.001 \
        --total_round 20 --local_epoch 10 --add_pretrained_data \
        --combine_dataset --contrastive_bb --return_all --BCE_local \
        --adaptive_local_epoch
"""

import argparse
import os


def build_config(args) -> "FedFRConfig":
    from fedfr_tpu.config import FedFRConfig

    cfg = FedFRConfig()
    cfg.data.rec_root = args.rec_root
    cfg.data.val_root = args.val_root
    cfg.data.local_veri_dir = args.local_rec
    cfg.data.num_clients = args.num_client
    cfg.data.num_ids = args.num_ids
    cfg.data.batch_size = args.batch_size
    cfg.data.combined_batch_size = args.com_batch_size
    cfg.data.public_batch_size = args.public_batch_size
    cfg.data.eval_batch_size = args.eval_batch_size
    cfg.data.num_workers = args.num_workers
    cfg.model.network = args.network
    cfg.loss.loss = args.loss
    cfg.optim.lr = args.lr
    cfg.fed.total_rounds = args.total_round
    cfg.fed.local_epochs = args.local_epoch
    cfg.fed.client_sampled_ratio = args.client_sampled_ratio
    cfg.fed.spreadout = args.spreadout
    cfg.fed.init_fc = args.init_fc
    cfg.fed.add_pretrained_data = args.add_pretrained_data
    cfg.fed.combine_dataset = args.combine_dataset
    cfg.fed.contrastive = args.contrastive_bb
    cfg.fed.return_all = args.return_all
    cfg.fed.bce_local = args.BCE_local
    cfg.fed.bce_detach = args.BCE_detach
    cfg.fed.adaptive_local_epoch = args.adaptive_local_epoch
    cfg.fed.reweight_cosface = args.reweight_cosface
    cfg.fed.hn_strategy = args.hn_strategy
    cfg.fed.hn_threshold = args.HN_threshold
    cfg.fed.hn_cap = getattr(args, "HN_cap", 0)
    cfg.fed.aggr_alg = args.aggr_alg
    cfg.runtime.output_dir = args.output_dir
    cfg.runtime.pretrained_root = args.pretrained_root
    cfg.runtime.seed = args.seed
    cfg.model.embedding_size = args.embedding_size
    cfg.model.scan_blocks = args.scan_blocks
    cfg.data.image_size = args.image_size
    # getattr: harness code (tests, experiment drivers) may pass trimmed
    # Namespaces predating these flags
    cfg.model.freeze_bn = getattr(args, "freeze_bn", False)
    cfg.model.dropout = getattr(args, "dropout", 0.0)
    cfg.model.remat_blocks = getattr(args, "remat", False)
    cfg.model.converter_layers = getattr(args, "converter_layer", 1)
    cfg.runtime.device_cache = getattr(args, "device_cache", False)
    cfg.runtime.client_ckpt_every = getattr(args, "client_ckpt_every", 1)
    cfg.runtime.round_ckpt_every = getattr(args, "round_ckpt_every", 1)
    cfg.runtime.round_ckpt_keep = getattr(args, "round_ckpt_keep", 0)
    cfg.runtime.round_ckpt_async = getattr(args, "round_ckpt_async", False)
    cfg.runtime.round_ckpt_bg_fetch = getattr(args, "round_ckpt_bg_fetch",
                                              False)
    cfg.fed.cache_contrastive = getattr(args, "cache_contrastive", False)
    cfg.fed.lockstep = max(1, getattr(args, "lockstep", 1) or 1)
    if args.val_targets:
        cfg.runtime.val_targets = args.val_targets.split(",")
    return cfg


def main(args):
    from fedfr_tpu.utils.runtime import apply_platform_override

    apply_platform_override()
    from fedfr_tpu.data.datasets import AllClientData
    from fedfr_tpu.evalsuite.verification import BinVerificationCallback
    from fedfr_tpu.federated import Server
    from fedfr_tpu.utils import torch_interop
    from fedfr_tpu.utils.checkpoint import save_native
    from fedfr_tpu.utils.logging import init_logging

    cfg = build_config(args)
    os.makedirs(cfg.runtime.output_dir, exist_ok=True)
    logger = init_logging(cfg.runtime.output_dir)
    logger.info("config: %s", cfg.to_json())

    # source snapshot for experiment provenance (reference train.py:50-51)
    from fedfr_tpu.utils.snapshot import snapshot_source

    snapshot_source(cfg.runtime.output_dir)

    data = AllClientData(cfg, include_public=cfg.fed.add_pretrained_data)

    # server first: its backbone/bce modules are shared by every eval callback
    # so the jitted embedding forward compiles once per batch shape
    server = Server(cfg, data)

    bin_cb = None
    if cfg.data.val_root:
        bin_cb = BinVerificationCallback(
            server._embed_fn, cfg.runtime.val_targets, cfg.data.val_root,
            batch_size=cfg.data.eval_batch_size, logger=logger,
            image_size=(cfg.data.image_size, cfg.data.image_size))

    local_cb = None
    if cfg.data.local_veri_dir and (data.synthetic_universe is not None
                                    or os.path.exists(cfg.data.local_veri_dir)):
        from fedfr_tpu.evalsuite.local_eval import LocalVerificationCallback

        local_veri = data.veri_dataset(cfg.data.local_veri_dir)
        local_cb = LocalVerificationCallback(
            server.backbone, server.bce_module, local_veri,
            cfg.runtime.output_dir, batch_size=cfg.data.eval_batch_size,
            plain_embed_fn=server._embed_fn)

    def eval_callback(server):
        if bin_cb is None:
            return None
        accs = bin_cb(server.global_round, server.federated_vars)
        if bin_cb.is_best(server.global_round):
            host_vars = server.host_federated_vars()
            try:
                sd = torch_interop.backbone_to_torch(cfg.model.network,
                                                     host_vars)
                torch_interop.save_pth(sd, os.path.join(cfg.runtime.output_dir,
                                                        "backbone.pth"))
            except NotImplementedError:
                pass
            save_native(host_vars,
                        os.path.join(cfg.runtime.output_dir, "backbone.best.npz"))
            logger.info("Save server model, round %d", server.global_round)
        return {"acc": accs}

    def local_eval_callback(server, client, epoch=None, variables=None):
        if local_cb is None:
            return
        if variables is None:
            variables = client.trained_backbone
        if variables is None:
            return
        if epoch is None:
            # last local-epoch index, matching the reference's log numbering
            # (client.py:483 passes the loop-final epoch)
            epoch = server.global_epoch + server.local_epoch - 1
        bce_params = (client.bce_vars["params"] if client.bce_vars is not None
                      and epoch != -1 else None)
        with server.timer.span("phase/local_eval"):
            local_cb.veri_test(variables, epoch, client.target_ids, client.cid,
                               bce_params)

    server.eval_callback = eval_callback
    server.local_eval_callback = local_eval_callback

    from fedfr_tpu.utils.checkpoint import RoundCheckpointer

    ckpt = RoundCheckpointer(os.path.join(cfg.runtime.output_dir, "rounds"),
                             keep=cfg.runtime.round_ckpt_keep,
                             async_write=cfg.runtime.round_ckpt_async,
                             bg_fetch=cfg.runtime.round_ckpt_bg_fetch)
    if args.resume:
        restored = ckpt.restore(server)
        logger.info("resumed at round %d", restored)
        # restore the best-accuracy table so the first post-resume round
        # cannot masquerade as "best" and clobber the saved best model
        best = ckpt.last_extra.get("best")
        if bin_cb is not None and best and len(best) == len(bin_cb.highest):
            bin_cb.highest = [tuple(b) for b in best]

    # multi-chip: train clients concurrently over the mesh client axis
    import jax

    mesh = None
    if cfg.fed.client_parallel and (len(jax.devices()) > 1
                                    or cfg.fed.lockstep > 1):
        from fedfr_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        logger.info("client-parallel training over %d devices x lockstep %d "
                    "(%s objective)", mesh.shape["client"], cfg.fed.lockstep,
                    "branch" if cfg.fed.add_pretrained_data else "plain")

    from fedfr_tpu.utils.profiling import SpanTimer, xla_trace

    trace_dir = None
    if args.profile:
        trace_dir = os.path.join(cfg.runtime.output_dir, "xla_trace")
        logger.info("profiling first round to %s", trace_dir)
    timer = SpanTimer()
    mem_peak = 0  # process-local device high-water (telemetry loop below)
    logger.info("=== Start Federated learning ===")
    try:
        while server.global_round < cfg.fed.total_rounds:
            server.current_client_list = server.sample_clients()
            logger.info("====== Round %d ======", server.global_round)
            with xla_trace(trace_dir if server.global_round == 0 else None):
                with timer.span("train_round"):
                    if mesh is not None:
                        server.train_round_parallel(mesh)
                    else:
                        server.train_round()
            with timer.span("eval"), server.timer.span("phase/bin_eval"):
                server.test()
            rce = cfg.runtime.round_ckpt_every
            # the FINAL round always exports, whatever the cadence: the
            # post-training ritual (README.md:20-56, ijbc on the final
            # checkpoint) must not silently evaluate round N-(N%rce)
            is_final = server.global_round == cfg.fed.total_rounds - 1
            # the cheap (~10 s) backbone export runs on the final round even
            # with --round_ckpt_every 0 (the ritual's input); the EXPENSIVE
            # resume-state fetch below stays strictly cadence-gated — a
            # completed run has no use for resume state
            if (rce and server.global_round % rce == 0) or is_final:
                # falls back to .npz internally when the network has no
                # torch-export geometry (Server.save_round_checkpoint)
                with server.timer.span("phase/torch_export"):
                    server.save_round_checkpoint(cfg.runtime.output_dir)
            cce = cfg.runtime.client_ckpt_every
            if cce and server.global_round % cce == 0:
                server.save_client_checkpoints(cfg.runtime.output_dir)
            server.advance_round()
            if rce and ((server.global_round - 1) % rce == 0 or is_final):
                # with --round_ckpt_async this span is the device fetch only;
                # the npz/zlib write overlaps the next round.  With
                # --round_ckpt_bg_fetch the fetch overlaps too and this span
                # is just the reference snapshot (~ms)
                with server.timer.span("phase/round_ckpt"):
                    ckpt.save(server, extra={
                        "best": [list(h) for h in bin_cb.highest]
                        if bin_cb else []})
            server.timer.report(logger)  # cumulative per-phase breakdown
            try:  # device + host memory telemetry (backend-dependent)
                ms = jax.local_devices()[0].memory_stats() or {}
                import resource

                in_use = ms.get("bytes_in_use", 0)
                if not in_use:
                    # the axon PJRT plugin returns no memory_stats; sum the
                    # live device buffers instead (measured HBM residency of
                    # everything reachable — e.g. the 40 cached client
                    # states — though not XLA's transient scratch peak)
                    devs = set(jax.local_devices())
                    in_use = sum(
                        x.nbytes for x in jax.live_arrays()
                        if not devs.isdisjoint(x.devices()))
                mem_peak = max(mem_peak, in_use)
                alloc_peak = ms.get("peak_bytes_in_use", 0)
                logger.info(
                    "memory: device in_use %.0f MB peak %.0f MB | host "
                    "maxrss %.0f MB%s",
                    in_use / 1e6, (alloc_peak or mem_peak) / 1e6,
                    resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e3,
                    # the two peaks are NOT comparable across rigs: tag the
                    # fallback so log readers know which one they got
                    "" if alloc_peak else " (peak = max live-buffer sum)")
            except Exception:
                pass
    finally:
        # join any outstanding async resume-state write even when a round
        # raises (tunnel errors, KeyboardInterrupt): the daemon writer would
        # otherwise die mid-npz and silently drop the newest resume state
        ckpt.wait()
    timer.report(logger)
    cce = cfg.runtime.client_ckpt_every
    final_round_captured = bool(cce) and (cfg.fed.total_rounds - 1) % cce == 0
    if server.global_round >= cfg.fed.total_rounds and not final_round_captured:
        # The per-round cadence (--client_ckpt_every N; 0 disables — at-scale
        # runs avoid 40 x ~200 MB device fetches per round) did not capture
        # the FINAL round's client states, but the post-training
        # personalization evals (local_all.py --backbone multi, reference
        # README.md:20-34) need every client's backbone+converter — write
        # them once when training completes.
        n_trained = sum(c.trained_backbone is not None for c in server.clients)
        if n_trained:
            logger.info("saving final per-client checkpoints (%d clients)",
                        n_trained)
            if n_trained < len(server.clients):
                missing = [c.cid for c in server.clients
                           if c.trained_backbone is None]
                logger.warning(
                    "clients %s were not trained in this process (resume "
                    "after restart with partial sampling?) — their final "
                    "checkpoints are missing and local_all.py --backbone "
                    "multi will fail for them", missing)
            with timer.span("final_client_ckpt"):
                server.save_client_checkpoints(cfg.runtime.output_dir)
        else:
            logger.warning(
                "no trained client states in this process (resumed after "
                "completion?) — final per-client checkpoints not written")
    logger.info("training done")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="TPU-native FedFR training")
    parser.add_argument("--network", type=str, default="sphnet")
    parser.add_argument("--loss", type=str, default="CosFace")
    parser.add_argument("--output_dir", default="./ckpt/FL_FedFR")
    parser.add_argument("--batch_size", default=64, type=int)
    parser.add_argument("--com_batch_size", default=256, type=int)
    parser.add_argument("--public_batch_size", default=512, type=int)
    parser.add_argument("--eval_batch_size", default=512, type=int)
    parser.add_argument("--local_epoch", default=1, type=int)
    parser.add_argument("--total_round", default=16, type=int)
    parser.add_argument("--num_client", default=10, type=int)
    parser.add_argument("--num_ids", default=4000, type=int)
    parser.add_argument("--client_sampled_ratio", default=1.0, type=float)
    parser.add_argument("--pretrained_root", default="")
    parser.add_argument("--lr", type=float, default=0.1)
    parser.add_argument("--aggr_alg", default="FedAvg")
    parser.add_argument("--spreadout", action="store_true")
    parser.add_argument("--init_fc", action="store_true")
    parser.add_argument("--add_pretrained_data", action="store_true")
    parser.add_argument("--contrastive_bb", action="store_true")
    parser.add_argument("--cache_contrastive", action="store_true",
                        help="precompute the frozen MOON features once per "
                        "(client, round) and gather per step instead of "
                        "re-running the two frozen forwards every step "
                        "(same math; ~1.3x faster local training)")
    parser.add_argument("--lockstep", type=int, default=1,
                        help="clients resident per client-axis mesh slice: "
                        "each parallel group advances lockstep * (client-"
                        "axis size) clients per vmapped dispatch; >1 "
                        "batches several clients' convs into one XLA "
                        "program (enables client-parallel lockstep on a "
                        "single chip)")
    parser.add_argument("--return_all", action="store_true")
    parser.add_argument("--combine_dataset", action="store_true")
    parser.add_argument("--BCE_local", action="store_true")
    parser.add_argument("--BCE_detach", action="store_true")
    parser.add_argument("--adaptive_local_epoch", action="store_true")
    parser.add_argument("--reweight_cosface", action="store_true")
    parser.add_argument("--hn_strategy", default="feature",
                        choices=["feature", "fc"],
                        help="hard-negative mining: image features "
                             "(choose_hard_negative_2) or FC rows "
                             "(choose_hard_negative)")
    parser.add_argument("--HN_threshold", default=0.4, type=float,
                        help="feature-mining cosine threshold (config.py:28)")
    parser.add_argument("--HN_cap", default=0, type=int,
                        help="cap the mined set at the N hardest public images "
                             "(0 = uncapped reference semantics)")
    # paths (the reference hardcodes these in config.py; here they are flags)
    parser.add_argument("--rec_root", default="", help="dataset root")
    parser.add_argument("--val_root", default="", help=".bin verification dir")
    parser.add_argument("--local_rec", default="", help="local_veri_4000 dir")
    parser.add_argument("--val_targets", default="agedb_30")
    parser.add_argument("--num_workers", default=6, type=int)
    parser.add_argument("--seed", default=100, type=int)
    parser.add_argument("--embedding_size", default=512, type=int)
    parser.add_argument("--image_size", default=112, type=int)
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest round checkpoint")
    parser.add_argument("--profile", action="store_true",
                        help="capture an XLA trace of the first round")
    parser.add_argument("--scan_blocks", action="store_true",
                        help="nn.scan repeated backbone blocks (faster compile)")
    parser.add_argument("--remat", action="store_true",
                        help="nn.remat residual blocks: recompute activations "
                             "in backward for O(depth) lower peak memory "
                             "(lets --lockstep groups fit single-chip HBM)")
    parser.add_argument("--freeze_bn", action="store_true",
                        help="train with BatchNorm in inference mode "
                             "(reference freeze_BN, iresnet.py:140-156)")
    parser.add_argument("--dropout", type=float, default=0.0,
                        help="backbone dropout before the embedding fc "
                             "(reference iresnet.py factory kwarg)")
    parser.add_argument("--converter_layer", type=int, default=1,
                        help="BCE transformation layer: 1=linear, else "
                             "BottleBlock (reference cfg.converter_layer)")
    parser.add_argument("--device_cache", action="store_true",
                        help="keep client/global backbones device-resident "
                             "across rounds (no per-round host round-trips)")
    parser.add_argument("--client_ckpt_every", type=int, default=1,
                        help="save per-client artifacts every N rounds "
                             "(0 = never; reference saves every round)")
    parser.add_argument("--round_ckpt_every", type=int, default=1,
                        help="save backbone_%%d + resume state every N "
                             "rounds (0 = never)")
    parser.add_argument("--round_ckpt_keep", type=int, default=0,
                        help="retain only the newest N resume states "
                             "(0 = keep all; one reference-scale state "
                             "is ~7.6 GB)")
    parser.add_argument("--round_ckpt_async", action="store_true",
                        help="overlap resume-state serialization with the "
                             "next round (device state is still fetched "
                             "synchronously)")
    parser.add_argument("--round_ckpt_bg_fetch", action="store_true",
                        help="also move the device->host resume-state fetch "
                             "into the writer thread: the round loop "
                             "proceeds while immutable device buffers are "
                             "fetched in the background (implies "
                             "--round_ckpt_async)")
    # dead reference flags, accepted as no-ops so verbatim reference
    # commands run (reference train.py:109-123; --lr_step is "Not actually
    # used" per train.py:130, the others guard commented-out branches)
    parser.add_argument("--fedface", action="store_true",
                        help="no-op (reference dead flag)")
    parser.add_argument("--BCE_tune", action="store_true",
                        help="no-op (reference dead flag)")
    parser.add_argument("--save_fc_iter", type=int, default=40,
                        help="no-op (reference dead flag)")
    parser.add_argument("--lr_step", default="1000",
                        help="no-op (reference dead flag)")
    parser.add_argument("--local_rank", type=int, default=0,
                        help="no-op (reference hardcodes rank 0, train.py:42)")
    parser.add_argument("--data_ratio", type=float, default=0.5,
                        help="no-op (reference dead flag, never read)")
    main(parser.parse_args())
