"""Public-set pretraining with the class-sharded Partial FC (multi-chip).

The reference ships PartialFC (partial_fc.py) for the pretraining stage that
produced pretrain/backbone.pth + fc.pth but not the stage itself; here it is
a first-class CLI.  The margin-softmax FC is row-sharded over the mesh
``model`` axis (every device holds a batch shard AND a class shard, the
reference's NCCL rank layout) with optional negative-class sampling; the
backbone is data-parallel over the same axis.

    python pretrain.py --data_dir .../split_pretrain_6000/client_0000 \
        --network sphnet --output_dir ./pretrain --num_epoch 16 \
        --batch_size 512 --lr 0.05 --sample_rate 1.0
"""

import argparse
import os


def main(args):
    from fedfr_tpu.utils.runtime import apply_platform_override

    apply_platform_override()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fedfr_tpu.data.datasets import BatchLoader, FaceRecordDataset
    from fedfr_tpu.data.pipeline import DevicePrefetcher
    from fedfr_tpu.federated.state import train_preprocess
    from fedfr_tpu.models import build_backbone
    from fedfr_tpu.parallel.mesh import model_mesh
    from fedfr_tpu.parallel.partial_fc import (
        pad_classes,
        partial_fc_loss,
        sampled_partial_fc_loss,
    )
    from fedfr_tpu.utils import torch_interop
    from fedfr_tpu.utils.checkpoint import save_native
    from fedfr_tpu.utils.logging import AverageMeter, ThroughputLogger, init_logging
    from fedfr_tpu.utils.optim import sgd_init, sgd_update

    logger = init_logging(args.output_dir, log_name="pretrain.log")

    from fedfr_tpu.utils.snapshot import snapshot_source

    snapshot_source(args.output_dir)  # provenance (reference train.py:50-51)
    mesh = model_mesh()
    n_shards = mesh.shape["model"]
    logger.info("partial-FC over %d model shards", n_shards)

    if args.data_dir.startswith("synth:"):
        # device-synthetic public set at reference scale (data/synthetic.py);
        # the spec string must match train.py's so the produced fc.pth rows
        # line up with the same universe's public labels
        from fedfr_tpu.data.synthetic import (build_fl_synthetic,
                                              explicit_synth_keys,
                                              parse_synth_spec)

        spec = parse_synth_spec(args.data_dir)
        explicit = explicit_synth_keys(args.data_dir)
        for k, v in (("image_size", args.image_size), ("seed", args.seed)):
            if k in explicit and spec[k] != v:
                raise ValueError(f"synth spec sets {k}={spec[k]} but the CLI "
                                 f"passes {k}={v}; drop one of the two")
            spec[k] = v
        dataset = build_fl_synthetic(spec)["public"]
    else:
        dataset = FaceRecordDataset(args.data_dir)
    num_classes = int(dataset.num_classes)
    labels_all = dataset.all_labels()
    logger.info("public set: %d imgs / %d ids", len(dataset), num_classes)

    backbone = build_backbone(args.network, args.embedding_size,
                              dropout=getattr(args, "dropout", 0.0),
                              bf16=not args.fp32, scan_blocks=args.scan_blocks)
    key = jax.random.PRNGKey(args.seed)
    variables = backbone.init(key, jnp.zeros((1, args.image_size, args.image_size, 3)),
                              train=False)
    weight = 0.01 * jax.random.normal(jax.random.PRNGKey(args.seed + 1),
                                      (num_classes, args.embedding_size))
    weight, num_valid = pad_classes(weight, n_shards)

    if args.sample_rate < 1.0:
        num_sample = max(1, int(args.sample_rate * weight.shape[0] // n_shards))
        pfc = sampled_partial_fc_loss(mesh, num_sample, args.loss, args.scale,
                                      args.margin, num_valid=num_valid)
        sampled = True
    else:
        pfc = partial_fc_loss(mesh, args.loss, args.scale, args.margin,
                              num_valid=num_valid)
        sampled = False

    def loss_fn(params, batch_stats, weight, x, labels, rng, drng):
        rngs = ({"dropout": drng}
                if getattr(args, "dropout", 0.0) > 0 else None)
        if batch_stats is not None:
            feats, mutated = backbone.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"], rngs=rngs)
            new_bs = mutated["batch_stats"]
        else:
            feats = backbone.apply({"params": params}, x, train=True,
                                   rngs=rngs)
            new_bs = None
        if sampled:
            loss = pfc(rng, feats, labels, weight)
        else:
            loss = pfc(feats, labels, weight)
        return loss, new_bs

    @jax.jit
    def train_step(params, batch_stats, weight, opt, wopt, u8, labels, lr, rng):
        prng, srng = jax.random.split(rng)
        # fold_in (not a wider split): keeps prng/srng streams identical to
        # dropout-free runs, so existing trajectories/resume states replay.
        # The tag must NOT be 1: threefry fold_in(k, i) == split(k)[i], so
        # fold_in(rng, 1) would be bit-identical to srng and the dropout
        # stream would reuse the partial-FC sampling key
        drng = jax.random.fold_in(rng, 0x64726F70)  # "drop"
        x = train_preprocess(prng, u8)
        (loss, new_bs), (gp, gw) = jax.value_and_grad(
            loss_fn, argnums=(0, 2), has_aux=True)(
            params, batch_stats, weight, x, labels, srng, drng)
        params, opt = sgd_update(params, gp, opt, lr, args.momentum,
                                 args.weight_decay)
        weight, wopt = sgd_update(weight, gw, wopt, lr, args.momentum,
                                  args.weight_decay)
        return params, new_bs, weight, opt, wopt, loss

    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    opt = sgd_init(params)
    wopt = sgd_init(weight)

    # round-level resume incl. FC weight + BOTH momentum buffers (parity
    # with PartialFC's weight/weight_mom resume, partial_fc.py:41-54)
    from fedfr_tpu.utils.checkpoint import load_native

    state_path = os.path.join(args.output_dir, "pretrain_state.npz")
    start_epoch = 0
    if args.resume and os.path.exists(state_path):
        from fedfr_tpu.utils.optim import SGDState

        st = load_native(state_path)
        params, weight = st["params"], jnp.asarray(st["weight"])
        opt = SGDState(st["opt_momentum"])
        wopt = SGDState(jnp.asarray(st["wopt_momentum"]))
        batch_stats = st.get("batch_stats")
        start_epoch = int(np.asarray(st["epoch"])) + 1
        logger.info("resumed pretraining at epoch %d", start_epoch)

    batch_sharding = NamedSharding(mesh, P("model"))
    weight = jax.device_put(weight, batch_sharding)
    wopt = jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), batch_sharding), wopt)

    milestones = [int(m) for m in args.lr_steps.split(",") if m]
    base_loader = BatchLoader(dataset, args.batch_size, shuffle=True,
                              seed=args.seed, drop_last=True,
                              num_workers=args.num_workers)
    # resume fidelity: replay the already-trained epochs' permutation draws
    # so a resumed run continues the uninterrupted run's shuffle stream
    # instead of repeating epoch 0's batch order (RoundCheckpointer's
    # bit-for-bit standard, utils/checkpoint.py)
    for _ in range(start_epoch):
        base_loader.rng.permutation(len(dataset))
    loader = DevicePrefetcher(base_loader)
    meter = AverageMeter()
    total_step = args.num_epoch * len(loader.loader)
    tlog = ThroughputLogger(args.log_every, total_step, args.batch_size, logger)
    key = jax.random.PRNGKey(args.seed + 7)
    gstep = start_epoch * len(loader.loader)
    for epoch in range(start_epoch, args.num_epoch):
        lr = args.lr * (0.1 ** sum(1 for m in milestones if m - 1 <= epoch))
        step_in_epoch = 0
        for u8, labels, valid in loader.epoch():
            # per-(epoch, step) keys: resume-stable (a split chain restarts
            # from position 0 on resume) and identical uninterrupted
            sub = jax.random.fold_in(jax.random.fold_in(key, epoch),
                                     step_in_epoch)
            step_in_epoch += 1
            u8 = jax.device_put(u8, batch_sharding)
            labels = jax.device_put(labels, batch_sharding)
            params, batch_stats, weight, opt, wopt, loss = train_step(
                params, batch_stats, weight, opt, wopt, u8, labels, lr, sub)
            gstep += 1
            if gstep % args.log_every == 0:
                meter.update(float(loss))
            tlog(gstep, meter, epoch)
        logger.info("epoch %d done, lr %.5f", epoch, lr)

        # artifact + resume-state save: every --save_every epochs and always
        # on the final epoch.  The save is NOT cheap relative to small-
        # universe epochs (fetch + compress + write ~570 MB ≈ 85 s on the
        # tunneled dev rig vs ~7 s of compute for a 39-step epoch), so
        # budgeted runs save at a coarser cadence; the reference saves every
        # epoch (train_pretrain.py), which --save_every 1 (default) matches.
        if ((epoch + 1) % getattr(args, "save_every", 1) != 0
                and epoch != args.num_epoch - 1):
            continue

        # ONE bounded-slice fetch per tree per epoch (chunked_device_get:
        # >8 MB single buffers collapse ~50x on some transports, and the
        # 98 MB fc1 leaf was previously pulled twice)
        from fedfr_tpu.utils.transfer import chunked_device_get

        host_params = chunked_device_get(params)
        host_weight = chunked_device_get(weight)
        host_bs = (chunked_device_get(batch_stats)
                   if batch_stats is not None else None)
        out_vars = {"params": host_params}
        if host_bs is not None:
            out_vars["batch_stats"] = host_bs
        try:
            sd = torch_interop.backbone_to_torch(args.network, out_vars)
            torch_interop.save_pth(sd, os.path.join(args.output_dir, "backbone.pth"))
        except NotImplementedError:
            save_native(out_vars, os.path.join(args.output_dir, "backbone.npz"))
        import torch

        fc_full = np.ascontiguousarray(host_weight[:num_valid])
        torch_interop.save_pth(torch.from_numpy(fc_full),
                               os.path.join(args.output_dir, "fc.pth"))
        torch_interop.save_pth(
            torch.from_numpy(labels_all.astype(np.int64)),
            os.path.join(args.output_dir, "preCos_pretrain_labels.pth"))
        state = {"params": host_params,
                 "weight": host_weight,
                 "opt_momentum": chunked_device_get(opt.momentum),
                 "wopt_momentum": chunked_device_get(wopt.momentum),
                 "epoch": np.int64(epoch)}
        if host_bs is not None:
            state["batch_stats"] = host_bs
        save_native(state, state_path)
    logger.info("pretraining done")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Partial-FC pretraining")
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--output_dir", default="./pretrain")
    parser.add_argument("--network", default="sphnet")
    parser.add_argument("--loss", default="CosFace")
    parser.add_argument("--embedding_size", type=int, default=512)
    parser.add_argument("--image_size", type=int, default=112)
    parser.add_argument("--batch_size", type=int, default=512)
    parser.add_argument("--num_epoch", type=int, default=16)
    parser.add_argument("--lr", type=float, default=0.05)
    parser.add_argument("--lr_steps", default="6,14")
    parser.add_argument("--scale", type=float, default=64.0)
    parser.add_argument("--margin", type=float, default=0.4)
    parser.add_argument("--momentum", type=float, default=0.9)
    parser.add_argument("--weight_decay", type=float, default=5e-4)
    parser.add_argument("--sample_rate", type=float, default=1.0)
    parser.add_argument("--num_workers", type=int, default=6)
    parser.add_argument("--log_every", type=int, default=50)
    parser.add_argument("--seed", type=int, default=100)
    parser.add_argument("--dropout", type=float, default=0.0,
                        help="backbone dropout before the embedding fc")
    parser.add_argument("--fp32", action="store_true")
    parser.add_argument("--scan_blocks", action="store_true")
    parser.add_argument("--save_every", type=int, default=1,
                        help="save artifacts + resume state every N epochs "
                             "(always saves the final epoch); 1 matches the "
                             "reference's per-epoch cadence")
    parser.add_argument("--resume", action="store_true",
                        help="resume from pretrain_state.npz (weight + "
                             "momentum, PartialFC partial_fc.py:41-54 parity)")
    main(parser.parse_args())
