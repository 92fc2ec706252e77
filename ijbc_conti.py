"""Multi-epoch IJB-C driver (reference ijbc_conti.py) — in-process, no
os.system: embeds are jitted once and reused across checkpoints."""

import argparse


def main(args):
    from fedfr_tpu.utils.runtime import apply_platform_override

    apply_platform_override()
    from fedfr_tpu.evalsuite.ijbc import run_ijbc
    from fedfr_tpu.federated.embed import auto_embed_fn
    from fedfr_tpu.models import build_backbone

    from ijbc_all import load_backbone_variables

    backbone = build_backbone(args.network, args.embedding_size)
    embed_fn = auto_embed_fn(backbone)
    for e in args.epoch:
        path = f"{args.ckpt_dir}/backbone_{e}.pth"
        import os

        if not os.path.exists(path):
            path = f"{args.ckpt_dir}/backbone_{e}.npz"
        variables = load_backbone_variables(args.network, path)
        print(f"=== epoch {e}: {path} ===")
        run_ijbc(embed_fn, variables, args.root_path, args.ckpt_dir,
                 epoch=e, job=args.job, batch_size=args.batch_size,
                 engine=getattr(args, "engine", "auto"))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_dir")
    parser.add_argument("--root_path", default="")
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--job", default="1:1")
    parser.add_argument("--epoch", type=int, nargs="+")
    parser.add_argument("--network", default="sphnet")
    parser.add_argument("--embedding_size", type=int, default=512)
    parser.add_argument("--engine", default="auto",
                        choices=["auto", "device", "host"],
                        help="scoring engine (see ijbc_all.py)")
    parser.add_argument("--gpu", type=str, nargs="+", default=None,
                        help="accepted for reference-command compatibility; "
                             "device placement is managed by JAX")
    main(parser.parse_args())
