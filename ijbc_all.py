"""IJB-C evaluation CLI (reference-compatible flags, ijbc_all.py:429-441).

    python ijbc_all.py --model-prefix ckpt/backbone_5.pth --root-path /data/IJBC \
        --result-dir ckpt --epoch 5 --batch-size 256 --network sphnet --job 1:1
"""

import argparse


def load_backbone_variables(network: str, path: str):
    from fedfr_tpu.utils import torch_interop
    from fedfr_tpu.utils.checkpoint import load_native

    if path.endswith(".npz"):
        return load_native(path)
    sd = torch_interop.load_pth(path)
    return torch_interop.backbone_from_torch(network, sd)


def main(args):
    from fedfr_tpu.utils.runtime import apply_platform_override

    apply_platform_override()
    import numpy as np

    from fedfr_tpu.evalsuite.ijbc import run_ijbc
    from fedfr_tpu.federated.embed import auto_embed_fn
    from fedfr_tpu.models import build_backbone

    variables = load_backbone_variables(args.network, args.model_prefix)
    backbone = build_backbone(args.network, args.embedding_size,
                              bf16=not args.fp32)
    embed_fn = auto_embed_fn(backbone)

    preloaded = np.load(args.load_feature) if args.load_feature else None
    results = run_ijbc(embed_fn, variables, args.root_path, args.result_dir,
                       epoch=args.epoch, job=args.job, batch_size=args.batch_size,
                       use_flip_test=args.use_flip_test, target=args.target,
                       preloaded_feats=preloaded, engine=args.engine)
    print(results)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="do ijb test")
    parser.add_argument("--model-prefix", default="", help="path to load model")
    parser.add_argument("--root-path", default="", type=str)
    parser.add_argument("--result-dir", default=".", type=str)
    parser.add_argument("--epoch", type=int, default=0)
    parser.add_argument("--batch-size", default=128, type=int)
    parser.add_argument("--network", default="sphnet", type=str)
    parser.add_argument("--embedding_size", default=512, type=int)
    parser.add_argument("--job", default="1:1", type=str,
                        help="1:1 or 1:n or both")
    parser.add_argument("--target", default="IJBC", type=str)
    parser.add_argument("--load_feature", default="",
                        help="path to pre-forwarded features (.npy)")
    parser.add_argument("--use_flip_test", action="store_true")
    parser.add_argument("--fp32", action="store_true")
    parser.add_argument("--engine", default="auto",
                        choices=["auto", "device", "host"],
                        help="scoring engine: device keeps features in HBM "
                             "end-to-end (default on TPU), host is the "
                             "numpy pipeline (default on CPU)")
    main(parser.parse_args())
