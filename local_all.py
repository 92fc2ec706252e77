"""Post-hoc personalized evaluation CLI (reference local_all.py:224-454).

--backbone multi: per client, load clients/client_%d/backbone(.pth|.npz)
(+ bce_module -> backbone+converter concat), embed the local veri set, then
1:1 (in-process ROC histogram — no roc_cuda subprocess) or 1:n (per-client
100-ID mean-feature gallery, open-set TPIR@FPIR).
--backbone single: evaluate one global checkpoint the same way.
"""

import argparse
import os

import numpy as np


def main(args):
    from fedfr_tpu.utils.runtime import apply_platform_override

    apply_platform_override()
    from fedfr_tpu.data.datasets import FaceRecordDataset
    from fedfr_tpu.data.synthetic import is_synth_spec as is_synth_root
    from fedfr_tpu.evalsuite.local_eval import (
        client_query_mask,
        local_11_roc,
        mean_tpr_tables,
        open_set_identification,
    )
    from fedfr_tpu.federated.embed import auto_embed_fn, class_mean_features, embed_dataset
    from fedfr_tpu.models import BCEModule, build_backbone
    from fedfr_tpu.utils import torch_interop

    from ijbc_all import load_backbone_variables

    backbone = build_backbone(args.network, args.embedding_size,
                              bf16=not args.fp32)
    # converter_layer must match training (the bce_module.npz fallback is
    # written exactly when the converter is a BottleBlock, i.e. != 1)
    bce_module = BCEModule(args.embedding_size, args.num_ids // args.num_client,
                           converter_layers=getattr(args, "converter_layer", 1))
    embed_fn_plain = auto_embed_fn(backbone)
    embed_fn_conv = auto_embed_fn(backbone, bce_module)

    ids_per_client = args.num_ids // args.num_client
    # a synth: spec as --data_dir evaluates against the device-synthetic
    # universe (same string as training): veri = the universe's veri split,
    # gallery = the clients' own train images — exactly the reference's
    # gallery semantics (split_FL.py routes the post-veri remainder of each
    # ID to BOTH the client train rec and local_gallery, split_FL.py:131-154)
    universe = None
    if is_synth_root(args.data_dir):
        from fedfr_tpu.data.synthetic import build_fl_synthetic, parse_synth_spec

        spec = parse_synth_spec(args.data_dir)
        for key, val in (("clients", args.num_client),
                         ("ids_per_client", ids_per_client)):
            if spec[key] != val:
                raise ValueError(
                    f"synth spec has {key}={spec[key]} but the CLI flags "
                    f"imply {key}={val}; they must agree (identity alignment "
                    "with the trained checkpoints depends on it)")
        if spec["veri_ids"] < args.num_ids:
            # veri labels span [0, veri_ids); clients whose ID range lies
            # beyond it would get all-masked queries and silent 0.0 rows
            # deflating the averaged tables
            raise ValueError(
                f"synth spec veri_ids={spec['veri_ids']} does not cover "
                f"num_ids={args.num_ids}; every client's global ID range "
                "must appear in the veri split (reference split_FL.py "
                "routes all FL IDs into local_veri_4000)")
        universe = build_fl_synthetic(spec)
        veri = universe["veri"]
    else:
        veri = FaceRecordDataset(args.data_dir, prefix="test")
    log_dir = args.ckpt_path

    def embed_with(variables, bce_params):
        if bce_params is not None:
            return embed_dataset(embed_fn_conv, variables, veri,
                                 args.batch_size, bce_params=bce_params)
        return embed_dataset(embed_fn_plain, variables, veri, args.batch_size)

    def load_client(c):
        base = os.path.join(args.ckpt_path, "clients", f"client_{c}")
        suffix = "" if args.epoch == -1 else f"_{args.epoch}"
        for ext in (".pth", ".npz"):
            p = os.path.join(base, f"backbone{suffix}{ext}")
            if os.path.exists(p):
                variables = load_backbone_variables(args.network, p)
                break
        else:
            raise FileNotFoundError(f"no backbone checkpoint in {base}")
        bce_params = None
        bp = os.path.join(base, f"bce_module{suffix}.pth")
        if os.path.exists(bp):
            bce_params = torch_interop.bce_from_torch(
                torch_interop.load_pth(bp))["params"]
        else:
            # native fallback written when the converter has no torch
            # export (server.save_client_checkpoints for BottleBlock)
            bn = os.path.join(base, f"bce_module{suffix}.npz")
            if os.path.exists(bn):
                from fedfr_tpu.utils.checkpoint import load_native

                bce_params = load_native(bn)["params"]
        return variables, bce_params

    results = []
    tables = []
    if args.backbone == "single":
        if args.task == "1:1":
            with open(os.path.join(log_dir, "local_log.txt"), "a") as f:
                f.write("1:1 at Epoch : %d\n" % args.epoch)
        path = os.path.join(args.ckpt_path, f"backbone_{args.epoch}.pth")
        if not os.path.exists(path):
            path = os.path.join(args.ckpt_path, f"backbone_{args.epoch}.npz")
        variables = load_backbone_variables(args.network, path)
        feats, labels = embed_with(variables, None)
        gallery_feats = gallery_labels = None
        if args.task == "1:n":
            if universe is not None:
                parts = [embed_dataset(embed_fn_plain, variables, d,
                                       args.batch_size)
                         for d in universe["clients"]]
                gallery_feats = np.concatenate([p[0] for p in parts])
                gallery_labels = np.concatenate(
                    [p[1] + d.id_base
                     for p, d in zip(parts, universe["clients"])])
            else:
                gal = FaceRecordDataset(args.gallery_data_dir, prefix="test")
                gfeats, glabels = embed_dataset(embed_fn_plain, variables, gal,
                                                args.batch_size)
                gallery_feats, gallery_labels = gfeats, glabels
        gallery_means = None
        if args.task == "1:n":  # loop-invariant: compute once, slice per client
            gallery_means = class_mean_features(gallery_feats, gallery_labels,
                                                args.num_ids)
        for c in range(args.num_client):
            start, end = c * ids_per_client, (c + 1) * ids_per_client
            if args.task == "1:1":
                tables.append(local_11_roc(feats, labels, start, end,
                                           epoch=args.epoch, output_dir=log_dir))
            else:
                cg = gallery_means[start:end]
                mask = client_query_mask(labels, start, end)
                res, fars = open_set_identification(feats, cg, mask)
                results.append(res)
    else:  # multi
        gal = None
        if args.task == "1:n" and universe is None:
            gal = FaceRecordDataset(args.gallery_data_dir, prefix="test")
            gal_labels_all = gal.all_labels()
        for c in range(args.num_client):
            print(f"Process client {c}...")
            variables, bce_params = load_client(c)
            feats, labels = embed_with(variables, bce_params)
            start, end = c * ids_per_client, (c + 1) * ids_per_client
            if args.task == "1:1":
                tables.append(local_11_roc(feats, labels, start, end,
                                           epoch=args.epoch, output_dir=log_dir))
            else:
                if universe is not None:
                    # client c's train images ARE its gallery (labels
                    # already local 0..ids_per_client-1)
                    sub = universe["clients"][c]
                    gal_base = 0
                else:
                    keep = (gal_labels_all >= start) & (gal_labels_all < end)
                    sub = gal.subset(np.nonzero(keep)[0] + 1)
                    gal_base = start  # rec gallery labels are global
                if bce_params is not None:
                    gfeats, glabels = embed_dataset(embed_fn_conv, variables, sub,
                                                    args.batch_size,
                                                    bce_params=bce_params)
                else:
                    gfeats, glabels = embed_dataset(embed_fn_plain, variables, sub,
                                                    args.batch_size)
                cg = class_mean_features(gfeats, glabels - gal_base,
                                         ids_per_client)
                mask = client_query_mask(labels, start, end)
                res, fars = open_set_identification(feats, cg, mask)
                results.append(res)

    if args.task == "1:1":
        mean = mean_tpr_tables(tables)
        print("-" * 40)
        print("1:1 average results (-6 to -1):")
        print("%r" % ["%.2f" % v for v in mean])
        with open(os.path.join(log_dir, "local_log.txt"), "a") as f:
            f.write("Mean (-6 to -1):\n[")
            for v in mean:
                f.write("%.2f " % v)
            f.write("]\n")
    else:
        mean = np.mean(np.asarray(results), axis=0)
        fars = [1e-6, 1e-5, 1e-4, 1e-3]
        print("-" * 40)
        print("1:n average results:")
        print("Far: %r" % ["%.1e" % far for far in fars])
        print("Pr : %r" % ["%.5f" % pr for pr in mean])
        with open(os.path.join(log_dir, "local_log.txt"), "a") as f:
            f.write("1:n at Epoch : %d\n" % args.epoch)
            f.write("Far: %r\n" % ["%.1e" % far for far in fars])
            f.write("Pr : %r\n" % ["%.5f" % pr for pr in mean])


if __name__ == "__main__":
    parser = argparse.ArgumentParser("")
    parser.add_argument("--backbone", type=str, default="multi")
    parser.add_argument("--task", default="1:1")
    parser.add_argument("--ckpt_path")
    parser.add_argument("--data_dir", type=str, default="")
    parser.add_argument("--gallery_data_dir", type=str, default="")
    parser.add_argument("--epoch", type=int, default=-1)
    parser.add_argument("--num_client", type=int, default=40)
    parser.add_argument("--num_ids", type=int, default=4000,
                        help="total FL identities (reference convention: 4000)")
    parser.add_argument("--embedding_size", type=int, default=512)
    parser.add_argument("--network", default="sphnet")
    parser.add_argument("--gpu", type=str, nargs="+", default=None,
                        help="accepted for reference-command compatibility")
    parser.add_argument("--fp16", action="store_true",
                        help="reference-compat alias (bf16 trunk is default)")
    parser.add_argument("--batch_size", type=int, default=512)
    parser.add_argument("--fp32", action="store_true")
    parser.add_argument("--converter_layer", type=int, default=1,
                        help="BCE transformation layer used in training: "
                             "1=linear, else BottleBlock")
    main(parser.parse_args())
