"""Offline public/pretrain dataset generator (reference split_pretrain.py).

Takes the LAST half of the seed-100-shuffled identity list, keeps IDs with
61-79 images, samples num_ID of them, and writes one (or more) client recs
relabeled 0..K-1 — the split_pretrain_6000/client_0000 public set the FedFR
joint optimization trains against.
"""

import argparse
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fedfr_tpu.data.recordio import (  # noqa: E402
    IRHeader,
    IndexedRecordReader,
    IndexedRecordWriter,
    pack,
)
from split_dataset.split_FL import build_id_index  # noqa: E402

random.seed(100)
np.random.seed(100)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--num_client", type=int, default=1)
    parser.add_argument("--num_ID", type=int, default=6000)
    parser.add_argument("--min_imgs", type=int, default=61)
    parser.add_argument("--max_imgs", type=int, default=79)
    parser.add_argument("--dis_relabel", action="store_true")
    args = parser.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    reader = IndexedRecordReader(os.path.join(args.data_dir, "train.idx"),
                                 os.path.join(args.data_dir, "train.rec"))
    id_dict = build_id_index(reader, os.path.join(args.output_dir, "ID2idx.pickle"))

    ids = list(id_dict.keys())
    random.shuffle(ids)
    # LAST half of the shuffle feeds the public pool (split_pretrain.py:83)
    candidates = ids[len(ids) - int(len(ids) * 0.5):]
    samp = [i for i in candidates
            if args.max_imgs + 1 > len(id_dict[i]) > args.min_imgs - 1]
    assert len(samp) >= args.num_ID, f"only {len(samp)} IDs qualify"
    samp = samp[: args.num_ID]

    root = os.path.join(args.output_dir, f"split_pretrain_{len(samp)}")
    start = 0
    for c in range(args.num_client):
        k = len(samp) // args.num_client + int((len(samp) % args.num_client) > c)
        client_ids = samp[start:start + k]
        start += k
        cdir = os.path.join(root, "client_%04d" % c)
        os.makedirs(cdir, exist_ok=True)
        w = IndexedRecordWriter(os.path.join(cdir, "train.idx"),
                                os.path.join(cdir, "train.rec"))
        img_idx = 1
        for new_id, src_id in enumerate(client_ids):
            label = new_id if not args.dis_relabel else src_id
            for key in id_dict[src_id]:
                _, payload = reader.read_idx(key)
                w.write_idx(img_idx, pack(IRHeader(0, float(label), img_idx, 0),
                                          payload))
                img_idx += 1
        w.write_idx(0, pack(IRHeader(2, np.asarray(
            [float(img_idx), float(len(client_ids))]), 0, 0), b""))
        w.close()
        print(f"public client {c}: {img_idx - 1} imgs, {len(client_ids)} IDs")


if __name__ == "__main__":
    main()
