"""Offline FL dataset generator (reference split_dataset/split_FL.py).

Splits a source MS1M-style rec (train.rec/train.idx) into:
  * local_veri_<N>:   per-ID first 40 images (test.rec + idx_id_pair.txt)
  * local_gallery_<N>: the remaining images per ID (test.rec)
  * split_train_i<N>c<C>/client_%04d: per-client train.rec relabeled 0..K-1
    with the client's global ID base in the header (the ID_base the training
    engine reads, reference dataset.py:199-207).

Determinism: seed 100 shuffles the ID list exactly as the reference
(split_FL.py:13-14,79) so the same source rec yields the same split.
"""

import argparse
import os
import pickle
import random
import sys
from collections import OrderedDict, defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fedfr_tpu.data.recordio import (  # noqa: E402
    IRHeader,
    IndexedRecordReader,
    IndexedRecordWriter,
    pack,
)

random.seed(100)
np.random.seed(100)


def build_id_index(reader: IndexedRecordReader, cache_path: str):
    """Map identity -> [record keys], cached (reference split_FL.py:57-76).

    The cache is validated against the source rec identity (path + size):
    re-running with a different --data_dir into the same output_dir must
    rebuild, not silently reuse record keys from the previous rec.
    """
    src = getattr(reader, "rec_path", None) or ""
    src_key = (os.path.abspath(src),
               os.path.getsize(src) if src and os.path.exists(src) else -1)
    if os.path.exists(cache_path):
        with open(cache_path, "rb") as f:
            cached = pickle.load(f)
        if isinstance(cached, dict) and cached.get("src_key") == list(src_key):
            return cached["id_dict"]
        # stale or legacy cache: rebuild
    header, _ = reader.read_idx(0)
    n = int(np.asarray(header.label).reshape(-1)[0]) - 1 if header.flag > 0 else len(reader.keys) - 1
    id_dict = defaultdict(list)
    for key in range(1, n + 1):
        h, _ = reader.read_idx(key)
        id_dict[h.scalar_label].append(key)
    with open(cache_path, "wb") as f:
        pickle.dump({"src_key": list(src_key), "id_dict": id_dict}, f,
                    protocol=5)
    return id_dict


def copy_records(reader, writer_path_idx, writer_path_rec, relabel,
                 id_txt_path=None, start_img_idx=1):
    writer = IndexedRecordWriter(writer_path_idx, writer_path_rec)
    txt = open(id_txt_path, "w") if id_txt_path else None
    if txt:
        txt.write("idx id\n")
    img_idx = start_img_idx
    for new_id, rec_keys in relabel:
        for key in rec_keys:
            _, payload = reader.read_idx(key)
            writer.write_idx(img_idx, pack(IRHeader(0, float(new_id), img_idx, 0), payload))
            if txt:
                txt.write("%d %d\n" % (img_idx, new_id))
            img_idx += 1
    return writer, txt, img_idx


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--num_client", type=int, default=40)
    parser.add_argument("--num_ID", type=int, default=4000)
    parser.add_argument("--min_imgs", type=int, default=101)
    parser.add_argument("--max_imgs", type=int, default=109)
    parser.add_argument("--test_imgs", type=int, default=40)
    args = parser.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    reader = IndexedRecordReader(os.path.join(args.data_dir, "train.idx"),
                                 os.path.join(args.data_dir, "train.rec"))
    id_dict = build_id_index(reader, os.path.join(args.output_dir, "ID2idx.pickle"))

    ids = list(id_dict.keys())
    random.shuffle(ids)
    # first half of the shuffled IDs feeds the FL pool (split_FL.py:83)
    candidates = ids[: int(len(ids) * 0.5)]
    samp = [i for i in candidates
            if args.max_imgs + 1 > len(id_dict[i]) > args.min_imgs - 1][: args.num_ID]
    if len(samp) < args.num_ID:
        raise SystemExit(f"only {len(samp)} IDs satisfy the image-count filter")

    test_dict = OrderedDict()
    train_dict = OrderedDict()
    for relabel, src_id in enumerate(samp):
        keys = id_dict[src_id]
        test_dict[relabel] = keys[: args.test_imgs]
        train_dict[relabel] = keys[args.test_imgs:]

    # local verification set
    test_dir = os.path.join(args.output_dir, f"local_veri_{args.num_ID}")
    os.makedirs(test_dir, exist_ok=True)
    w, txt, img_idx = copy_records(
        reader, os.path.join(test_dir, "test.idx"),
        os.path.join(test_dir, "test.rec"), list(test_dict.items()),
        os.path.join(test_dir, "idx_id_pair.txt"))
    w.write_idx(0, pack(IRHeader(2, np.asarray([float(img_idx), float(len(test_dict))]), 0, 0), b""))
    w.close(); txt.close()
    print(f"local_veri: {img_idx - 1} imgs, {len(test_dict)} IDs")

    # local gallery set
    gal_dir = os.path.join(args.output_dir, f"local_gallery_{args.num_ID}")
    os.makedirs(gal_dir, exist_ok=True)
    w, _, img_idx = copy_records(
        reader, os.path.join(gal_dir, "test.idx"),
        os.path.join(gal_dir, "test.rec"), list(train_dict.items()))
    w.write_idx(0, pack(IRHeader(2, np.asarray([float(img_idx), float(len(train_dict))]), 0, 0), b""))
    w.close()
    print(f"local_gallery: {img_idx - 1} imgs")

    # per-client train splits
    train_root = os.path.join(args.output_dir,
                              "split_train_i%04dc%04d" % (args.num_ID, args.num_client))
    per_client = args.num_ID // args.num_client
    start = 0
    for c in range(args.num_client):
        cdir = os.path.join(train_root, "client_%04d" % c)
        os.makedirs(cdir, exist_ok=True)
        relabel = [(new_id, train_dict[start + new_id]) for new_id in range(per_client)]
        w, _, img_idx = copy_records(
            reader, os.path.join(cdir, "train.idx"),
            os.path.join(cdir, "train.rec"), relabel)
        w.write_idx(0, pack(IRHeader(3, np.asarray(
            [float(img_idx), float(per_client), float(start)]), 0, 0), b""))
        w.close()
        start += per_client
        print(f"client {c}: {img_idx - 1} imgs, id_base {start - per_client}")


if __name__ == "__main__":
    main()
