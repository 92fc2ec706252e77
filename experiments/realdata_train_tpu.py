"""One FedFR training round on the real TPU fed by REAL JPEG RecordIO.

VERDICT r3 missing #3: every at-scale TPU run uses the device-synthetic
data plane, and the host JPEG loader was only measured standalone
(experiments/input_pipeline_tpu.py: 6.2k imgs/s/core drain rate).  This
experiment composes the production data plane end-to-end — JPEG rec files
on disk -> mmap'd RecordIO + threaded native decode -> DevicePrefetcher
(uint8 on the wire) -> jitted train step on the chip — through the real CLI
chain (split_dataset/*, pretrain.py, train.py), exactly the reference's
production pipeline shape (reference dataset.py:190-260 + train.py), and
reports the sustained in-epoch training throughput vs the synth-fed
baseline (2,020 samples/s at reference scale, DESIGN.md).

Scale is bounded deliberately: the dev rig's tunneled PJRT client leaks
host RSS 1:1 with uploaded bytes (CLAUDE.md), so the workload is sized to
a few GB of batch uploads (8 clients x 30 IDs, ~9k-image public set).  The
training math per step is the flagship shape (sphere64, E512, batch 64,
every FedFR mechanism on) so the steady-state samples/s is comparable.

Each phase runs in its own subprocess so no two live PJRT clients contend
on the single tunneled chip.

Usage:
    python experiments/realdata_train_tpu.py --work_dir /tmp/realdata
"""

import argparse
import json
import os
import re
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fullscale_tpu import run  # noqa: E402


def build_data(root: str, *, n_clients: int, ids_per_client: int,
               imgs_per_id: int, pub_ids: int, test_imgs: int,
               image_size: int = 112, seed: int = 100) -> None:
    """Source rec of identity-structured JPEGs -> split_FL + split_pretrain
    -> the rec_root layout train.py consumes, plus an agedb-style val .bin.

    Images are identity-block based (like input_pipeline_tpu.make_jpeg_rec)
    so JPEG payload sizes match face-crop entropy and intra-identity
    structure survives compression — the mining/BCE paths see a learnable
    universe, not noise.
    """
    from fedfr_tpu.data import codec
    from fedfr_tpu.data.recordio import write_split

    src = os.path.join(root, "source")
    out = os.path.join(root, "ms1m_split")
    os.makedirs(src, exist_ok=True)

    n_fl = n_clients * ids_per_client
    # split_FL takes FL ids from the front half of the seed-100 shuffle and
    # split_pretrain from the BACK half: each pool must cover its draw
    total_ids = 2 * (n_fl + pub_ids)
    rng = np.random.default_rng(seed)
    rep = image_size // 8
    payloads, labels = [], []
    for pid in range(total_ids):
        id_rng = np.random.default_rng(seed + 1 + pid)
        block = id_rng.integers(30, 226, (8, 8, 3))
        base = np.kron(block, np.ones((rep, rep, 1), dtype=np.int64))
        for _ in range(imgs_per_id):
            img = np.clip(base + rng.integers(-18, 19, base.shape), 0,
                          255).astype(np.uint8)
            payloads.append(codec.encode_jpeg(img, quality=90))
            labels.append(pid)
    write_split(os.path.join(src, "train.idx"), os.path.join(src, "train.rec"),
                payloads, labels, num_classes=total_ids)
    mb = sum(len(p) for p in payloads) / 1e6
    print(f"source rec: {len(payloads)} JPEGs, {mb:.1f} MB "
          f"({mb * 1e3 / len(payloads):.1f} KB/img)", flush=True)

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from helpers import run_split_clis

    run_split_clis(src, out, num_client=n_clients, num_id=n_fl,
                   imgs_per_id=imgs_per_id, test_imgs=test_imgs,
                   pub_ids=pub_ids)
    os.rename(os.path.join(out, "split_pretrain_%d" % pub_ids),
              os.path.join(out, "split_pretrain_6000"))

    # val .bin from the veri split (JPEG payloads pass through verbatim)
    import pickle

    from fedfr_tpu.data.datasets import FaceRecordDataset

    veri = FaceRecordDataset(os.path.join(out, "local_veri_%d" % n_fl),
                             prefix="test")
    from fullscale_tpu import sample_pairs

    picks, issame = sample_pairs(veri.all_labels(), 400,
                                 np.random.default_rng(seed + 7))
    bins = [veri.reader.read_idx(int(veri.imgidx[k]))[1] for k in picks]
    val = os.path.join(root, "val")
    os.makedirs(val, exist_ok=True)
    with open(os.path.join(val, "agedb_30.bin"), "wb") as f:
        pickle.dump((bins, issame), f)


def main():
    from fedfr_tpu.utils.runtime import apply_platform_override

    apply_platform_override()
    ap = argparse.ArgumentParser()
    ap.add_argument("--work_dir", default="/tmp/realdata")
    ap.add_argument("--n_clients", type=int, default=8)
    ap.add_argument("--ids_per_client", type=int, default=30)
    ap.add_argument("--imgs_per_id", type=int, default=30)
    ap.add_argument("--pub_ids", type=int, default=300)
    ap.add_argument("--test_imgs", type=int, default=6)
    ap.add_argument("--local_epoch", type=int, default=2)
    ap.add_argument("--num_workers", type=int, default=2)
    ap.add_argument("--network", default="sphnet")
    ap.add_argument("--embedding_size", type=int, default=512)
    ap.add_argument("--pretrain_batch", type=int, default=128)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--skip_data", action="store_true")
    ap.add_argument("--stall_timeout", type=float, default=1800)
    args = ap.parse_args()

    w = args.work_dir
    if not args.skip_data and os.path.exists(w):
        shutil.rmtree(w)
    os.makedirs(w, exist_ok=True)
    out = os.path.join(w, "ms1m_split")
    pre = os.path.join(w, "pre")
    run_dir = os.path.join(w, "run")
    n_fl = args.n_clients * args.ids_per_client
    summary = {"n_clients": args.n_clients, "ids_per_client": args.ids_per_client,
               "imgs_per_id": args.imgs_per_id, "pub_ids": args.pub_ids}

    if not (args.skip_data and os.path.exists(out)):
        # data build is host-only; subprocess keeps this parent free of any
        # device client before the TPU phases
        code = ("import sys; sys.path.insert(0, %r); "
                "sys.path.insert(0, %r); "
                "from realdata_train_tpu import build_data; "
                "build_data(%r, n_clients=%d, ids_per_client=%d, "
                "imgs_per_id=%d, pub_ids=%d, test_imgs=%d)" % (
                    REPO, os.path.join(REPO, "experiments"), w,
                    args.n_clients, args.ids_per_client, args.imgs_per_id,
                    args.pub_ids, args.test_imgs))
        env = dict(os.environ, FEDFR_PLATFORM="cpu")
        print("+ build_data", flush=True)
        subprocess.run([sys.executable, "-c", code], check=True, cwd=REPO,
                       env=env)

    if not os.path.exists(os.path.join(pre, "fc.pth")):
        dt = run([sys.executable, "pretrain.py",
                  "--data_dir", os.path.join(out, "split_pretrain_6000",
                                             "client_0000"),
                  "--output_dir", pre, "--network", args.network,
                  "--embedding_size", str(args.embedding_size),
                  "--batch_size", str(args.pretrain_batch),
                  "--num_epoch", "2", "--lr", "0.001", "--lr_steps", "",
                  "--scan_blocks"], stall_timeout=args.stall_timeout)
        summary["pretrain_s"] = round(dt, 1)

    dt = run([sys.executable, "train.py",
              "--pretrained_root", pre, "--network", args.network,
              "--output_dir", run_dir, "--loss", "CosFace",
              "--batch_size", str(args.batch_size),
              "--num_client", str(args.n_clients),
              "--num_ids", str(n_fl), "--client_sampled_ratio", "1.0",
              "--lr", "0.001", "--total_round", "1",
              "--local_epoch", str(args.local_epoch), "--fedface",
              "--add_pretrained_data", "--combine_dataset",
              "--contrastive_bb", "--return_all", "--BCE_local",
              "--adaptive_local_epoch",
              "--embedding_size", str(args.embedding_size),
              "--rec_root", out, "--local_rec",
              os.path.join(out, "local_veri_%d" % n_fl),
              "--val_root", os.path.join(w, "val"),
              "--num_workers", str(args.num_workers),
              "--client_ckpt_every", "0", "--round_ckpt_every", "0",
              "--scan_blocks"], stall_timeout=args.stall_timeout)
    summary["train_round_s"] = round(dt, 1)

    text = open(os.path.join(run_dir, "training.log")).read()
    rates = [float(m.group(1)) for m in re.finditer(
        r"([0-9.]+) samples/sec", text)]
    if rates:
        # first epochs carry the remote compile; steady state is the tail
        tail = rates[len(rates) // 2:]
        summary["samples_per_sec"] = {
            "n": len(rates), "median_all": float(np.median(rates)),
            "steady_median": float(np.median(tail)),
            "steady_p10": float(np.percentile(tail, 10)),
            "steady_p90": float(np.percentile(tail, 90)),
        }
    mined = [int(m.group(1)) for m in re.finditer(
        r"(\d+) imgs \((\d+) IDs\) hard negative", text)]
    if mined:
        summary["mined_imgs_per_client"] = {
            "min": min(mined), "mean": int(np.mean(mined)), "max": max(mined)}
    print(json.dumps(summary, indent=2))
    with open(os.path.join(w, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
