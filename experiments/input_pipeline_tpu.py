"""Host input-pipeline headroom vs the TPU's consumption rates.

The device embed path sustains ~11.7k imgs/s/chip and the joint train step
~1.9k imgs/s/chip (bench.py); the open question from DESIGN.md was whether
the HOST data plane — mmap'd RecordIO + threaded JPEG decode
(fedfr_tpu/native) + BatchLoader/DevicePrefetcher — can feed those rates
from real JPEG records (the reference leaned on mxnet's C++ loader,
dataset.py:44-71).  This experiment measures, on a real JPEG rec written to
disk:

1. loader-only drain rate (native decode) vs worker/thread count;
2. loader -> DevicePrefetcher -> device embed, end-to-end, vs the
   device-generated ceiling;
3. the first-run IJB-C alignment loop (imread+warpAffine), single- vs
   multi-threaded (ijbc_all.py:142-174 is single-threaded in the
   reference; evalsuite/ijbc.py now threads it).

Usage: python experiments/input_pipeline_tpu.py [--n 20000] [--no_tpu]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_jpeg_rec(root: str, n: int, image_size: int = 112, seed: int = 0):
    """A realistic JPEG rec: identity-block images so JPEG payload sizes
    match face-crop entropy (~4-8 KB), not noise (~25 KB)."""
    from fedfr_tpu.data import codec
    from fedfr_tpu.data.recordio import write_split

    rng = np.random.default_rng(seed)
    payloads, labels = [], []
    n_ids = max(1, n // 64)
    rep = image_size // 4
    for i in range(n):
        pid = i % n_ids
        block = np.random.default_rng(pid).integers(30, 226, (4, 4, 3))
        base = np.kron(block, np.ones((rep, rep, 1), dtype=np.int64))
        img = np.clip(base + rng.integers(-18, 19, base.shape), 0,
                      255).astype(np.uint8)
        payloads.append(codec.encode_jpeg(img))
        labels.append(pid)
    os.makedirs(root, exist_ok=True)
    write_split(os.path.join(root, "train.idx"),
                os.path.join(root, "train.rec"), payloads, labels,
                num_classes=n_ids)
    return float(np.mean([len(p) for p in payloads]))


def bench_loader(dataset, batch: int, workers: int, epochs: int = 1):
    from fedfr_tpu.data.datasets import BatchLoader

    with BatchLoader(dataset, batch, shuffle=True, seed=1, drop_last=True,
                     num_workers=workers) as bl:
        # warm one epoch (page cache, native-thread spin-up)
        for imgs, labels, valid in bl.epoch():
            pass
        t0 = time.perf_counter()
        n = 0
        for _ in range(epochs):
            for imgs, labels, valid in bl.epoch():
                n += imgs.shape[0]
        dt = time.perf_counter() - t0
    return n / dt


def bench_embed_consumer(dataset, batch: int, network: str = "sphnet"):
    """Sustained end-to-end rate: loader -> prefetcher -> jitted embed."""
    import jax
    import jax.numpy as jnp

    from fedfr_tpu.data.datasets import BatchLoader
    from fedfr_tpu.data.pipeline import DevicePrefetcher
    from fedfr_tpu.federated.state import normalize_images
    from fedfr_tpu.models import build_backbone
    from fedfr_tpu.models.factory import fast_zero_variables

    backbone = build_backbone(network, 512, bf16=True, scan_blocks=True)
    variables = fast_zero_variables(backbone, jax.random.PRNGKey(0),
                                    jnp.zeros((1, 112, 112, 3)), train=False)

    @jax.jit
    def embed(variables, u8):
        return backbone.apply(variables, normalize_images(u8), train=False)

    # ceiling: device-generated batches through the same executable
    @jax.jit
    def gen(key):
        return jax.random.randint(key, (batch, 112, 112, 3), 0, 255,
                                  jnp.uint8)

    ins = [gen(k) for k in jax.random.split(jax.random.PRNGKey(1), 8)]
    for b in ins:
        b.block_until_ready()
    np.asarray(embed(variables, ins[0])[:1])  # compile
    t0 = time.perf_counter()
    outs = [embed(variables, b) for b in ins]
    np.asarray(outs[-1][:1])
    ceiling = batch * len(ins) / (time.perf_counter() - t0)

    loader = BatchLoader(dataset, batch, shuffle=False, drop_last=True,
                         num_workers=6)
    pf = DevicePrefetcher(loader, depth=3)
    for u8, labels, valid in pf.epoch():  # warm epoch
        out = embed(variables, u8)
    np.asarray(out[:1])
    t0 = time.perf_counter()
    n = 0
    for u8, labels, valid in pf.epoch():
        out = embed(variables, u8)
        n += u8.shape[0]
    np.asarray(out[:1])
    dt = time.perf_counter() - t0
    loader.close()
    return n / dt, ceiling


def bench_alignment(n: int = 4000, workers=(1, 0)):
    """imread+warpAffine rate single- vs multi-threaded (the threaded loop
    now in evalsuite/ijbc.py; reference ijbc_all.py:142-174 is 1-thread)."""
    import cv2

    from concurrent.futures import ThreadPoolExecutor

    from fedfr_tpu.evalsuite.align import align_face

    tmp = tempfile.mkdtemp(prefix="align_bench_")
    rng = np.random.default_rng(0)
    names = []
    for i in range(min(n, 512)):  # distinct files, reused cyclically
        img = rng.integers(0, 256, (180, 160, 3), dtype=np.uint8)
        p = os.path.join(tmp, f"{i}.jpg")
        cv2.imwrite(p, img)
        names.append(p)
    lmks = (np.array([[55, 70], [105, 70], [80, 95], [62, 120], [98, 120]],
                     np.float32)[None] + rng.normal(0, 3, (n, 5, 2))).astype(
        np.float32)
    out = np.empty((n, 112, 112, 3), np.uint8)

    def one(i):
        bgr = cv2.imread(names[i % len(names)])
        out[i] = align_face(bgr, lmks[i])  # (5,2) landmarks

    rates = {}
    for w in workers:
        w_eff = w or min(32, os.cpu_count() or 4)
        t0 = time.perf_counter()
        if w_eff == 1:
            for i in range(n):
                one(i)
        else:
            with ThreadPoolExecutor(max_workers=w_eff) as pool:
                list(pool.map(one, range(n), chunksize=64))
        rates[f"{w_eff}_threads"] = round(n / (time.perf_counter() - t0), 1)
    shutil.rmtree(tmp)
    return rates


def main():
    from fedfr_tpu.utils.runtime import apply_platform_override

    apply_platform_override()
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--no_tpu", action="store_true",
                    help="skip the device-consumer phase")
    args = ap.parse_args()

    from fedfr_tpu.data.datasets import FaceRecordDataset

    root = tempfile.mkdtemp(prefix="pipe_bench_")
    try:
        jpeg_bytes = make_jpeg_rec(root, args.n)
        ds = FaceRecordDataset(root)
        native = ds._native is not None

        loader_rates = {w: round(bench_loader(ds, args.batch, w), 1)
                        for w in (1, 2, 6, 12)}

        result = {
            "experiment": "input_pipeline",
            "n_images": args.n,
            "avg_jpeg_bytes": round(jpeg_bytes, 1),
            "native_decoder": native,
            "loader_imgs_per_sec_by_workers": loader_rates,
            "alignment_imgs_per_sec": bench_alignment(),
        }
        if not args.no_tpu:
            e2e, ceiling = bench_embed_consumer(ds, args.batch)
            result["embed_e2e_imgs_per_sec"] = round(e2e, 1)
            result["embed_device_ceiling_imgs_per_sec"] = round(ceiling, 1)
            result["pipeline_efficiency"] = round(e2e / ceiling, 3)
        print(json.dumps(result, indent=2))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
