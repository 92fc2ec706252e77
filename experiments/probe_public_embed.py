"""Probe: where does the real-data public embed spend its time?

The realdata round (experiments/realdata_train_tpu.py) logged
phase/public_embed = 871 s for a 9k-image set, vs 156 s round-0 (incl.
compile) for the 420k-image device-synthetic set at fullscale.  This
breaks the embed into host decode / upload / compile / dispatch / barrier
to locate the anomaly.

Usage: python experiments/probe_public_embed.py --public_dir <dir>
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--public_dir",
                    default="/tmp/realdata/ms1m_split/split_pretrain_6000/client_0000")
    ap.add_argument("--batch_size", type=int, default=512)
    ap.add_argument("--network", default="sphnet")
    ap.add_argument("--scan_blocks", action=argparse.BooleanOptionalAction,
                    default=True)  # --no-scan_blocks probes the unrolled path
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fedfr_tpu.data.datasets import BatchLoader, FaceRecordDataset
    from fedfr_tpu.federated.embed import make_embed_fn, _l2norm_rows
    from fedfr_tpu.models import build_backbone

    ds = FaceRecordDataset(args.public_dir)
    print(f"dataset: {len(ds)} imgs", flush=True)

    # phase A: host decode alone
    t0 = time.time()
    nb = 0
    with BatchLoader(ds, args.batch_size, shuffle=False,
                     drop_last=False) as loader:
        for imgs, labels, valid in loader.epoch():
            nb += 1
    ta = time.time() - t0
    print(f"A host decode: {ta:.1f}s for {nb} batches "
          f"({len(ds)/ta:.0f} imgs/s)", flush=True)

    backbone = build_backbone(args.network, embedding_size=512,
                              scan_blocks=args.scan_blocks)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((args.batch_size, 112, 112, 3), jnp.uint8)
    t0 = time.time()
    variables = jax.jit(lambda r: backbone.init(
        r, jnp.zeros((args.batch_size, 112, 112, 3), jnp.float32),
        train=False))(rng)
    # completion barrier: device_get of one element — block_until_ready is
    # not reliable on this transport (CLAUDE.md), and this probe exists to
    # attribute time between phases
    np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(variables)[0].ravel()[:1]))
    print(f"B init: {time.time()-t0:.1f}s", flush=True)

    embed_fn = make_embed_fn(backbone)
    t0 = time.time()
    f = embed_fn(variables, x0)
    np.asarray(jax.device_get(f[:1]))
    print(f"C first embed call (compile): {time.time()-t0:.1f}s", flush=True)

    # phase D: the embed_dataset loop shape, instrumented
    t0 = time.time()
    t_host = t_up = t_disp = 0.0
    chunks = []
    with BatchLoader(ds, args.batch_size, shuffle=False,
                     drop_last=False) as loader:
        it = loader.epoch()
        while True:
            t1 = time.time()
            try:
                imgs, labels, valid = next(it)
            except StopIteration:
                break
            t2 = time.time()
            u8 = jnp.asarray(imgs)
            t3 = time.time()
            fb = embed_fn(variables, u8)
            chunks.append(fb[: int(valid.sum())])
            t4 = time.time()
            t_host += t2 - t1
            t_up += t3 - t2
            t_disp += t4 - t3
    feats = jnp.concatenate(chunks)
    feats = _l2norm_rows(feats)
    t5 = time.time()
    np.asarray(jax.device_get(feats[:1]))
    t6 = time.time()
    print(f"D loop total {t6-t0:.1f}s: host {t_host:.1f}s  upload(asarray) "
          f"{t_up:.1f}s  dispatch {t_disp:.1f}s  concat+norm {t5-t4:.1f}s  "
          f"barrier {t6-t5:.1f}s", flush=True)
    print(f"   => {len(ds)/(t6-t0):.0f} imgs/s end-to-end", flush=True)


if __name__ == "__main__":
    main()
