"""IJB-C-scale evaluation throughput on one TPU chip.

The reference evaluates IJB-C on 4 CUDA GPUs (README.md:26-27): 469,375
aligned crops embedded with flip-test (ijbc_all.py:92-103), media/template
aggregation (ijbc_all.py:225-298), 15,658,489 template-pair cosine scores
(ijbc_all.py:300-326) and the ROC sweep (ijbc_all.py:572-586).  Real IJB-C
data is not mounted on this rig, so this experiment times every phase at the
REAL workload scale on synthetic inputs:

* embedding — on the TPU through the production jitted embed path, images
  generated on device (the dev tunnel moves ~1 MB/s; production hosts feed
  the chip over PCIe, and the data plane decodes >=5.7k JPEG/s/core);
* aggregation / pair scoring / ROC — the production host-numpy code of
  evalsuite/ijbc.py on host-synthesized features at the true template,
  media, and pair counts.

Phases are timed separately and summed; accuracy is covered elsewhere
(oracle-tested aggregation + metrics, tests/test_evalsuite.py).

Usage: python experiments/ijbc_scale_tpu.py [--network sphnet] [--quick]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# true IJB-C 1:1 protocol scale (ijbc_all.py meta files)
N_IMGS = 469375
N_TMPL = 23124
N_PAIRS = 15658489
N_GALLERY = 3531      # G1 + G2 templates
N_PROBE = 19593


def bench_embed_phase(network: str, batch: int, n_imgs: int, flip: bool):
    import jax
    import jax.numpy as jnp

    from fedfr_tpu.models import build_backbone
    from fedfr_tpu.models.factory import fast_zero_variables
    from fedfr_tpu.federated.state import normalize_images

    backbone = build_backbone(network, 512, bf16=True, scan_blocks=True)
    variables = fast_zero_variables(backbone, jax.random.PRNGKey(0),
                                    jnp.zeros((1, 112, 112, 3)), train=False)

    @jax.jit
    def embed_batch(variables, key):
        u8 = jax.random.randint(key, (batch, 112, 112, 3), 0, 255, jnp.uint8)
        x = normalize_images(u8)
        f = backbone.apply(variables, x, train=False)
        if flip:  # flip-test: second forward on the mirrored crop, summed
            f = f + backbone.apply(variables, x[:, :, ::-1, :], train=False)
        return f

    n_batches = (n_imgs + batch - 1) // batch
    keys = jax.random.split(jax.random.PRNGKey(1), n_batches + 1)
    out = embed_batch(variables, keys[-1])          # compile + warmup
    np.asarray(out[:1])

    t0 = time.perf_counter()
    outs = [embed_batch(variables, k) for k in keys[:n_batches]]
    np.asarray(outs[-1][:1])                        # single end barrier
    dt = time.perf_counter() - t0
    return dt, n_batches * batch


def host_copy_bandwidth_gb_s(size_mb: int = 500) -> float:
    """Host memcpy bandwidth — contextualizes the host-phase timings (this
    dev rig's VM moves ~0.2-1 GB/s; production hosts are 10-50x faster, so
    host phases scale down accordingly while the TPU phase does not)."""
    x = np.ones(size_mb * 131072)  # f64
    y = np.empty_like(x)
    t0 = time.perf_counter()
    np.copyto(y, x)
    return round(2 * size_mb / 1024 / (time.perf_counter() - t0), 2)


def bench_host_phases(n_imgs: int, n_tmpl: int, n_pairs: int):
    from fedfr_tpu.evalsuite.ijbc import (
        image_to_template_features,
        pair_scores,
        tpr_at_fpr,
        identification_1n,
    )

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((n_imgs, 512), dtype=np.float32)
    templates = rng.integers(0, n_tmpl, n_imgs).astype(np.int64)
    templates[:n_tmpl] = np.arange(n_tmpl)  # every template non-empty
    medias = rng.integers(0, 3, n_imgs).astype(np.int64)

    t0 = time.perf_counter()
    tf, uniq = image_to_template_features(feats, templates, medias)
    t_agg = time.perf_counter() - t0

    p1 = rng.integers(0, n_tmpl, n_pairs).astype(np.int64)
    p2 = rng.integers(0, n_tmpl, n_pairs).astype(np.int64)
    t0 = time.perf_counter()
    scores = pair_scores(tf.astype(np.float32), uniq, p1, p2)
    t_score = time.perf_counter() - t0

    labels = rng.integers(0, 2, n_pairs)
    t0 = time.perf_counter()
    table = tpr_at_fpr(labels, scores)
    t_roc = time.perf_counter() - t0

    # 1:n open-set at protocol scale
    probe = rng.standard_normal((N_PROBE, 512), dtype=np.float32)
    gallery = rng.standard_normal((N_GALLERY, 512), dtype=np.float32)
    mask = rng.integers(0, N_GALLERY, N_PROBE)
    t0 = time.perf_counter()
    identification_1n(probe, gallery, mask)
    t_1n = time.perf_counter() - t0
    del table
    return t_agg, t_score, t_roc, t_1n


def bench_device_engine(n_imgs: int, n_tmpl: int, n_pairs: int):
    """The production TPU path: segment-sum aggregation + chunked pair
    scoring with the feature matrix resident in HBM (evalsuite/ijbc.py
    device engine).  Index arrays are uploaded once (tiny on PCIe hosts;
    the dev tunnel pays ~2 min for the 125 MB of pair indices, excluded
    from timing)."""
    import jax
    import jax.numpy as jnp

    from fedfr_tpu.evalsuite.ijbc import (
        image_to_template_features_device,
        pair_scores_device,
    )

    rng = np.random.default_rng(0)
    templates = rng.integers(0, n_tmpl, n_imgs).astype(np.int64)
    templates[:n_tmpl] = np.arange(n_tmpl)
    medias = rng.integers(0, 3, n_imgs).astype(np.int64)

    @jax.jit
    def make_feats(key):
        return jax.random.normal(key, (n_imgs, 512), jnp.float32)

    feats = make_feats(jax.random.PRNGKey(5))
    feats.block_until_ready()

    tf, uniq = image_to_template_features_device(feats, templates, medias)
    tf.block_until_ready()  # compile warmup (same shapes)
    t0 = time.perf_counter()
    tf, uniq = image_to_template_features_device(feats, templates, medias)
    tf.block_until_ready()
    t_agg = time.perf_counter() - t0

    # time the scoring dispatch with indices already resident and only a
    # 1-row result pull (the full 62 MB score download is free on PCIe
    # hosts but would swamp this rig's ~1 MB/s tunnel)
    import jax

    from fedfr_tpu.evalsuite.ijbc import _DEVICE_JITS

    chunk = 1 << 18
    _ = pair_scores_device(tf, uniq, uniq[:8].astype(np.int64),
                           uniq[:8].astype(np.int64), chunk=chunk)  # compile
    n_pad = ((n_pairs + chunk - 1) // chunk) * chunk
    i1 = jnp.asarray(rng.integers(0, n_tmpl, n_pad).astype(np.int32))
    i2 = jnp.asarray(rng.integers(0, n_tmpl, n_pad).astype(np.int32))
    i1.block_until_ready(); i2.block_until_ready()
    out = _DEVICE_JITS["score"](tf, i1, i2, chunk)   # shape warmup
    np.asarray(out[0, :1])
    t0 = time.perf_counter()
    out = _DEVICE_JITS["score"](tf, i2, i1, chunk)   # distinct inputs
    got = np.asarray(out[0, :1])
    t_score = time.perf_counter() - t0
    assert np.isfinite(got).all()
    return t_agg, t_score


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", default="sphnet")
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--flip", action=argparse.BooleanOptionalAction,
                    default=True, help="--no-flip disables the flip test")
    ap.add_argument("--quick", action="store_true",
                    help="1/8 of the image count (host phases stay full-scale)")
    ap.add_argument("--device_engine", action="store_true",
                    help="also time the device-resident aggregation/scoring")
    args = ap.parse_args()

    n_imgs = N_IMGS // 8 if args.quick else N_IMGS
    t_embed, n_done = bench_embed_phase(args.network, args.batch, n_imgs,
                                        args.flip)
    scale = N_IMGS / n_done
    t_agg, t_score, t_roc, t_1n = bench_host_phases(N_IMGS, N_TMPL, N_PAIRS)

    dev = {}
    if args.device_engine:
        d_agg, d_score = bench_device_engine(N_IMGS, N_TMPL, N_PAIRS)
        dev = {"device_aggregate_s": round(d_agg, 2),
               "device_pair_scores_s": round(d_score, 2)}

    embed_full = t_embed * scale
    total = embed_full + t_agg + t_score + t_roc + t_1n
    print(json.dumps({
        "experiment": "ijbc_scale",
        **dev,
        "network": args.network,
        "flip_test": bool(args.flip),
        "embed_imgs_per_sec": round(n_done / t_embed, 1),
        "embed_s_469k": round(embed_full, 1),
        "aggregate_s": round(t_agg, 1),
        "pair_scores_s_15.6M": round(t_score, 1),
        "roc_sweep_s": round(t_roc, 1),
        "identification_1n_s": round(t_1n, 1),
        "total_s": round(total, 1),
        "host_copy_gb_s": host_copy_bandwidth_gb_s(),
    }))


if __name__ == "__main__":
    main()
