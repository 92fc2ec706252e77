"""Partial-FC pretraining CLI test on the 8-device virtual mesh."""

import argparse
import os

import numpy as np
import pytest

from fedfr_tpu.data import codec, write_split


@pytest.fixture(scope="module")
def public_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pretrain_data")
    rng = np.random.default_rng(0)
    payloads, labels = [], []
    for pid in range(8):
        base = rng.integers(0, 200, size=(24, 24, 3))
        for _ in range(8):
            img = np.clip(base + rng.integers(-20, 20, (24, 24, 3)), 0, 255)
            payloads.append(codec.encode_raw(img.astype(np.uint8)))
            labels.append(pid)
    write_split(str(root / "train.idx"), str(root / "train.rec"),
                payloads, labels, num_classes=8)
    return str(root)


def _args(public_root, outdir, sample_rate=1.0):
    return argparse.Namespace(
        data_dir=public_root, output_dir=str(outdir), network="toy",
        loss="CosFace", embedding_size=16, image_size=24, batch_size=16,
        num_epoch=2, lr=0.05, lr_steps="1", scale=30.0, margin=0.4,
        momentum=0.9, weight_decay=5e-4, sample_rate=sample_rate,
        num_workers=2, log_every=2, seed=100, fp32=True, scan_blocks=False,
        resume=False)


def test_pretrain_full_softmax(public_root, tmp_path):
    import pretrain as cli

    out = tmp_path / "pre1"
    out.mkdir()
    cli.main(_args(public_root, out))
    # toy backbone has no torch export -> native npz + torch fc/labels
    assert os.path.exists(out / "backbone.npz")
    assert os.path.exists(out / "fc.pth")
    assert os.path.exists(out / "preCos_pretrain_labels.pth")
    from fedfr_tpu.utils import torch_interop

    fc = torch_interop.load_pth(str(out / "fc.pth"))
    assert tuple(fc.shape) == (8, 16)
    labels = torch_interop.load_pth(str(out / "preCos_pretrain_labels.pth"))
    assert labels.shape[0] == 64


def test_pretrain_sampled_negatives(public_root, tmp_path):
    import pretrain as cli

    out = tmp_path / "pre2"
    out.mkdir()
    cli.main(_args(public_root, out, sample_rate=0.5))
    assert os.path.exists(out / "fc.pth")


def test_pretrain_resume(public_root, tmp_path):
    """--resume restores FC weight + BOTH momentum buffers and continues
    from the next epoch (PartialFC partial_fc.py:41-54 parity)."""
    import pretrain as cli

    from fedfr_tpu.utils.checkpoint import load_native

    out = tmp_path / "pre_resume"
    out.mkdir()
    cli.main(_args(public_root, out))
    st = load_native(str(out / "pretrain_state.npz"))
    assert int(np.asarray(st["epoch"])) == 1
    w_before = np.asarray(st["weight"]).copy()
    assert "wopt_momentum" in st and "opt_momentum" in st  # momentum persisted

    args = _args(public_root, out)
    args.resume = True
    args.num_epoch = 3  # continue exactly one more epoch
    cli.main(args)
    log = open(out / "pretrain.log").read()
    assert "resumed pretraining at epoch 2" in log
    st2 = load_native(str(out / "pretrain_state.npz"))
    assert int(np.asarray(st2["epoch"])) == 2
    assert not np.allclose(np.asarray(st2["weight"]), w_before)
