"""Native C++ data-plane tests: build, decode parity, loader fast path."""

import os

import numpy as np
import pytest

from fedfr_tpu.data import codec, write_split
from fedfr_tpu.data.datasets import BatchLoader, FaceRecordDataset
from fedfr_tpu.native import load_library


pytestmark = pytest.mark.skipif(load_library() is None,
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def jpeg_split(tmp_path_factory):
    root = tmp_path_factory.mktemp("native_jpeg")
    rng = np.random.default_rng(0)
    payloads, labels, images = [], [], []
    for i in range(20):
        img = rng.integers(0, 255, size=(112, 112, 3), dtype=np.uint8)
        images.append(img)
        payloads.append(codec.encode_jpeg(img, quality=95))
        labels.append(i % 4)
    write_split(str(root / "train.idx"), str(root / "train.rec"),
                payloads, labels, num_classes=4, id_base=0)
    return str(root), images


def test_native_reader_jpeg_parity(jpeg_split):
    root, images = jpeg_split
    from fedfr_tpu.native import NativeReader

    r = NativeReader(os.path.join(root, "train.idx"),
                     os.path.join(root, "train.rec"), image_size=112)
    assert r.num_keys() == 21  # 20 data records + header
    keys = np.arange(1, 21)
    imgs, labels = r.read_batch(keys)
    assert imgs.shape == (20, 112, 112, 3)
    np.testing.assert_array_equal(labels, np.arange(20) % 4)
    # libjpeg vs cv2/PIL decode parity: allow small IDCT differences
    for i in (0, 7, 19):
        ref = codec.decode(codec.encode_jpeg(images[i], quality=95))
        diff = np.abs(imgs[i].astype(int) - ref.astype(int))
        assert diff.mean() < 2.0
        assert (diff <= 16).mean() > 0.995


def test_native_reader_raw(tiny_split):
    from fedfr_tpu.native import NativeReader

    r = NativeReader(os.path.join(tiny_split, "train.idx"),
                     os.path.join(tiny_split, "train.rec"), image_size=112)
    imgs, labels = r.read_batch(np.array([1, 5, 24]))
    ds = FaceRecordDataset(tiny_split, use_native=False)
    for pos, key in enumerate([0, 4, 23]):
        ref_img, ref_label = ds.read(key)
        np.testing.assert_array_equal(imgs[pos], ref_img)
        assert labels[pos] == ref_label


def test_dataset_native_fast_path(jpeg_split):
    root, _ = jpeg_split
    ds = FaceRecordDataset(root, use_native=True)
    assert ds._native is not None
    out = ds.read_batch(np.arange(5))
    assert out is not None
    imgs, labels = out
    assert imgs.shape == (5, 112, 112, 3)
    # subset view keeps the native plane
    sub = ds.subset(np.array([3, 4, 5]))
    out2 = sub.read_batch(np.arange(3))
    np.testing.assert_array_equal(out2[0][0], imgs[2])


def test_batch_loader_uses_native(jpeg_split):
    root, _ = jpeg_split
    ds = FaceRecordDataset(root, use_native=True)
    loader = BatchLoader(ds, batch_size=8, shuffle=False, drop_last=False)
    batches = list(loader.epoch())
    assert len(batches) == 3
    assert batches[0][0].shape == (8, 112, 112, 3)
    # parity with python decode path
    ds2 = FaceRecordDataset(root, use_native=False)
    loader2 = BatchLoader(ds2, batch_size=8, shuffle=False, drop_last=False)
    b2 = list(loader2.epoch())
    diff = np.abs(batches[0][0].astype(int) - b2[0][0].astype(int))
    assert diff.mean() < 2.0
    np.testing.assert_array_equal(batches[0][1], b2[0][1])
