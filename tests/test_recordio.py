"""RecordIO codec tests, including byte-compatibility with mxnet's format."""

import struct

import numpy as np
import pytest

from fedfr_tpu.data import (
    IRHeader,
    IndexedRecordReader,
    IndexedRecordWriter,
    codec,
    pack,
    read_split_meta,
    unpack,
    write_split,
)
from fedfr_tpu.data.datasets import BatchLoader, CombinedDataset, FaceRecordDataset


def test_pack_unpack_scalar_label():
    hdr = IRHeader(0, 7.0, 42, 0)
    body = pack(hdr, b"payload")
    out_hdr, out = unpack(body)
    assert out == b"payload"
    assert out_hdr.flag == 0
    assert out_hdr.scalar_label == 7.0
    assert out_hdr.id == 42


def test_pack_unpack_array_label():
    hdr = IRHeader(2, np.array([25.0, 3.0, 100.0]), 0, 0)
    body = pack(hdr, b"")
    out_hdr, out = unpack(body)
    assert out_hdr.flag == 3  # pack sets flag = len(label)
    np.testing.assert_array_equal(np.asarray(out_hdr.label), [25.0, 3.0, 100.0])
    assert out == b""


def test_wire_format_framing(tmp_path):
    """Record framing: magic, length, 4-byte padding; idx offsets in bytes."""
    idx, rec = str(tmp_path / "a.idx"), str(tmp_path / "a.rec")
    with IndexedRecordWriter(idx, rec) as w:
        w.write_idx(1, b"abcde")  # 5 bytes -> 3 pad bytes
        w.write_idx(2, b"xyzw")   # 4 bytes -> 0 pad
    raw = open(rec, "rb").read()
    magic, lrec = struct.unpack("<II", raw[:8])
    assert magic == 0xCED7230A
    assert lrec & ((1 << 29) - 1) == 5
    assert len(raw) == (8 + 8) + (8 + 4)  # framed sizes
    lines = open(idx).read().splitlines()
    assert lines == ["1\t0", "2\t16"]
    r = IndexedRecordReader(idx, rec)
    assert r.read_record(1) == b"abcde"
    assert r.read_record(2) == b"xyzw"


def test_header_only_read_matches_full(tmp_path):
    """read_header preads only the frame+IRHeader bytes yet returns the
    same header as a full-record read (label scans use it)."""
    idx, rec = str(tmp_path / "h.idx"), str(tmp_path / "h.rec")
    with IndexedRecordWriter(idx, rec) as w:
        w.write_idx(1, pack(IRHeader(0, 9.0, 1, 0), b"x" * 1000))
        w.write_idx(2, pack(IRHeader(2, np.array([5.0, 3.0]), 2, 0), b"y"))
    r = IndexedRecordReader(idx, rec)
    h1 = r.read_header(1)
    assert (h1.flag, h1.scalar_label, h1.id) == (0, 9.0, 1)
    h2 = r.read_header(2)
    np.testing.assert_array_equal(np.asarray(h2.label), [5.0, 3.0])
    assert r.read_idx(1)[0].scalar_label == h1.scalar_label


def test_oversize_and_continuation_records_rejected(tmp_path):
    """The 29-bit frame limit and mxnet continuation flags fail loudly
    instead of silently corrupting (regression: length was masked)."""
    # cheap oversize probe without allocating 512 MB: fake the length
    import fedfr_tpu.data.recordio as rio

    class _B(bytes):
        def __len__(self):
            return rio._LEN_MASK + 1

    with pytest.raises(ValueError, match="29-bit"):
        rio._frame(_B())

    idx, rec = str(tmp_path / "c.idx"), str(tmp_path / "c.rec")
    with IndexedRecordWriter(idx, rec) as w:
        w.write_idx(1, b"abcd")
    # flip a continuation flag into the stored length word
    raw = bytearray(open(rec, "rb").read())
    magic, lrec = struct.unpack("<II", raw[:8])
    struct.pack_into("<II", raw, 0, magic, lrec | (1 << 29))
    open(rec, "wb").write(bytes(raw))
    r = IndexedRecordReader(idx, rec)
    with pytest.raises(IOError, match="continuation"):
        r.read_record(1)


def test_split_roundtrip(tiny_split):
    ds = FaceRecordDataset(tiny_split)
    assert len(ds) == 24
    assert ds.num_classes == 3
    assert ds.id_base == 200
    img, label = ds.read(0)
    assert img.shape == (112, 112, 3) and img.dtype == np.uint8
    assert label == 0
    labels = ds.all_labels()
    np.testing.assert_array_equal(labels, np.arange(24) % 3)


def test_split_meta_matches_reference_layout(tiny_split):
    """Header record 0 stores [num_imgs+1, num_classes, id_base] as float32."""
    import os

    r = IndexedRecordReader(os.path.join(tiny_split, "train.idx"),
                            os.path.join(tiny_split, "train.rec"))
    hdr, _ = r.read_idx(0)
    np.testing.assert_array_equal(np.asarray(hdr.label), [25.0, 3.0, 200.0])
    meta = read_split_meta(r)
    assert (meta.num_images, meta.num_classes, meta.id_base) == (24, 3, 200)


@pytest.mark.skipif(not codec._HAS_CV2, reason="cv2 unavailable")
def test_jpeg_roundtrip():
    img = np.full((112, 112, 3), 128, dtype=np.uint8)
    payload = codec.encode_jpeg(img)
    out = codec.decode(payload)
    assert out.shape == (112, 112, 3)
    assert np.abs(out.astype(int) - 128).max() <= 3


def test_subset_view(tiny_split):
    ds = FaceRecordDataset(tiny_split)
    sub = ds.subset(np.array([1, 5, 9]))
    assert len(sub) == 3
    _, label = sub.read(1)
    assert label == ds.read(4)[1]
    np.testing.assert_array_equal(sub.all_labels(), ds.all_labels()[[0, 4, 8]])


def test_combined_dataset_label_shift(tiny_split, tmp_path):
    local = FaceRecordDataset(tiny_split)
    pub_root = tmp_path / "pub"
    pub_root.mkdir()
    rng = np.random.default_rng(1)
    payloads = [codec.encode_raw(rng.integers(0, 255, (112, 112, 3), dtype=np.uint8))
                for _ in range(10)]
    write_split(str(pub_root / "train.idx"), str(pub_root / "train.rec"),
                payloads, [i % 5 for i in range(10)], num_classes=5)
    public = FaceRecordDataset(str(pub_root))
    comb = CombinedDataset(local, public)
    assert len(comb) == 34
    assert comb.num_classes == 8
    # public labels shifted by local num_classes=3 (reference dataset.py:179-185)
    _, lab = comb.read(24)
    assert lab == 0 + 3


def test_batch_loader_shapes_and_padding(tiny_split):
    ds = FaceRecordDataset(tiny_split)
    loader = BatchLoader(ds, batch_size=10, shuffle=True, seed=3, drop_last=False)
    batches = list(loader.epoch())
    assert len(batches) == 3
    imgs, labels, valid = batches[-1]
    assert imgs.shape == (10, 112, 112, 3)
    assert labels.shape == (10,)
    assert valid.sum() == 4  # 24 = 10+10+4
    # drop_last drops the partial batch
    loader2 = BatchLoader(ds, batch_size=10, drop_last=True)
    assert len(list(loader2.epoch())) == 2
    # determinism: same seed -> same order
    a = [b[1] for b in BatchLoader(ds, 8, seed=7).epoch()]
    b = [b[1] for b in BatchLoader(ds, 8, seed=7).epoch()]
    np.testing.assert_array_equal(np.concatenate(a), np.concatenate(b))


def test_prefetched_normal_and_error_paths():
    """The shared background-prefetch generator (data/pipeline.py) delivers
    every item in order, propagates producer exceptions, and terminates its
    thread when the consumer abandons iteration mid-stream."""
    import threading

    from fedfr_tpu.data.pipeline import prefetched

    # normal completion: all items, in order
    assert list(prefetched(iter(range(20)), depth=2)) == list(range(20))

    # producer exception propagates to the consumer
    def boom():
        yield 1
        raise RuntimeError("producer failed")

    import pytest

    with pytest.raises(RuntimeError, match="producer failed"):
        list(prefetched(boom(), depth=1))

    # abandoned consumer: the producer thread must terminate (no leak of a
    # thread blocked on a full queue)
    n_before = threading.active_count()
    gen = prefetched(iter(range(1000)), depth=1)
    assert next(gen) == 0
    gen.close()  # GeneratorExit -> stop event -> drain -> join
    assert threading.active_count() == n_before
