"""Record-backed face datasets and the per-client dataset map.

TPU-first re-design of the reference's dataset layer (dataset.py:73-260):

* ``FaceRecordDataset`` — one split rec (client shard / public set / veri set)
  with an optional active index subset (used by hard-negative mining, which
  mirrors ``dataset.imgidx`` surgery at reference client.py:217).
* ``CombinedDataset`` — local + public view with public labels shifted by the
  local class count (reference dataset.py:170-187).
* ``AllClientData`` — the 40 client shards + public train/test sets
  (reference dataset.py:73-142).

Decoding happens on host threads; augmentation (random hflip) and
normalization run on device inside the jitted train step, so the host only
moves uint8 bytes (minimizes host->device bandwidth 4x vs float32).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Tuple

import numpy as np

from . import codec
from .recordio import IndexedRecordReader, SplitMeta, read_split_meta
from .synthetic import is_synth_spec as is_synth_root


class FaceRecordDataset:
    """A single indexed rec split: images keyed 1..N with integer labels."""

    def __init__(self, root_dir: str, prefix: str = "train",
                 use_native: bool = True):
        idx_path = os.path.join(root_dir, f"{prefix}.idx")
        rec_path = os.path.join(root_dir, f"{prefix}.rec")
        self.reader = IndexedRecordReader(idx_path, rec_path)
        self.meta: SplitMeta = read_split_meta(self.reader)
        # active record keys; hard-negative mining installs a subset
        self.imgidx: np.ndarray = np.arange(1, self.meta.num_images + 1)
        self._labels: Optional[np.ndarray] = None
        self._native = None
        if use_native and self.meta.num_images > 0:
            self._try_native(idx_path, rec_path)

    def _try_native(self, idx_path: str, rec_path: str) -> None:
        """Attach the C++ batch decoder (fedfr_tpu/native) when buildable."""
        try:
            from ..native import NativeReader, load_library

            if load_library() is None:
                return
            probe, _ = self.read(0)
            if probe.shape[0] != probe.shape[1] or probe.shape[2] != 3:
                return
            self._native = NativeReader(idx_path, rec_path,
                                        image_size=probe.shape[0])
        except Exception:
            self._native = None

    def read_batch(self, positions: np.ndarray):
        """Native threaded batch decode -> (N,H,W,3) u8, (N,) labels;
        None when the native plane is unavailable."""
        if self._native is None:
            return None
        try:
            keys = self.imgidx[np.asarray(positions)]
            return self._native.read_batch(keys)
        except Exception:
            self._native = None
            return None

    @property
    def num_classes(self) -> Optional[int]:
        return self.meta.num_classes

    @property
    def id_base(self) -> Optional[int]:
        return self.meta.id_base

    def __len__(self) -> int:
        return len(self.imgidx)

    def read(self, pos: int) -> Tuple[np.ndarray, int]:
        """Decode active item ``pos`` -> (HWC uint8 image, label)."""
        header, payload = self.reader.read_idx(int(self.imgidx[pos]))
        return codec.decode(payload), int(header.scalar_label)

    def read_label(self, pos: int) -> int:
        return int(self.reader.read_header(
            int(self.imgidx[pos])).scalar_label)

    def all_labels(self, full: bool = False) -> np.ndarray:
        """Labels of the active subset (or the full split with ``full=True``).

        Cached for the full split; the active-subset view indexes the
        cache.  Header-only preads: the scan touches ~36 bytes/record, not
        the JPEG payloads (a 420k-image split is multi-GB of payload).
        """
        if self._labels is None:
            n = self.meta.num_images
            labels = np.empty(n, dtype=np.int32)
            for key in range(1, n + 1):
                labels[key - 1] = int(self.reader.read_header(key).scalar_label)
            self._labels = labels
        if full:
            return self._labels
        return self._labels[self.imgidx - 1]

    def subset(self, imgidx: np.ndarray) -> "FaceRecordDataset":
        """A shallow view over the same reader with a restricted key set."""
        view = object.__new__(FaceRecordDataset)
        view.reader = self.reader
        view.meta = self.meta
        view.imgidx = np.asarray(imgidx)
        view._labels = self._labels
        view._native = self._native
        return view


class CombinedDataset:
    """Local shard followed by public shard with shifted labels.

    Mirrors MXFaceDataset_Combine (reference dataset.py:170-187): indices
    ``< len(local)`` map to the local split with labels 0..C_local-1; the rest
    map to the public split with labels shifted by ``C_local``.
    """

    def __init__(self, local: FaceRecordDataset, public: FaceRecordDataset):
        self.local = local
        self.public = public
        self.local_len = len(local)
        self.shift = int(local.num_classes or 0)
        self.num_classes = (local.num_classes or 0) + (public.num_classes or 0)
        if self.is_device_synthetic:
            assert (local.seed == public.seed
                    and local.image_size == public.image_size
                    and local.noise == public.noise
                    and local.block == public.block
                    and local.expr == public.expr
                    and local.shift_div == public.shift_div), \
                "combined synthetic splits must share one universe"

    @property
    def is_device_synthetic(self) -> bool:
        return (getattr(self.local, "is_device_synthetic", False)
                and getattr(self.public, "is_device_synthetic", False))

    def __len__(self) -> int:
        return self.local_len + len(self.public)

    def read(self, pos: int) -> Tuple[np.ndarray, int]:
        if pos < self.local_len:
            return self.local.read(pos)
        img, label = self.public.read(pos - self.local_len)
        return img, label + self.shift

    def device_batch(self, positions: np.ndarray):
        """Mixed local+public device-synthetic batch as ONE generator
        dispatch (both parts must be SyntheticFaceDataset of one universe).
        Present only when both parts are synthetic — BatchLoader probes via
        getattr."""
        from .synthetic import synth_device_batch

        positions = np.asarray(positions)
        is_local = positions < self.local_len
        n = len(positions)
        bw = np.empty(n, np.float32)
        labels = np.empty(n, np.int32)
        vec_rows = [np.empty(n, np.int32) for _ in range(4)]
        for sel, ds, off, shift in ((is_local, self.local, 0, 0),
                                    (~is_local, self.public, self.local_len,
                                     self.shift)):
            if not sel.any():
                continue
            k, g, bg, w, dseed, lb = ds.synth_vectors(positions[sel] - off)
            vec_rows[0][sel] = k
            vec_rows[1][sel] = g
            vec_rows[2][sel] = bg
            vec_rows[3][sel] = dseed
            bw[sel] = w
            labels[sel] = lb + shift
        imgs = synth_device_batch(
            self.local, (vec_rows[0], vec_rows[1], vec_rows[2], bw,
                         vec_rows[3]))
        return imgs, labels

    def read_batch(self, positions: np.ndarray):
        # either part may lack native batch decode (e.g. a synthetic split
        # mixed with a rec split): fall back to the caller's per-item read
        # path instead of raising
        rb_l = getattr(self.local, "read_batch", None)
        rb_p = getattr(self.public, "read_batch", None)
        if rb_l is None or rb_p is None:
            return None
        positions = np.asarray(positions)
        is_local = positions < self.local_len
        out_l = rb_l(positions[is_local]) if is_local.any() else ((), ())
        out_p = (rb_p(positions[~is_local] - self.local_len)
                 if (~is_local).any() else ((), ()))
        if (is_local.any() and out_l is None) or ((~is_local).any() and out_p is None):
            return None
        n = len(positions)
        imgs = labels = None
        for part, sel, shift in ((out_l, is_local, 0), (out_p, ~is_local, self.shift)):
            if not sel.any():
                continue
            pi, pl = part
            if imgs is None:
                imgs = np.empty((n,) + pi.shape[1:], dtype=np.uint8)
                labels = np.empty(n, dtype=np.int32)
            imgs[sel] = pi
            labels[sel] = pl + shift
        return imgs, labels


class BatchLoader:
    """Seeded, epoch-based batch iterator with threaded host decode.

    Produces fixed-shape ``(B, H, W, C) uint8`` image batches and ``(B,) int32``
    labels (NHWC — the TPU-preferred convolution layout).  With
    ``drop_last=False`` the final partial batch is padded by repeating its
    first item and a validity mask is returned.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 100,
        drop_last: bool = False,
        num_workers: int = 6,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.num_workers = max(1, num_workers)
        self._pool: Optional[ThreadPoolExecutor] = None

    @property
    def pool(self) -> ThreadPoolExecutor:
        """Decode thread pool, created on first use (device-synthetic and
        native-decode epochs never spawn one)."""
        if self._pool is None:
            self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
        return self._pool

    def close(self) -> None:
        """Shut the decode pool down deterministically (instead of leaving
        worker threads to GC — a 40-client x 20-round run would otherwise
        accumulate hundreds of abandoned pools)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __enter__(self) -> "BatchLoader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def epoch(self, with_positions: bool = False):
        """Yield (images u8 NHWC, labels i32, valid bool) for one epoch.

        Device-synthetic datasets yield device-resident image arrays (the
        host never touches pixels); record-backed datasets yield host numpy
        via the native batch decoder or the thread pool.

        ``with_positions`` appends the batch's dataset positions (int32,
        pad slots repeat the first position like the images do) — consumed
        by the cached-contrastive step's feature gathers.
        """
        n = len(self.dataset)
        order = self.rng.permutation(n) if self.shuffle else np.arange(n)
        bs = self.batch_size
        nb = len(self)
        read = self.dataset.read
        read_batch = getattr(self.dataset, "read_batch", None)
        synthetic = getattr(self.dataset, "is_device_synthetic", False)
        for b in range(nb):
            idx = order[b * bs: (b + 1) * bs]
            valid = np.ones(bs, dtype=bool)
            if len(idx) < bs:
                valid[len(idx):] = False
                idx = np.concatenate([idx, np.full(bs - len(idx), idx[0])])
            pos = (idx.astype(np.int32),) if with_positions else ()
            if synthetic:
                imgs, labels = self.dataset.device_batch(idx)
                yield (imgs, labels, valid) + pos
                continue
            batch = read_batch(idx) if read_batch is not None else None
            if batch is not None:
                imgs, labels = batch
                yield (imgs, labels.astype(np.int32), valid) + pos
                continue
            items = list(self.pool.map(read, idx))
            imgs = np.stack([it[0] for it in items])
            labels = np.array([it[1] for it in items], dtype=np.int32)
            yield (imgs, labels, valid) + pos


class AllClientData:
    """All client shards + public train/test splits (reference dataset.py:73-142).

    ``cfg.data.rec_root`` of the form ``synth:key=value,...`` builds a
    device-synthetic universe at the requested scale instead of reading rec
    files (see data/synthetic.py) — used to drive the full workload at
    reference multiplicities on hosts without the dataset mounted.
    """

    def __init__(self, cfg, include_public: bool = True):
        self.cfg = cfg
        self.client_datasets: List[FaceRecordDataset] = []
        self.synthetic_universe = None
        if is_synth_root(cfg.data.rec_root):
            from .synthetic import (build_fl_synthetic, explicit_synth_keys,
                                    parse_synth_spec)

            spec = parse_synth_spec(cfg.data.rec_root)
            explicit = explicit_synth_keys(cfg.data.rec_root)
            # CLI flags fill in spec keys the string leaves defaulted; a
            # spec-explicit key that CONTRADICTS its flag is an error (a
            # silent override would rebuild a different universe than an
            # earlier CLI given the same spec string — fc.pth/universe
            # alignment depends on these)
            overrides = {"clients": cfg.data.num_clients,
                         "image_size": cfg.data.image_size,
                         "seed": cfg.runtime.seed}
            if cfg.data.num_ids:
                overrides["ids_per_client"] = max(
                    1, cfg.data.num_ids // cfg.data.num_clients)
            for k, v in overrides.items():
                if k in explicit and spec[k] != v:
                    raise ValueError(
                        f"synth spec sets {k}={spec[k]} but the CLI config "
                        f"implies {k}={v}; drop one of the two")
                spec[k] = v
            self.synthetic_universe = build_fl_synthetic(spec)
            self.client_datasets = self.synthetic_universe["clients"]
            self.public_dataset = (self.synthetic_universe["public"]
                                   if include_public else None)
        else:
            for c in range(cfg.data.num_clients):
                d = FaceRecordDataset(
                    os.path.join(cfg.data.split_dir, "client_%04d" % c))
                self.client_datasets.append(d)
            self.public_dataset = None
            if include_public:
                self.public_dataset = FaceRecordDataset(cfg.data.public_dir)
        self.train_dataset_sizes = [len(d) for d in self.client_datasets]
        self.train_class_sizes = [int(d.num_classes or 0) for d in self.client_datasets]

    def client(self, cid: int) -> FaceRecordDataset:
        return self.client_datasets[cid]

    def veri_dataset(self, veri_dir: str):
        """The local-verification split: the synthetic universe's veri set
        under a synth root, else the rec split at ``veri_dir``."""
        if self.synthetic_universe is not None:
            return self.synthetic_universe["veri"]
        return FaceRecordDataset(veri_dir, prefix="test")
