"""ctypes bindings for the native data plane (librecio.so).

Builds the shared library on first use (g++ -O3, libjpeg) and caches it next
to the source.  Falls back cleanly when a toolchain or libjpeg is missing —
callers must treat ``load_library() is None`` as "use the Python path".
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger("fedfr_tpu.native")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "recio.cpp")
_SO = os.path.join(_HERE, "librecio.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def build_library() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    # portable codegen by default; FEDFR_NATIVE_ARCH=native (or any -march
    # value) opts in to host-specific tuning for dedicated deployments
    arch = os.environ.get("FEDFR_NATIVE_ARCH", "")
    # compile to a per-pid temp path and rename into place: concurrent
    # processes racing the build must never dlopen a half-written .so or
    # rewrite pages of a library another process has mapped (rename is
    # atomic; the old inode stays valid for processes holding it)
    tmp_so = f"{_SO}.{os.getpid()}.tmp"
    cmd = (["g++", "-O3"] + ([f"-march={arch}"] if arch else [])
           + ["-std=c++17", "-shared", "-fPIC",
              _SRC, "-o", tmp_so, "-ljpeg", "-lpthread"])
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        os.replace(tmp_so, _SO)
        return _SO
    except Exception as e:  # pragma: no cover - toolchain-dependent
        logger.warning("native loader build failed: %s", e)
        try:
            os.unlink(tmp_so)
        except OSError:
            pass
        return None


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = build_library()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.recio_open.restype = ctypes.c_void_p
        lib.recio_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.recio_close.argtypes = [ctypes.c_void_p]
        lib.recio_num_keys.restype = ctypes.c_long
        lib.recio_num_keys.argtypes = [ctypes.c_void_p]
        lib.recio_read_labels.restype = ctypes.c_int
        lib.recio_read_labels.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_long), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int)]
        lib.recio_batch_decode.restype = ctypes.c_int
        lib.recio_batch_decode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_long), ctypes.c_long,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        _lib = lib
        return _lib


class NativeReader:
    """Batch-decoding reader over one rec/idx pair."""

    def __init__(self, idx_path: str, rec_path: str, image_size: int = 112,
                 threads: int = 8):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self.lib = lib
        self.handle = lib.recio_open(idx_path.encode(), rec_path.encode())
        if not self.handle:
            raise IOError(f"recio_open failed for {rec_path}")
        self.image_size = image_size
        self.threads = threads

    def __del__(self):  # pragma: no cover - GC path
        try:
            if getattr(self, "handle", None):
                self.lib.recio_close(self.handle)
                self.handle = None
        except Exception:
            pass

    def num_keys(self) -> int:
        return int(self.lib.recio_num_keys(self.handle))

    def read_labels(self, keys: np.ndarray) -> np.ndarray:
        keys = np.ascontiguousarray(keys, dtype=np.int64)
        out = np.empty(len(keys), dtype=np.int32)
        rc = self.lib.recio_read_labels(
            self.handle, keys.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            len(keys), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        if rc != 0:
            raise IOError(f"recio_read_labels rc={rc}")
        return out

    def read_batch(self, keys: np.ndarray):
        """keys (N,) record ids -> ((N,H,W,3) uint8, (N,) int32 labels)."""
        keys = np.ascontiguousarray(keys, dtype=np.int64)
        n = len(keys)
        hw = self.image_size
        imgs = np.empty((n, hw, hw, 3), dtype=np.uint8)
        labels = np.empty(n, dtype=np.int32)
        rc = self.lib.recio_batch_decode(
            self.handle, keys.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), n,
            imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), hw, hw,
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), self.threads)
        if rc != 0:
            raise IOError(f"recio_batch_decode rc={rc}")
        return imgs, labels
