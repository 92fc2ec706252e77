"""Host->device input pipeline: background decode + double-buffered transfer.

TPU-native replacement for the reference's DataLoaderX background-thread
prefetcher (dataset.py:16-71, which staged batches on a side CUDA stream):
a producer thread runs the BatchLoader epoch (threaded JPEG decode) and
eagerly ``jax.device_put``s batches, keeping ``depth`` batches in flight so
the device never waits on host decode.  uint8 on the wire; normalization and
augmentation happen inside the jitted train step.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Tuple

import jax
import jax.numpy as jnp


def prefetched(iterable, depth: int = 2):
    """Pull items from ``iterable`` in a background thread with ``depth``
    lookahead.

    Safe against an abandoned consumer (exception in the consuming loop
    body, GeneratorExit): a stop event + bounded puts keep the producer from
    blocking forever on a full queue, and the sentinel delivery is
    guaranteed (a dropped sentinel would hang the consumer at q.get).
    Shared by DevicePrefetcher and the server's client-parallel batch
    producer.
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    sentinel = object()
    error: list = []
    stop = threading.Event()

    def produce():
        try:
            for item in iterable:
                if stop.is_set():
                    return
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except Exception as e:  # pragma: no cover - propagated below
            error.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.2)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
    finally:  # also runs on GeneratorExit (abandoned iteration)
        stop.set()
        while True:  # drain so the producer's bounded put unblocks
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join()
    if error:
        raise error[0]


class DevicePrefetcher:
    """Iterate (device_images, device_labels, device_valid) with lookahead."""

    def __init__(self, loader, depth: int = 2, device=None):
        self.loader = loader
        self.depth = max(1, depth)
        self.device = device

    def __len__(self) -> int:
        return len(self.loader)

    def epoch(self, **epoch_kwargs
              ) -> Iterator[Tuple[jnp.ndarray, ...]]:
        def to_device():
            for parts in self.loader.epoch(**epoch_kwargs):
                batch = tuple(jnp.asarray(p) for p in parts)
                if self.device is not None:
                    batch = jax.device_put(batch, self.device)
                yield batch

        yield from prefetched(to_device(), self.depth)
