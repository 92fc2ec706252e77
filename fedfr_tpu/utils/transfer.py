"""Device->host transfer helpers.

``chunked_device_get`` fetches a pytree of device arrays to host numpy in
bounded-size slices.  Two reasons to bound transfer granularity:

* some transports degrade on very large single transfers (the dev rig's
  tunneled PJRT relay collapses ~50x for single buffers over ~8 MB while
  sustaining full rate on <=4 MB slices — measured);
* peak host memory during the fetch stays at one chunk per leaf instead of
  a second full copy of the largest leaf.

On healthy PCIe hosts the extra per-slice dispatches are noise (a 100 MB
leaf becomes 25 async device slices).  The reference has no analog: torch
``.cpu()`` moves whole tensors (SURVEY.md §2 #15 checkpoint paths).
"""

from __future__ import annotations

from typing import Any

import numpy as np

DEFAULT_CHUNK_BYTES = 4 * 1024 * 1024


def chunked_device_get(tree: Any, chunk_bytes: int = DEFAULT_CHUNK_BYTES) -> Any:
    """Fetch a pytree of (device or host) arrays to host numpy.

    Leaves smaller than ``chunk_bytes`` transfer whole; larger leaves are
    sliced on device along a flattened view and reassembled on host.  Host
    leaves (numpy scalars/arrays) pass through unchanged.
    """
    import jax

    def fetch(leaf):
        if not isinstance(leaf, jax.Array):
            return np.asarray(leaf)
        nbytes = leaf.size * leaf.dtype.itemsize
        if nbytes <= chunk_bytes:
            return np.asarray(leaf)
        flat = leaf.reshape(-1)
        step = max(1, chunk_bytes // leaf.dtype.itemsize)
        out = np.empty(leaf.size, dtype=leaf.dtype)
        # dispatch every slice first (async), then gather: the device walks
        # the buffer once while the host drains completed slices in order
        slices = [flat[i: i + step] for i in range(0, leaf.size, step)]
        pos = 0
        for s in slices:
            a = np.asarray(s)
            out[pos: pos + a.size] = a
            pos += a.size
        return out.reshape(leaf.shape)

    return jax.tree_util.tree_map(fetch, tree)
