"""Device-mesh construction for the federated + model-parallel axes.

One logical mesh with axes ``(client, data, model)``:

* ``client`` — federated simulation axis: K clients train concurrently on
  mesh sub-slices; FedAvg is a weighted mean over this axis (replaces the
  reference's sequential in-process loop, server.py:283-316).
* ``data``   — data parallelism within a client (replaces nn.DataParallel).
* ``model``  — class sharding for the partial FC softmax (replaces the
  torch.distributed collectives of partial_fc.py).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("client", "data", "model")


def group_by_slice(devices: Sequence, slice_of=None) -> list:
    """Group devices by TPU slice (the DCN granule), sorted by slice id.

    On a multi-slice deployment each ``jax.Device`` carries a
    ``slice_index``; everywhere else (single slice, CPU, tests) all devices
    fall into one group.  ``slice_of`` overrides the grouping key (tests use
    it to simulate slices on virtual CPU devices).
    """
    key = slice_of if slice_of is not None else (
        lambda d: getattr(d, "slice_index", 0) or 0)
    groups: dict = {}
    for d in devices:
        groups.setdefault(key(d), []).append(d)
    return [groups[k] for k in sorted(groups)]


def make_mesh(shape: Optional[Tuple[int, int, int]] = None,
              devices: Optional[Sequence] = None,
              slice_of=None) -> Mesh:
    """Build a (client, data, model) mesh over the available devices.

    Default layout puts every device on the ``client`` axis — the federated
    simulation is embarrassingly parallel and ICI is only needed at
    aggregation time.

    Multi-slice (DCN) deployments: devices are ordered slice-major, so the
    ``client`` axis decomposes hierarchically — contiguous client groups live
    on one slice's ICI and only the outer reduction crosses DCN.  FedAvg's
    one-reduction-per-round pattern is exactly the DCN-friendly shape: XLA
    lowers the weighted mean over the axis to an intra-slice reduce followed
    by a cross-slice reduce of the partial sums (SURVEY.md §5 reserves DCN
    for this).  Single-slice and CPU meshes are unchanged by the ordering.
    """
    devices = list(devices if devices is not None else jax.devices())
    groups = group_by_slice(devices, slice_of)
    if len(groups) > 1:
        sizes = {len(g) for g in groups}
        if len(sizes) != 1:
            raise ValueError(
                f"uneven devices per slice: {[len(g) for g in groups]}; "
                "the client axis needs a rectangular slice x chip layout")
        devices = [d for g in groups for d in g]
    n = len(devices)
    if shape is None:
        shape = (n, 1, 1)
    if math.prod(shape) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, AXES)


def model_mesh(num_shards: Optional[int] = None) -> Mesh:
    """A mesh with every device on the ``model`` axis (partial-FC layout)."""
    devices = jax.devices()
    if num_shards is not None:
        devices = devices[:num_shards]
    n = len(devices)
    return Mesh(np.asarray(devices).reshape(1, 1, n), AXES)


def data_mesh(num_devices: Optional[int] = None) -> Mesh:
    """A mesh with every device on the ``data`` axis (evaluation layout:
    replicated weights, batch/row sharding — replaces nn.DataParallel and
    the per-GPU ROC fan-out of roc_cuda.py:89-108)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    return Mesh(np.asarray(devices).reshape(1, n, 1), AXES)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_over(mesh: Mesh, axis: str) -> NamedSharding:
    return NamedSharding(mesh, P(axis))
