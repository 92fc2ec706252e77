"""All-pairs cosine ROC histogram — the TPU replacement for roc_cuda.py.

The reference's only native kernel (roc_cuda.py:14-28) computes, for a target
client's images i (reordered first) against the full 160k-image local
verification set j, the cosine similarity of every pair (i < j), bins it into
2001 buckets ``int((cos+1)*1000)``, and atomically accumulates separate
positive / negative histograms by label match.  The TPR@FPR table then falls
out of the cumulative histogram (roc_cuda.py:56-87).

TPU design: tiled matmuls on the MXU produce similarity blocks; binning is a
masked fused bincount per block (O(pairs) work — no 2001-way comparisons, no
atomics: each block accumulates into its own histogram and XLA sums them).
Everything is jit-compiled with static tile shapes; multi-device execution
shards the i-tiles over the mesh.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NUM_BINS = 2001  # int((cos+1)*1000) for cos in [-1, 1]


def _count_sort(combined, bins: int):
    """Sort + searchsorted bincount (2.1x faster than scatter on TPU)."""
    sorted_c = jnp.sort(combined.reshape(-1))
    edges = jnp.arange(2 * bins + 1)
    pos = jnp.searchsorted(sorted_c, edges)
    return jnp.diff(pos).astype(jnp.int32)


def _count_matmul(combined, bins: int):
    """MXU bincount: decompose each index into (coarse, fine) radix digits,
    one-hot both, and count every bucket with ONE matmul C = A^T B —
    C[c, f] = #pairs with index c*FINE+f.  The 0/1 operands are bf16 (exact)
    and the MXU accumulates in f32 (exact for counts < 2^24 per chunk).

    Kept as a documented NEGATIVE result for the XLA path: measured 0.85x
    of the sort-based counting at the production workload because the
    one-hot operands round-trip HBM.  The same algorithm wins 2.4x when the
    one-hots live in a kernel's VMEM — see
    ops/pallas_kernels.py::roc_histogram, the production TPU path.
    """
    total = 2 * bins + 1  # +1 dead bucket for invalid pairs
    fine = 128
    coarse = (total + fine - 1) // fine  # 32 for the 2001-bin protocol
    flat = combined.reshape(-1)

    def chunk_counts(c):
        hi = (c // fine)[:, None] == jnp.arange(coarse, dtype=jnp.int32)[None, :]
        lo = (c % fine)[:, None] == jnp.arange(fine, dtype=jnp.int32)[None, :]
        return jax.lax.dot_general(
            hi.astype(jnp.bfloat16), lo.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    # f32 accumulation is integer-exact only below 2^24 per bucket: bound
    # each matmul to 2^22 pairs and sum the per-chunk counts in int32
    CH = 1 << 22
    n = flat.shape[0]
    counts = jnp.zeros((coarse, fine), jnp.int32)
    for s in range(0, n, CH):
        counts = counts + chunk_counts(
            jax.lax.dynamic_slice(flat, (s,), (min(CH, n - s),))
        ).astype(jnp.int32)
    return counts.reshape(-1)[: 2 * bins]


def _tiled_histogram_scan(fi_all, li_all, gi_all, fj_all, lj_all, gj_all,
                          target_size, n_real, *, tile_i: int, tile_j: int,
                          num_i: int, bins: int = NUM_BINS,
                          binning: str = "sort"):
    """fori_loop over (i, j) tiles; one masked bincount per MXU tile.

    Pair validity mirrors the CUDA kernel guard (roc_cuda.py:17): ``gi < gj``
    and ``gi < target_size``; ``gj < n_real`` kills padded rows.  Shared by
    the single-device and shard_map paths.
    """
    e = fi_all.shape[1]
    num_j = fj_all.shape[0] // tile_j
    count = _count_matmul if binning == "matmul" else _count_sort

    def body(k, hist):
        i0 = (k // num_j) * tile_i
        j0 = (k % num_j) * tile_j
        fj = jax.lax.dynamic_slice(fj_all, (j0, 0), (tile_j, e))
        lj = jax.lax.dynamic_slice(lj_all, (j0,), (tile_j,))
        gj = jax.lax.dynamic_slice(gj_all, (j0,), (tile_j,))
        fi = jax.lax.dynamic_slice(fi_all, (i0, 0), (tile_i, e))
        li = jax.lax.dynamic_slice(li_all, (i0,), (tile_i,))
        gi = jax.lax.dynamic_slice(gi_all, (i0,), (tile_i,))
        sim = jnp.dot(fi, fj.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        idx = jnp.clip(((sim + 1.0) * 1000.0).astype(jnp.int32), 0, bins - 1)
        is_pos = li[:, None] == lj[None, :]
        valid = ((gi[:, None] < gj[None, :]) & (gi[:, None] < target_size)
                 & (gj[None, :] < n_real))
        # invalid pairs land in the dead bucket 2*bins past the last bin
        combined = jnp.where(valid, idx * 2 + jnp.where(is_pos, 0, 1), 2 * bins)
        return hist + count(combined, bins)

    return jax.lax.fori_loop(0, num_i * num_j, body,
                             jnp.zeros(2 * bins, jnp.int32))


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "num_i", "bins"))
def _device_histogram(feats, labels, gidx, target_size, n_real, *, tile_i: int,
                      tile_j: int, num_i: int, bins: int = NUM_BINS):
    """Single-dispatch full histogram over device-resident feats."""
    return _tiled_histogram_scan(feats, labels, gidx, feats, labels, gidx,
                                 target_size, n_real, tile_i=tile_i,
                                 tile_j=tile_j, num_i=num_i, bins=bins)


def pairwise_roc_histogram_device(feats, labels, target_size: int,
                                  tile_i: int = 4096, tile_j: int = 16384
                                  ) -> jnp.ndarray:
    """Device-resident histogram over already-ordered (target-first) feats.

    ``feats``/``labels`` may be jnp or np; they are padded to tile multiples.
    """
    n, e = np.shape(feats)
    tile_i = min(tile_i, n)
    tile_j = min(tile_j, max(n, 1))
    num_i = (min(target_size, n) + tile_i - 1) // tile_i  # i covers targets only
    # pad to a tile_j multiple that also covers the i-tile span — NOT
    # lcm(tile_i, tile_j), which blew up 64-256x for mid-size inputs
    # (e.g. n=5000, tile_j=5000, tile_i=1024 -> lcm 640000 rows / 1.3 GB)
    need = max(n, num_i * tile_i)
    npad = ((need + tile_j - 1) // tile_j) * tile_j
    gidx = jnp.arange(npad, dtype=jnp.int32)

    f = jnp.asarray(feats)
    l = jnp.asarray(labels).astype(jnp.int32)
    if npad > n:
        f = jnp.concatenate([f, jnp.zeros((npad - n, e), f.dtype)])
        l = jnp.concatenate([l, jnp.full(npad - n, -12345, jnp.int32)])
    hist = _device_histogram(f, l, gidx, jnp.int32(target_size), jnp.int32(n),
                             tile_i=tile_i, tile_j=tile_j, num_i=num_i)
    return hist


def pairwise_roc_histogram_sharded(mesh, feats, labels, target_size: int,
                                   tile_i: int = 4096, tile_j: int = 16384,
                                   axis: str = "data", use_pallas=None,
                                   interpret: bool = False) -> jnp.ndarray:
    """Multi-device histogram: j-rows sharded over a mesh axis, partial
    histograms psum'd over ICI.

    Replaces the reference's multiprocess per-GPU fan-out (roc_cuda.py:89-108)
    with one sharded dispatch: every device scans the (replicated) target
    block against its own slice of the verification set.  On TPU meshes each
    shard runs the fused Pallas kernel (pallas_kernels.roc_histogram_pair);
    elsewhere the XLA sort-based scan.
    """
    n, e = np.shape(feats)
    nd = mesh.shape[axis]
    if use_pallas is None:
        from .pallas_kernels import pallas_available

        use_pallas = pallas_available() and e % 128 == 0 and n >= 2048 * nd
    if use_pallas:
        tile_i = min(512, tile_i, n)
        tile_j = min(1024, tile_j, max(n // nd, 1))
    else:
        tile_i = min(tile_i, n)
        tile_j = min(tile_j, max(n // nd, 1))
    num_i = (min(target_size, n) + tile_i - 1) // tile_i
    # pad to a (tile_j * nd) multiple covering the i-tile span (see the
    # single-device path: lcm-based padding exploded for mid-size n)
    step = tile_j * nd
    need = max(n, num_i * tile_i)
    npad = ((need + step - 1) // step) * step

    f = jnp.asarray(feats)
    l = jnp.asarray(labels).astype(jnp.int32)
    if npad > n:
        f = jnp.concatenate([f, jnp.zeros((npad - n, e), f.dtype)])
        l = jnp.concatenate([l, jnp.full(npad - n, -12345, jnp.int32)])
    gidx = jnp.arange(npad, dtype=jnp.int32)
    fi = f[: num_i * tile_i]
    li = l[: num_i * tile_i]
    gi = gidx[: num_i * tile_i]

    if use_pallas:
        ti = (gi < target_size).astype(jnp.int32)
        fn = _sharded_jit(mesh, axis, True, tile_i, tile_j, num_i, interpret)
        return fn(fi, li, ti, gi, f, l, gidx, jnp.int32(n))

    fn = _sharded_jit(mesh, axis, False, tile_i, tile_j, num_i, interpret)
    return fn(fi, li, gi, f, l, gidx, jnp.int32(target_size), jnp.int32(n))


_SHARD_JITS: dict = {}


def _sharded_jit(mesh, axis: str, use_pallas: bool, tile_i: int, tile_j: int,
                 num_i: int, interpret: bool):
    """Module-cached jitted shard_map program for the sharded histogram.

    A per-call closure + jax.jit(fn) would retrace and XLA-recompile the
    whole program on EVERY invocation (a fresh jit cache each time) — at
    one eval per candidate client per round, minutes of recompiles on
    remote-compile rigs.  n/target_size enter as traced scalars so only
    shape/tile changes recompile.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    key = (mesh, axis, use_pallas, tile_i, tile_j, num_i, interpret)
    fn = _SHARD_JITS.get(key)
    if fn is not None:
        return fn

    if use_pallas:
        from .pallas_kernels import roc_histogram_pair

        def body(fi, li, ti, gi, fj, lj, gj, n_):
            rj = (gj < n_).astype(jnp.int32)
            out = roc_histogram_pair(
                fi, li.reshape(-1, 1), ti.reshape(-1, 1), gi.reshape(-1, 1),
                fj, lj.reshape(-1, 1), rj.reshape(-1, 1), gj.reshape(-1, 1),
                tile_i=tile_i, tile_j=tile_j, bins=NUM_BINS,
                interpret=interpret)
            return jax.lax.psum(out.reshape(-1)[: 2 * NUM_BINS], axis)

        fn = jax.jit(shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(axis), P(axis), P(axis), P()),
            out_specs=P(), check_vma=False))
    else:
        def body(fi, li, gi, fj, lj, gj, tsize, n_):
            hist = _tiled_histogram_scan(fi, li, gi, fj, lj, gj, tsize, n_,
                                         tile_i=tile_i, tile_j=tile_j,
                                         num_i=num_i)
            return jax.lax.psum(hist, axis)

        fn = jax.jit(shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(), P()),
            out_specs=P(), check_vma=False))
    _SHARD_JITS[key] = fn
    return fn


def pairwise_roc_histogram(feats: np.ndarray, labels: np.ndarray,
                           target_size: int, tile_i: int = 1024,
                           tile_j: int = 8192, mesh=None) -> np.ndarray:
    """(N,E) l2-normalized feats -> (2001, 2) [pos, neg] pair-count histogram.

    Rows [0, target_size) must be the target client's images (the caller
    reorders, as roc_cuda.py:127-134 does).  One host->device upload; all
    tiling happens on device.  With more than one visible device the j-rows
    are sharded over the mesh ``data`` axis and partial histograms psum over
    ICI (the production replacement for roc_cuda.py:89-108's per-GPU
    multiprocess fan-out); pass ``mesh`` to override the auto layout.
    """
    if mesh is None and jax.device_count() > 1:
        from ..parallel.mesh import data_mesh

        mesh = data_mesh()
    if mesh is not None and mesh.devices.size > 1:
        hist = pairwise_roc_histogram_sharded(mesh, feats, labels, target_size,
                                              tile_i, tile_j)
    else:
        from .pallas_kernels import pallas_available, roc_histogram

        n, e = np.shape(feats)
        # fused Pallas kernel: sim tile + binning + MXU bincount all in
        # VMEM — 2.6x the XLA sort-based path (536 vs 1304 ms at the
        # production 4k x 160k workload); pair counts at f32-ulp bin
        # boundaries may differ by reduction order (TPR tables agree).
        # Mosaic needs lane-aligned embeddings and non-degenerate tiles, so
        # tiny/unaligned problems take the XLA path.
        if pallas_available() and e % 128 == 0 and n >= 2048:
            hist = roc_histogram(feats, labels, target_size)
        else:
            hist = pairwise_roc_histogram_device(feats, labels, target_size,
                                                 tile_i, tile_j)
    return np.asarray(hist, dtype=np.int64).reshape(NUM_BINS, 2)


def roc_from_histogram(hist: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Cumulative histogram -> (TPR, FPR) curves (roc_cuda.py:56-69)."""
    data = np.cumsum(hist, axis=0)
    tpr = [1.0]
    fpr = [1.0]
    denom_pos = max(data[-1, 0], 1)
    denom_neg = max(data[-1, 1], 1)
    for i in range(data.shape[0]):
        tpr.append((data[-1, 0] - data[i, 0]) / denom_pos)
        fpr.append((data[-1, 1] - data[i, 1]) / denom_neg)
    return np.array(tpr), np.array(fpr)


def tpr_at_fpr_table(hist: np.ndarray,
                     exponents=(-1, -2, -3, -4, -5, -6)) -> list:
    """TPR (x100, 2dp) at FPR=10^e via linear interpolation on the sorted
    FPR curve (roc_cuda.py:65-71)."""
    tpr, fpr = roc_from_histogram(hist)
    order = np.argsort(fpr)
    fpr_s, tpr_s = fpr[order], tpr[order]
    out = []
    for e in exponents:
        target = 10.0 ** e
        v = np.interp(target, fpr_s, tpr_s)
        out.append(float("%.2f" % (100.0 * v)))
    return out


def reorder_target_first(feats, labels, start_id: int, end_id: int
                         ) -> Tuple[jnp.ndarray, np.ndarray, int]:
    """Move the target client's rows first (roc_cuda.py:127-134).

    Device-native: a stable argsort on the not-target flag permutes rows
    without a host round-trip, so device-resident features (160k x 512 =
    320 MB per client) never bounce through the host between embedding and
    the histogram kernel.
    """
    labels_np = np.asarray(labels)
    t_np = (labels_np >= start_id) & (labels_np < end_id)
    order = jnp.argsort(jnp.asarray(~t_np), stable=True)
    feats_r = jnp.asarray(feats)[order]
    labels_r = jnp.asarray(labels_np.astype(np.int32))[order]
    return feats_r, labels_r, int(t_np.sum())


def client_roc(feats: np.ndarray, labels: np.ndarray, start_id: int,
               end_id: int, tile_i: int = 1024, tile_j: int = 8192) -> list:
    """Full per-client 1:1 ROC: reorder, histogram, TPR table (-1..-6)."""
    f, l, tsize = reorder_target_first(feats, labels, start_id, end_id)
    hist = pairwise_roc_histogram(f, l, tsize, tile_i, tile_j)
    return tpr_at_fpr_table(hist)
