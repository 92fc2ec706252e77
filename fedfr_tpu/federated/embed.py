"""Batched embedding extraction and feature-space utilities.

Replaces every DataParallel embed loop in the reference (server.py:242-263,
eval_local.py:107-152, local_all.py:180-222) with one jitted fixed-shape
forward reused across eval and mining.  Host supplies uint8 batches; padding
rows of the final batch are discarded after the forward.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .state import normalize_images


def make_embed_fn(backbone, bce_module=None) -> Callable:
    """jit: (variables, u8 NHWC batch[, converter params]) -> (B, E) float32.

    With ``bce_module``/converter params the features pass through the
    personalized transformation layer (nn.Sequential(backbone, converter),
    reference local_all.py:354-359).
    """

    @jax.jit
    def embed(variables, u8, bce_params=None):
        x = normalize_images(u8)
        feats = backbone.apply(variables, x, train=False)
        if bce_params is not None:
            feats = bce_module.apply({"params": bce_params}, feats,
                                     method=bce_module.convert)
        return feats

    if bce_module is None:
        return lambda variables, u8: embed(variables, u8)
    return embed


def make_sharded_embed_fn(backbone, mesh, axis: str = "data",
                          bce_module=None) -> Callable:
    """Data-parallel embedding over a mesh axis (replaces nn.DataParallel in
    every reference eval loop).  Variables are replicated, the batch is
    sharded over ``axis``; XLA SPMD partitions the forward.

    Batches whose leading dim is not a multiple of the axis size are padded
    (by repeating the first row) and the pad rows are sliced off the output,
    so any caller batch size works.  Replicated variable placement is
    memoized by tree identity so weights transfer to the mesh once, not per
    batch.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    nd = mesh.shape[axis]
    batch_sh = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    base = make_embed_fn(backbone, bce_module)
    # id(variables) -> (strong ref, replicated placement).  A small MAP, not
    # one slot: the contrastive cache builder alternates two frozen models
    # per batch, and a single-slot memo would re-replicate the evicted model
    # (a full weights broadcast) every batch on multi-device meshes.
    memo: dict = {}

    def embed(variables, u8, *args):
        entry = memo.get(id(variables))
        if entry is None or entry[0] is not variables:
            if len(memo) >= 8:  # bound growth across many rounds/models
                memo.clear()
            entry = (variables, jax.tree_util.tree_map(
                lambda x: jax.device_put(x, repl), variables))
            memo[id(variables)] = entry
        b = u8.shape[0]
        bpad = ((b + nd - 1) // nd) * nd
        if bpad > b:
            u8 = jnp.concatenate([u8, jnp.repeat(u8[:1], bpad - b, axis=0)])
        u8 = jax.device_put(u8, batch_sh)
        out = base(entry[1], u8, *args)
        return out[:b] if bpad > b else out

    return embed


def auto_embed_fn(backbone, bce_module=None) -> Callable:
    """The production embed fn: data-parallel over every visible device when
    more than one is present (mesh ``data`` axis, replaces the reference's
    nn.DataParallel in server.py:246, eval_local.py:128, local_all.py:105,
    ijbc_all.py:51), else the plain single-device jitted forward."""
    if jax.device_count() > 1:
        from ..parallel.mesh import data_mesh

        return make_sharded_embed_fn(backbone, data_mesh(),
                                     bce_module=bce_module)
    return make_embed_fn(backbone, bce_module)


@jax.jit
def _l2norm_rows(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def embed_dataset(embed_fn: Callable, variables, dataset, batch_size: int = 512,
                  flip_test: bool = False, l2norm: bool = True,
                  bce_params=None, progress: Optional[Callable] = None,
                  return_device: bool = False):
    """Embed every active item of a record dataset -> (N, E) feats, (N,) labels.

    Deterministic order (dataset order, no shuffle).  ``flip_test`` sums the
    embeddings of the image and its horizontal mirror (reference
    local_all.py:209-215).  With ``return_device=True`` the features stay on
    device (one concatenate, no per-batch device->host sync) — used by mining
    and the ROC pipeline, whose consumers are device kernels anyway.
    """
    n = len(dataset)
    # pin weights (and converter params) to device ONCE: host-numpy variable
    # trees would otherwise re-upload the whole backbone on EVERY batch
    # dispatch (measured 50x embed slowdown at the 420k-image public-set
    # scale before this)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    bce_params = (jax.tree_util.tree_map(jnp.asarray, bce_params)
                  if bce_params is not None else None)
    args = (bce_params,) if bce_params is not None else ()

    from ..data.datasets import BatchLoader

    chunks = []
    labels_out = np.empty(n, dtype=np.int64)
    pos = 0
    with BatchLoader(dataset, batch_size, shuffle=False,
                     drop_last=False) as loader:
        for imgs, labels, valid in loader.epoch():
            nvalid = int(valid.sum())
            u8 = jnp.asarray(imgs)
            f = embed_fn(variables, u8, *args)
            if flip_test:
                f = f + embed_fn(variables, u8[:, :, ::-1, :], *args)
            chunks.append(f[:nvalid])
            labels_out[pos:pos + nvalid] = labels[:nvalid]
            pos += nvalid
            if progress is not None:
                progress(pos, n)
    feats = jnp.concatenate(chunks) if len(chunks) > 1 else chunks[0]
    if l2norm:
        feats = _l2norm_rows(feats)
    if return_device:
        return feats, labels_out
    from ..utils.transfer import chunked_device_get

    # bounded-slice fetch: the full matrix can be huge (420k x 512 f32 =
    # 860 MB for the public-set FC init) and some transports collapse on
    # single large buffers
    return chunked_device_get(feats), labels_out


def embed_flip_caches(embed_fn: Callable, variables_list, dataset,
                      batch_size: int = 512,
                      pad_to_multiple: int = 8192) -> list:
    """Per-(image, orientation) feature caches for FROZEN models: one
    (N', 2, E) device array per entry of ``variables_list``, axis 1 =
    [original, h-flipped], in dataset order.

    Backs the cached-contrastive train step (trainer.py): the MOON global and
    last-round models are fixed for a whole local run and run in eval mode,
    so instead of two frozen batch-256 forwards per step the client embeds
    its combined dataset ONCE per run at full embedding batch size and the
    step gathers rows by (position, flip).  All models share ONE data pass —
    each batch is decoded/uploaded once and embedded per (model, flip) — so
    host decode and host->device bytes don't scale with the model count.

    The row count is padded up to a multiple of ``pad_to_multiple`` (zeros;
    gathers never touch pad rows — loader positions are < N): the cache
    shape is baked into the jitted step's program, and the mined combined
    dataset has a different N for every (client, round) — unbucketed, every
    local run would recompile the step (minutes on remote-compile rigs).
    Bucketing bounds the distinct shapes to a handful per workload.
    """
    variables_list = [jax.tree_util.tree_map(jnp.asarray, v)
                      for v in variables_list]
    from ..data.datasets import BatchLoader

    chunks: list = [[] for _ in variables_list]
    with BatchLoader(dataset, batch_size, shuffle=False,
                     drop_last=False) as loader:
        for imgs, _labels, valid in loader.epoch():
            nvalid = int(valid.sum())
            u8 = jnp.asarray(imgs)
            u8f = u8[:, :, ::-1, :]
            for chunk, variables in zip(chunks, variables_list):
                f0 = embed_fn(variables, u8)
                f1 = embed_fn(variables, u8f)
                chunk.append(jnp.stack([f0, f1], axis=1)[:nvalid])
    caches = [jnp.concatenate(c) if len(c) > 1 else c[0] for c in chunks]
    if pad_to_multiple > 1:
        n = caches[0].shape[0]
        target = -(-n // pad_to_multiple) * pad_to_multiple
        if target > n:
            caches = [jnp.pad(c, ((0, target - n), (0, 0), (0, 0)))
                      for c in caches]
    return caches


def class_mean_features(feats: np.ndarray, labels: np.ndarray,
                        num_classes: int, normalize_before: bool = False
                        ) -> np.ndarray:
    """Per-class mean embedding (FC initialization, reference client.py:159-188)."""
    f = feats
    if normalize_before:
        f = f / np.maximum(np.linalg.norm(f, axis=1, keepdims=True), 1e-12)
    out = np.zeros((num_classes, f.shape[1]), dtype=np.float32)
    counts = np.zeros(num_classes, dtype=np.int64)
    np.add.at(out, labels, f)
    np.add.at(counts, labels, 1)
    return out / np.maximum(counts[:, None], 1)


@jax.jit
def _chunk_max_sim(local_feats, public_chunk):
    """max over local rows of cosine similarity for one public chunk."""
    sim = jnp.dot(public_chunk, local_feats.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    return jnp.max(sim, axis=1)


def max_similarity(local_feats: np.ndarray, public_feats: np.ndarray,
                   chunk: int = 65536, backend: str = "auto") -> np.ndarray:
    """(n_public,) max cos-sim of each public image to ANY local image.

    Both inputs must be l2-normalized.  backend='pallas' uses the fused
    similarity+row-max TPU kernel (ops/pallas_kernels.py) which never
    materializes the similarity matrix; 'xla' is the exact chunked fallback;
    'auto' picks pallas on TPU backends.  Shared by production mining
    (hard_negative_mask) and the threshold-calibration probe
    (experiments/hn_probe.py) so calibration measures the SAME kernel
    mining runs.
    """
    if backend == "auto":
        from ..ops.pallas_kernels import pallas_available

        backend = "pallas" if pallas_available() else "xla"
    if backend == "pallas":
        from ..ops.pallas_kernels import max_cosine_similarity

        return np.asarray(max_cosine_similarity(jnp.asarray(public_feats),
                                                jnp.asarray(local_feats)))
    n = public_feats.shape[0]
    lf = jnp.asarray(local_feats)
    out = np.empty(n, dtype=np.float32)
    for start in range(0, n, chunk):
        end = min(start + chunk, n)
        buf = public_feats[start:end]
        if end - start < chunk:  # pad to static shape for jit reuse
            # jnp.pad keeps a device-resident public_feats on device (a host
            # np.concatenate would silently device_get the whole chunk)
            buf = jnp.pad(jnp.asarray(buf),
                          ((0, chunk - (end - start)), (0, 0)))
        ms = np.asarray(_chunk_max_sim(lf, jnp.asarray(buf)))
        out[start:end] = ms[: end - start]
    return out


def hard_negative_mask(local_feats: np.ndarray, public_feats: np.ndarray,
                       threshold: float, chunk: int = 65536,
                       backend: str = "auto") -> np.ndarray:
    """Boolean mask over public images with cos-sim > threshold to ANY local
    image (feature-based hard-negative mining, reference client.py:191-224).
    """
    return max_similarity(local_feats, public_feats, chunk,
                          backend) > threshold
