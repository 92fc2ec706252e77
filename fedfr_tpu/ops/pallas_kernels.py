"""Pallas TPU kernels for the framework's hot fused ops.

``max_cosine_similarity`` — for every public-set row, the maximum cosine
similarity against all of a client's local rows.  This is the inner kernel of
feature-based hard-negative mining (reference client.py:191-224 computes the
full similarity matrix and thresholds it): only the row-max matters, so the
kernel keeps each (TP x TL) similarity tile in VMEM and reduces it on the fly
— the full matrix (420k x ~7k f32 ≈ 11 GB per client per round) never touches
HBM.  An XLA fallback with identical semantics lives in
``federated/embed.hard_negative_mask``.

Design notes (see /opt/skills/guides/pallas_guide.md):
* grid (public_tiles, local_tiles); the output block of a public tile is
  revisited across the local-tile axis and accumulated with ``maximum``
  (init on the first visit).
* both operands stream through VMEM in MXU-aligned (128-multiple) tiles;
  callers pad row counts — local padding must REPLICATE a real row (zero
  rows would inject sim=0 into the max).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl


def _max_sim_kernel(fj_ref, fi_ref, out_ref):
    # single-pass bf16 MXU matmul (~1e-3 abs error on unit-norm cosines):
    # mining thresholds a heuristic 0.4 cutoff, and the features themselves
    # come out of a bf16 trunk, so the fast pass is the right trade.  Mosaic
    # supports DEFAULT/HIGHEST only; HIGHEST triples MXU passes and erases
    # the fusion win (measured 189ms vs 112ms on the 420k x 6.6k workload).
    sim = jnp.dot(fj_ref[:], fi_ref[:].T, preferred_element_type=jnp.float32)
    m = jnp.max(sim, axis=1, keepdims=True)  # (TP, 1)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[:] = m

    @pl.when(pl.program_id(1) > 0)
    def _acc():
        out_ref[:] = jnp.maximum(out_ref[:], m)


@functools.partial(jax.jit, static_argnames=("tile_p", "tile_l", "interpret"))
def _max_sim_padded(public, local, *, tile_p: int, tile_l: int,
                    interpret: bool = False):
    np_, e = public.shape
    nl, _ = local.shape
    grid = (np_ // tile_p, nl // tile_l)
    return pl.pallas_call(
        _max_sim_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_p, e), lambda p, l: (p, 0)),
            pl.BlockSpec((tile_l, e), lambda p, l: (l, 0)),
        ],
        out_specs=pl.BlockSpec((tile_p, 1), lambda p, l: (p, 0)),
        out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.float32),
        interpret=interpret,
    )(public, local)


def max_cosine_similarity(public_feats, local_feats, tile_p: int = 512,
                          tile_l: int = 512, interpret: bool = False
                          ) -> jnp.ndarray:
    """(N_pub,) max-over-local cosine similarity; inputs l2-normalized.

    Row counts are padded to tile multiples: public padding rows are dropped
    from the output; local padding replicates row 0 (max-neutral).
    """
    public_feats = jnp.asarray(public_feats, jnp.float32)
    local_feats = jnp.asarray(local_feats, jnp.float32)
    np_, e = public_feats.shape
    nl = local_feats.shape[0]
    pp = (-np_) % tile_p
    if pp:
        public_feats = jnp.concatenate(
            [public_feats, jnp.zeros((pp, e), jnp.float32)])
    pads = (-nl) % tile_l
    if pads:
        public0 = jnp.broadcast_to(local_feats[:1], (pads, e))
        local_feats = jnp.concatenate([local_feats, public0])
    out = _max_sim_padded(public_feats, local_feats, tile_p=tile_p,
                          tile_l=tile_l, interpret=interpret)
    return out[:np_, 0]


def _roc_hist_kernel(fi_ref, li_ref, ti_ref, gi_ref, fj_ref, lj_ref, rj_ref,
                     gj_ref, out_ref, scratch_ref, *, bins: int, chunk: int):
    """Fused all-pairs cosine ROC histogram block.

    Per (i, j) grid step: one MXU similarity tile (TI x TJ), arithmetic
    binning into ``idx*2 + is_neg`` (dead bucket 2*bins for invalid pairs),
    then MXU bincount — the combined index is radix-split into
    (coarse=32, fine=128) one-hots built IN VMEM and counted with one
    (32 x P_chunk)@(P_chunk x 128) matmul per chunk, f32-exact (each chunk
    holds ``chunk`` <= 2^24 pairs).  Nothing but the (32, 128) int32 count
    block ever leaves VMEM: no atomics (vs roc_cuda.py:26-28's
    cuda.atomic.add), no sorted intermediates, no HBM one-hots (the XLA
    formulations pay ~1 GB of HBM traffic per tile for these).
    """
    sim = jnp.dot(fi_ref[:], fj_ref[:].T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    idx = jnp.clip(((sim + 1.0) * 1000.0).astype(jnp.int32), 0, bins - 1)
    li = li_ref[:]          # (TI, 1)
    lj = lj_ref[:]          # (TJ, 1)
    is_neg = (li != lj.reshape(1, -1)).astype(jnp.int32)
    valid = ((gi_ref[:] < gj_ref[:].reshape(1, -1))
             & (ti_ref[:] > 0) & (rj_ref[:].reshape(1, -1) > 0))
    combined = jnp.where(valid, idx * 2 + is_neg, 2 * bins)

    fine = 64
    coarse = 64  # 64*64 = 4096 >= 2*2001+1; the square split minimizes the
                 # per-pair one-hot compares (coarse+fine) that bound the VPU
    # Mosaic has no dynamic_slice on VALUES; stage the combined indices in a
    # VMEM scratch ref and slice the REF per chunk instead
    n_chunks = combined.size // chunk
    scratch_ref[:] = combined.reshape(n_chunks, chunk)

    def chunk_body(c, acc):
        seg = scratch_ref[pl.dslice(c, 1), :].reshape(chunk, 1)
        # power-of-two radix digits via shift/mask (int div lowers slowly)
        hi = (jax.lax.shift_right_logical(seg, 6)
              == jax.lax.broadcasted_iota(jnp.int32, (chunk, coarse), 1))
        lo = ((seg & (fine - 1))
              == jax.lax.broadcasted_iota(jnp.int32, (chunk, fine), 1))
        counts = jnp.dot(hi.astype(jnp.bfloat16).T, lo.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return acc + counts

    acc = jax.lax.fori_loop(0, n_chunks, chunk_body,
                            jnp.zeros((coarse, fine), jnp.float32))

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        out_ref[:] = acc.astype(jnp.int32)

    @pl.when((pl.program_id(0) > 0) | (pl.program_id(1) > 0))
    def _acc():
        out_ref[:] = out_ref[:] + acc.astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("tile_i", "tile_j", "bins", "interpret"))
def roc_histogram_pair(fi, li, ti, gi, fj, lj, rj, gj, *, tile_i: int,
                       tile_j: int, bins: int = 2001,
                       interpret: bool = False):
    """Pallas histogram over an (i-rows, j-rows) pair of row sets.

    ``fi``/``fj`` may be the same array (single-device full scan) or a
    replicated target block vs a per-device shard (the multi-device
    shard_map path, replacing roc_cuda.py:89-108's per-GPU fan-out).  All
    row counts must already be tile multiples; (ti, rj) are the
    target/real-row masks and (gi, gj) the GLOBAL row indices that order
    the i<j pair guard.  Returns the (64, 64) radix-laid count block.
    """
    from jax.experimental.pallas import tpu as pltpu

    e = fi.shape[1]
    grid = (fi.shape[0] // tile_i, fj.shape[0] // tile_j)
    # the VMEM scratch reshapes the (tile_i, tile_j) block into
    # (n_chunks, chunk): chunk must divide the block size exactly, so halve
    # until it does (callers passing non-power-of-two tiles would otherwise
    # hit an opaque reshape error inside the kernel)
    chunk = min(8192, tile_i * tile_j)
    while (tile_i * tile_j) % chunk:
        chunk //= 2
    return pl.pallas_call(
        functools.partial(_roc_hist_kernel, bins=bins, chunk=chunk),
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        scratch_shapes=[pltpu.VMEM((tile_i * tile_j // chunk, chunk),
                                   jnp.int32)],
        in_specs=[
            pl.BlockSpec((tile_i, e), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_j, e), lambda i, j: (j, 0)),
            pl.BlockSpec((tile_j, 1), lambda i, j: (j, 0)),
            pl.BlockSpec((tile_j, 1), lambda i, j: (j, 0)),
            pl.BlockSpec((tile_j, 1), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((64, 64), lambda i, j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((64, 64), jnp.int32),
        interpret=interpret,
    )(fi, li, ti, gi, fj, lj, rj, gj)


def roc_histogram(feats, labels, target_size: int, tile_i: int = 512,
                  tile_j: int = 1024, bins: int = 2001,
                  interpret: bool = False) -> jnp.ndarray:
    """Fused Pallas ROC histogram: (N, E) l2-normed feats (target rows
    first), int labels -> (2*bins,) interleaved [pos, neg] pair counts.

    Semantics identical to ops/roc_histogram._tiled_histogram_scan (the
    CUDA kernel contract, roc_cuda.py:14-28): pairs (i, j) with
    global_i < global_j, i a target row, both rows real.
    """
    feats = jnp.asarray(feats, jnp.float32)
    n, e = feats.shape
    if n == 0 or target_size <= 0:
        # no target rows -> no pairs; the grid/BlockSpec machinery cannot
        # slice a 0-row operand (the XLA paths return zeros via a 0-trip
        # loop — match them)
        return jnp.zeros(2 * bins, jnp.int32)
    tile_i = min(tile_i, n)
    tile_j = min(tile_j, n)
    num_i = (min(target_size, n) + tile_i - 1) // tile_i
    # pad to a tile_j multiple that also covers the i-tile span — NOT
    # lcm(tile_i, tile_j), which blows up 64-256x for mid-size inputs
    # (same scheme as roc_histogram.py::pairwise_roc_histogram_device)
    need = max(n, num_i * tile_i)
    npad = ((need + tile_j - 1) // tile_j) * tile_j
    labels = jnp.asarray(labels, jnp.int32)
    if npad > n:
        feats = jnp.concatenate([feats, jnp.zeros((npad - n, e), jnp.float32)])
        labels = jnp.concatenate([labels, jnp.full(npad - n, -12345, jnp.int32)])
    gidx = jnp.arange(npad, dtype=jnp.int32).reshape(-1, 1)
    tmask = (gidx < target_size).astype(jnp.int32)
    rmask = (gidx < n).astype(jnp.int32)
    labels = labels.reshape(-1, 1)
    ni = num_i * tile_i
    out = roc_histogram_pair(
        feats[:ni], labels[:ni], tmask[:ni], gidx[:ni],
        feats, labels, rmask, gidx,
        tile_i=tile_i, tile_j=tile_j, bins=bins, interpret=interpret)
    return out.reshape(-1)[: 2 * bins]


def pallas_available() -> bool:
    """True when running on a real TPU backend (Mosaic path)."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
