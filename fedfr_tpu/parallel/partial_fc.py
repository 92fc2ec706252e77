"""Class-sharded margin-softmax FC ("Partial FC") over the mesh ``model`` axis.

TPU-native re-design of the reference's torch.distributed implementation
(partial_fc.py:89-176).  There, each NCCL rank owns ``C/W`` weight rows and
the distributed softmax-CE is hand-derived around all_gather / all_reduce /
reduce_scatter.  Here the same blocked log-sum-exp runs inside ``shard_map``
with ``lax`` collectives riding ICI, and the backward pass falls out of JAX
AD: the transpose of ``all_gather`` over the batch IS the reference's
``reduce_scatter`` of feature gradients (partial_fc.py:173), and the psum'd
partition function reproduces the manually-coded ``(prob - onehot)/B`` logits
gradient (partial_fc.py:140-166).

Shard layout (1-D over ``model``, matching the reference where every rank is
both a data and a class shard):

* features: (B_local, E) per shard, all-gathered to (B, E)
* weight:   (C_local, E) per shard,  C = W * C_local  (pad classes to W|C)
* labels:   (B_local,)   global ids in [0, C) or -1 (ignored row)

Differences from the reference (documented deviations):
* rows with label == -1 are excluded from the loss mean (the reference's
  all-reduce path would add a spurious -log(1e-30) for such rows,
  partial_fc.py:159-162 — a latent bug never hit in its training).
* negative-class sampling uses a static ``num_sample`` (jit-stable), with the
  same "positives forced, rest uniform via top-k of perturbed scores" scheme
  (partial_fc.py:94-104).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models.heads import l2_normalize
from ..ops.margins import MARGINS


def pad_classes(weight: jnp.ndarray, num_shards: int) -> Tuple[jnp.ndarray, int]:
    """Pad FC rows so the class count divides the shard count.

    Padded rows are zero; they are masked out of the softmax by the partial-fc
    kernel via the ``num_valid`` argument.
    """
    c = weight.shape[0]
    pad = (-c) % num_shards
    if pad:
        weight = jnp.concatenate([weight, jnp.zeros((pad, weight.shape[1]), weight.dtype)])
    return weight, c


def _shard_loss(features, labels, weight, *, axis: str, num_valid: int,
                margin_fn: Callable, s: float, m: float):
    """Per-shard body: blocked stable softmax CE over the global class axis."""
    c_local = weight.shape[0]
    idx = lax.axis_index(axis)
    class_start = idx * c_local

    total_f = lax.all_gather(features, axis, tiled=True)    # (B, E) over ICI
    total_l = lax.all_gather(labels, axis, tiled=True)      # (B,)

    wn = l2_normalize(weight, axis=1)
    fn = l2_normalize(total_f, axis=1)
    cosine = jnp.dot(fn, wn.T, preferred_element_type=jnp.float32,
                     precision=lax.Precision.HIGHEST)        # (B, C_local) on MXU

    # labels relative to this shard; -1 if the positive class lives elsewhere
    rel = total_l - class_start
    local_label = jnp.where((rel >= 0) & (rel < c_local), rel, -1)
    logits = margin_fn(cosine, local_label, s, m)

    # mask padded class columns out of the softmax
    col = class_start + jnp.arange(c_local)[None, :]
    logits = jnp.where(col < num_valid, logits, -jnp.inf)

    # blocked log-sum-exp: local max/sum + cross-shard pmax/psum (ICI)
    # the stabilizing shift is mathematically gradient-free; stop_gradient also
    # sidesteps pmax's missing transpose rule under shard_map
    local_max = jnp.max(logits, axis=1)
    global_max = lax.pmax(lax.stop_gradient(local_max), axis)
    local_z = jnp.sum(jnp.exp(logits - global_max[:, None]), axis=1)
    global_z = lax.psum(local_z, axis)
    logz = jnp.log(global_z) + global_max

    # each valid label hits exactly one shard; psum assembles the target logit
    safe = jnp.clip(local_label, 0, c_local - 1)
    tgt_local = jnp.where(local_label >= 0,
                          jnp.take_along_axis(logits, safe[:, None], axis=1)[:, 0], 0.0)
    tgt = lax.psum(tgt_local, axis)

    valid = total_l >= 0
    per_row = jnp.where(valid, logz - tgt, 0.0)
    return jnp.sum(per_row) / jnp.maximum(jnp.sum(valid), 1)


def partial_fc_loss(mesh: Mesh, margin: str = "CosFace", s: float = 30.0,
                    m: float = 0.4, axis: str = "model",
                    num_valid: Optional[int] = None):
    """Build ``loss = f(features, labels, weight)`` sharded over ``axis``.

    ``features``/``labels`` enter sharded over the batch, ``weight`` over
    class rows.  The returned function is differentiable: ``jax.grad`` yields
    the sharded feature and weight gradients with XLA-scheduled collectives.
    """
    margin_fn = MARGINS[margin]

    def build(nv: int):
        body = functools.partial(_shard_loss, axis=axis, num_valid=nv,
                                 margin_fn=margin_fn, s=s, m=m)
        return shard_map(body, mesh=mesh,
                         in_specs=(P(axis), P(axis), P(axis)),
                         out_specs=P(), check_vma=False)

    def loss_fn(features, labels, weight):
        nv = num_valid if num_valid is not None else weight.shape[0]
        return build(nv)(features, labels, weight)

    return loss_fn


def sample_negatives(key: jax.Array, labels: jnp.ndarray, num_local: int,
                     num_sample: int, class_start: int,
                     valid_count=None) -> jnp.ndarray:
    """Choose ``num_sample`` class rows: positives forced, rest uniform.

    The reference's top-k perturbation trick (partial_fc.py:94-104): scores
    are U[0,1) with positives boosted to 2.0; the top-k indices (sorted) form
    the sampled class set.  Rows at or past ``valid_count`` (shard padding
    from pad_classes) score -1 so real classes always win the budget.
    """
    rel = labels - class_start
    pos = (rel >= 0) & (rel < num_local)
    perm = jax.random.uniform(key, (num_local,))
    marks = jnp.zeros(num_local, bool).at[jnp.where(pos, rel, num_local)].set(
        True, mode="drop")
    perm = jnp.where(marks, 2.0, perm)
    if valid_count is not None:
        perm = jnp.where(jnp.arange(num_local) < valid_count, perm, -1.0)
    _, index = lax.top_k(perm, num_sample)
    return jnp.sort(index)


def sampled_partial_fc_loss(mesh: Mesh, num_sample: int, margin: str = "CosFace",
                            s: float = 30.0, m: float = 0.4, axis: str = "model",
                            num_valid: Optional[int] = None):
    """Partial FC with per-shard negative-class sampling (static sample count).

    Returns ``loss = f(key, features, labels, weight)``.  Gradients w.r.t.
    ``weight`` flow only to sampled rows (gather/scatter-add transpose).

    ``num_valid``: real class count when the weight was padded by
    pad_classes — padded rows are never sampled and are masked out of the
    softmax if sampling must fall back to them.

    Static-shape deviation (documented): the reference switches to a
    positives-only dynamic sample when a batch has more distinct positive
    classes than ``num_sample`` (partial_fc.py:96-101).  Here the sample
    count is fixed, so overflow positives are excluded from the loss for
    that step (their rows are masked, not mis-targeted).
    """
    margin_fn = MARGINS[margin]

    def body(key, features, labels, weight):
        c_local = weight.shape[0]
        idx = lax.axis_index(axis)
        class_start = idx * c_local

        total_f = lax.all_gather(features, axis, tiled=True)
        total_l = lax.all_gather(labels, axis, tiled=True)

        shard_valid = (None if num_valid is None
                       else jnp.clip(num_valid - class_start, 0, c_local))
        shard_key = jax.random.fold_in(key, idx)
        index = sample_negatives(shard_key, total_l, c_local, num_sample,
                                 class_start, valid_count=shard_valid)
        index = lax.stop_gradient(index)
        w_sub = jnp.take(weight, index, axis=0)           # differentiable gather

        # remap labels into the sampled set; a positive that lost the top-k
        # budget (more distinct positives than num_sample) maps nowhere and
        # its row is excluded below instead of training a wrong target
        rel = total_l - class_start
        pos = (rel >= 0) & (rel < c_local)
        safe_rel = jnp.where(pos, rel, 0)
        remapped = jnp.clip(jnp.searchsorted(index, safe_rel), 0, num_sample - 1)
        hit = jnp.take(index, remapped) == safe_rel
        local_label = jnp.where(pos & hit, remapped, -1)

        if num_valid is not None:
            # replace any padded all-zero row that sampling had to fall back
            # to with a safe constant BEFORE normalization — sqrt(sum w^2)
            # has a NaN gradient at w == 0 that would poison the weight grad
            # through the masked (0-cotangent) path
            col_ok = (class_start + index) < num_valid
            w_sub = jnp.where(col_ok[:, None], w_sub, 1.0)
        wn = l2_normalize(w_sub, axis=1)
        fn = l2_normalize(total_f, axis=1)
        cosine = jnp.dot(fn, wn.T, preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
        logits = margin_fn(cosine, local_label, s, m)
        if num_valid is not None:  # padded rows drop out of the softmax
            logits = jnp.where(col_ok[None, :], logits, -jnp.inf)

        local_max = jnp.max(logits, axis=1)
        global_max = lax.pmax(lax.stop_gradient(local_max), axis)
        local_z = jnp.sum(jnp.exp(logits - global_max[:, None]), axis=1)
        global_z = lax.psum(local_z, axis)
        logz = jnp.log(global_z) + global_max

        safe = jnp.clip(local_label, 0, num_sample - 1)
        tgt_local = jnp.where(local_label >= 0,
                              jnp.take_along_axis(logits, safe[:, None], axis=1)[:, 0], 0.0)
        tgt = lax.psum(tgt_local, axis)

        # a row is only counted when some shard owns its (surviving) target
        has_tgt = lax.psum((local_label >= 0).astype(jnp.float32), axis)
        valid = (total_l >= 0) & (has_tgt > 0)
        per_row = jnp.where(valid, logz - tgt, 0.0)
        return jnp.sum(per_row) / jnp.maximum(jnp.sum(valid), 1)

    return shard_map(body, mesh=mesh,
                     in_specs=(P(None), P(axis), P(axis), P(axis)),
                     out_specs=P(), check_vma=False)
