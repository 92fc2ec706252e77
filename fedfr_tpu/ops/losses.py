"""Loss functions of the FedFR objective, as pure jnp functions.

loss = softmax-CE(margin logits) + 10 * BCE + mu * contrastive
(reference client.py:383).  All reductions support an optional per-row
``valid`` mask so padded batches (static shapes) contribute zero.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _masked_mean(x: jnp.ndarray, valid: Optional[jnp.ndarray]) -> jnp.ndarray:
    if valid is None:
        return jnp.mean(x)
    v = valid.astype(x.dtype)
    return jnp.sum(x * v) / jnp.maximum(jnp.sum(v), 1.0)


def softmax_cross_entropy(logits: jnp.ndarray, label: jnp.ndarray,
                          valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Standard CE over the class axis, mean over (valid) rows."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, label[:, None], axis=-1)[:, 0]
    return _masked_mean(logz - tgt, valid)


def bce_loss(logits: jnp.ndarray, gt: jnp.ndarray, r: float = 30.0,
             lambda_: float = 0.7, valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Binary margin loss of the transformation layer (reference losses.py:4-15).

    positive terms:  (lambda/r)   * log(1 + exp(-z) + 1e-8)
    negative terms:  ((1-lambda)/r) * log(1 + exp(+z) + 1e-8)
    summed over classes, averaged over the batch.
    """
    z = logits.astype(jnp.float32)
    # log(1 + exp(+-z) + eps): clamp the exp argument for fp32 safety; beyond
    # ~60 the log is z itself to float precision.
    pos = (lambda_ / r) * jnp.log1p(jnp.exp(jnp.clip(-z, max=60.0)) + 1e-8)
    pos = jnp.where(z < -60.0, (lambda_ / r) * (-z), pos)
    neg = ((1.0 - lambda_) / r) * jnp.log1p(jnp.exp(jnp.clip(z, max=60.0)) + 1e-8)
    neg = jnp.where(z > 60.0, ((1.0 - lambda_) / r) * z, neg)
    per_row = jnp.sum(jnp.where(gt, pos, neg), axis=1)
    return _masked_mean(per_row, valid)


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Row-wise cosine similarity (torch nn.CosineSimilarity(dim=1) semantics)."""
    na = jnp.maximum(jnp.linalg.norm(a, axis=1), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=1), eps)
    return jnp.sum(a * b, axis=1) / (na * nb)


def moon_contrastive(feats: jnp.ndarray, global_feats: jnp.ndarray,
                     last_feats: jnp.ndarray, temperature: float = 0.5,
                     valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """MOON-style model-contrastive regularizer (reference client.py:372-375).

    CE over [sim(z, z_global)/T, sim(z, z_last)/T] with the global model as
    the positive: softplus(neg - pos) per row.
    """
    pos = cosine_similarity(feats, jax.lax.stop_gradient(global_feats)) / temperature
    neg = cosine_similarity(feats, jax.lax.stop_gradient(last_feats)) / temperature
    return _masked_mean(jax.nn.softplus(neg - pos), valid)
