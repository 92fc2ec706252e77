"""Margin-softmax transforms as pure functions (no in-place tensor surgery).

The reference applies margins by scatter/boolean writes on the logits
(losses.py:17-45); here they're ``where``/one-hot arithmetic so XLA can fuse
them into the logits matmul.  Rows with label == -1 (PartialFC convention for
"positive lives on another shard") receive no margin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cosface(cosine: jnp.ndarray, label: jnp.ndarray, s: float = 30.0,
            m: float = 0.4) -> jnp.ndarray:
    """Additive cosine margin: subtract m at the target logit, scale by s
    (reference losses.py:17-29)."""
    num_classes = cosine.shape[-1]
    onehot = (label[:, None] == jnp.arange(num_classes)[None, :]) & (label[:, None] >= 0)
    return (cosine - jnp.where(onehot, m, 0.0)) * s


def arcface(cosine: jnp.ndarray, label: jnp.ndarray, s: float = 30.0,
            m: float = 0.5) -> jnp.ndarray:
    """Additive angular margin: cos(theta + m) at the target, scale by s
    (reference losses.py:32-45, which acos/cos's the whole matrix)."""
    num_classes = cosine.shape[-1]
    onehot = (label[:, None] == jnp.arange(num_classes)[None, :]) & (label[:, None] >= 0)
    theta = jnp.arccos(jnp.clip(cosine, -1.0, 1.0))
    return jnp.cos(theta + jnp.where(onehot, m, 0.0)) * s


def reweight_negatives(logits: jnp.ndarray, label: jnp.ndarray, num_local: int,
                       num_clients: int) -> jnp.ndarray:
    """Replicate each row's non-target local logits (num_clients-1)x.

    Re-balances the positive/negative ratio as if all clients' classes were
    present (reference client.py:269-285): take the first ``num_local``
    columns after deleting the target column, detach, repeat, and append.
    """
    b = logits.shape[0]
    ks = jnp.arange(num_local)[None, :]
    # column k of (logits minus target col l) is column k + (k >= l) of logits
    idx = ks + (ks >= label[:, None])
    tmp = jnp.take_along_axis(logits, idx, axis=1)
    tmp = jax.lax.stop_gradient(tmp)
    tmp = jnp.tile(tmp, (1, num_clients - 1))
    return jnp.concatenate([logits, tmp], axis=1)


MARGINS = {"CosFace": cosface, "ArcFace": arcface}
