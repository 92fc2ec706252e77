"""Classification heads: cosine FC and the personalized BCE transformation layer.

Functional re-design of the reference head modules (client.py:25-113):

* ``cosine_logits`` — the normalized cosine classifier behind FC_module
  (client.py:63-83).  The FC weight itself is a plain ``(C, E)`` array held in
  the federated train state because the server concatenates / splits / averages
  it across clients every round; keeping it out of a Module makes those
  pytree manipulations trivial.
* ``BCEModule`` — the personalized "transformation layer" branch
  (client.py:25-61): an identity-initialized converter (Linear or
  BottleBlock), per-class cosine logits against its own weight matrix, a
  polynomial hardness transform g(x) = 2*((x+1)/2)^t - 1, and +/- margins
  scaled by r.  Labels >= n_class collapse to a dropped virtual "other"
  column, i.e. those rows have no positive.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .bottle import BottleBlock
from .layers import dense_fp32, normal_init


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize semantics: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def cosine_logits(feats: jnp.ndarray, weight: jnp.ndarray,
                  normalize_feat: bool = True) -> jnp.ndarray:
    """(B,E) x (C,E) -> (B,C) cosine similarities (client.py:69-74)."""
    w = l2_normalize(weight, axis=1)
    if normalize_feat:
        feats = l2_normalize(feats, axis=1)
    return jnp.dot(feats, w.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def identity_init(key, shape, dtype=jnp.float32):
    assert shape[0] == shape[1]
    return jnp.eye(shape[0], dtype=dtype)


class LinearConverter(nn.Module):
    """Identity-initialized Linear(hidden, hidden) converter (client.py:29-33)."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        return dense_fp32(self.hidden, kernel_init=identity_init,
                          bias_init=nn.initializers.zeros, name="dense")(x)


class BCEModule(nn.Module):
    """Personalized BCE branch with margin/hardness logits (client.py:25-58)."""

    hidden: int = 512
    n_class: int = 100
    converter_layers: int = 1
    m: float = 0.4
    r: float = 30.0
    t: float = 3.0

    def setup(self):
        if self.converter_layers == 1:
            self.converter = LinearConverter(self.hidden, name="converter")
        else:
            self.converter = BottleBlock(self.hidden, 4, name="converter")
        self.weight = self.param("weight", normal_init(0.01), (self.n_class, self.hidden))
        self.bias = self.param("bias", nn.initializers.zeros, (self.n_class,))

    def convert(self, x):
        """Standalone converter application (used by personalized eval, which
        embeds through backbone+converter — reference local_all.py:354-359)."""
        return self.converter(x)

    def __call__(self, x, labels) -> Tuple[jnp.ndarray, jnp.ndarray]:
        feat = self.converter(x)
        cosine = jnp.dot(l2_normalize(feat), l2_normalize(self.weight).T,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        # one-hot gt; labels >= n_class (public-data rows) have no positive
        gt = labels[:, None] == jnp.arange(self.n_class)[None, :]
        g = 2.0 * jnp.power((cosine + 1.0) / 2.0, self.t) - 1.0
        logits = jnp.where(gt, self.r * (g - self.m), self.r * (g + self.m))
        logits = logits + self.bias[None, :]
        return logits, gt
