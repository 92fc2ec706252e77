"""Train-state pytrees and device-side preprocessing.

The reference mutates nn.Modules in place and shuttles state_dicts between
server and clients by reference (server.py:286).  Here every piece of client
state is an explicit pytree, so "communication" is pytree movement and
aggregation is tree arithmetic.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils.optim import SGDState


class ClientTrainState(NamedTuple):
    """Everything a client updates during a local run.

    backbone: {'params':..., 'batch_stats':...} (batch_stats absent for sphnet)
    fc:       (C, E) cosine-classifier rows — local-only (C=C_local) in plain
              training, [local ; global] concat during joint public training
              (reference client.py:313)
    bce:      BCEModule params or None
    opt:      SGD momentum buffers for (backbone.params, fc, bce) as one tree
    """

    backbone: Dict[str, Any]
    fc: jnp.ndarray
    bce: Optional[Dict[str, Any]]
    opt: SGDState


def trainable_tree(state: ClientTrainState) -> Dict[str, Any]:
    """The subtree the optimizer updates (mirrors opt=SGD(model.parameters()))."""
    t = {"backbone": state.backbone["params"], "fc": state.fc}
    if state.bce is not None:
        t["bce"] = state.bce["params"]
    return t


def normalize_images(u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 HWC RGB -> float32 in [-1, 1] (Normalize(0.5, 0.5), dataset.py:85)."""
    return u8.astype(jnp.float32) * (1.0 / 127.5) - 1.0


def flip_mask(rng: jax.Array, n: int) -> jnp.ndarray:
    """The per-sample coin of the random horizontal flip.

    Split out of ``random_hflip`` so a step that needs the SAME flip
    decisions for a side lookup (the cached-contrastive gather,
    trainer.py) can recompute the identical mask from the identical key."""
    return jax.random.bernoulli(rng, 0.5, (n,))


def apply_hflip(flip: jnp.ndarray, imgs: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(flip[:, None, None, None], imgs[:, :, ::-1, :], imgs)


def random_hflip(rng: jax.Array, imgs: jnp.ndarray) -> jnp.ndarray:
    """Per-sample random horizontal flip (RandomHorizontalFlip, dataset.py:84)."""
    return apply_hflip(flip_mask(rng, imgs.shape[0]), imgs)


def train_preprocess(rng: jax.Array, u8: jnp.ndarray) -> jnp.ndarray:
    return normalize_images(random_hflip(rng, u8))
