"""Client-parallel training over the mesh ``client`` axis.

The reference simulates its 40 clients with a sequential in-process loop
(server.py:283-316).  On a TPU slice that serializes the whole round; here K
clients train simultaneously: their states are stacked along a leading axis,
sharded over the mesh ``client`` axis, and one vmapped+jitted step advances
all of them at once.  Round-end FedAvg is then a weighted reduction over the
same axis (a psum over ICI once the stacked tree is sharded).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..federated.trainer import make_branch_train_step, make_plain_train_step
from .fedavg import fed_weighted_average


def client_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over 'client' for stacked client pytrees."""
    return NamedSharding(mesh, P("client"))


def shard_stacked_tree(mesh: Mesh, tree: Any) -> Any:
    """device_put every leaf with its leading axis over the client axis."""
    sh = client_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def make_parallel_branch_step(backbone, bce_module, donate: bool = True,
                              **kwargs) -> Callable:
    """K-client vmapped branch train step.

    Signature: ``(stacked_state, global_vars, stacked_last_vars,
    images (K,B,H,W,C) u8, labels (K,B), valid (K,B), lr, rngs (K,...))``.
    The global model is replicated (in_axes=None); everything per-client is
    stacked on axis 0.  jit + input shardings partition it over the mesh.

    With ``cached_contrastive=True`` the signature becomes
    ``(stacked_state, g_caches (K,N,2,E), l_caches (K,N,2,E),
    images, labels, valid, idx (K,B), lr, rngs, step)`` — the per-client
    frozen-feature caches are stacked (bucket-padded to one N by
    embed_flip_caches) and gathered per client.
    """
    base = make_branch_train_step(backbone, bce_module, jit=False, donate=False,
                                  **kwargs)
    # per-client base rng is stacked; the step counter is shared (in_axes
    # None) — each client folds (its key, step) exactly as the sequential
    # loop does, so both paths consume identical randomness
    if kwargs.get("cached_contrastive"):
        v = jax.vmap(base, in_axes=(0, 0, 0, 0, 0, 0, 0, None, 0, None))
    else:
        v = jax.vmap(base, in_axes=(0, None, 0, 0, 0, 0, None, 0, None))
    return jax.jit(v, donate_argnums=(0,) if donate else ())


def make_parallel_plain_step(backbone, donate: bool = True,
                             **kwargs) -> Callable:
    """K-client vmapped plain (CosFace-only) train step.

    Signature: ``(stacked_state, images (K,B,H,W,C) u8, labels (K,B),
    valid (K,B), lr, rngs (K,...), step_no)``.  The plain local objective is
    a first-class reference mode (Client.train, client.py:511-571); without
    this the parallel round would silently serialize it.
    """
    base = make_plain_train_step(backbone, jit=False, donate=False, **kwargs)
    v = jax.vmap(base, in_axes=(0, 0, 0, 0, None, 0, None))
    return jax.jit(v, donate_argnums=(0,) if donate else ())


@jax.jit
def parallel_fedavg(stacked_backbones: Any, weights: jnp.ndarray) -> Any:
    """Round-end aggregation over the stacked (sharded) client axis.

    With the stacked tree sharded over 'client' XLA lowers the weighted sum
    to a reduce over ICI — the federated "communication" step.
    """
    return fed_weighted_average(stacked_backbones, weights)


def stack_client_batches(batches) -> tuple:
    """List of per-client (imgs, labels, valid[, idx]) -> stacked arrays.

    Device-resident components (the synthetic data plane's image batches)
    stack on device; a host np.stack would silently device_get each one
    through the host link first.
    """
    return tuple(
        (jnp.stack(comps) if isinstance(comps[0], jax.Array)
         else np.stack(comps))
        for comps in zip(*batches))
