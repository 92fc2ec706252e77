"""Server-side aggregation: weighted FedAvg, FC averaging, SpreadOut.

Functional re-design of the reference aggregation (server.py:25-63,340-371):

* ``fed_weighted_average`` — dataset-size-weighted mean of *every* leaf of
  the client state pytrees, including BatchNorm running statistics, exactly
  as ``FedPavg`` averages every state_dict entry (server.py:29-33; a parity
  requirement flagged in SURVEY.md §7).
* ``fedavg_on_fc`` — weighted mean of the clients' shared 6000-class global
  FC with server interpolation factor p (server.py:36-46).
* ``spreadout`` — pushes all clients' class centers apart by minimizing
  relu(cos - margin)^2 over off-diagonal pairs with momentum-SGD
  (server.py:48-63,340-361), as one jitted lax.fori_loop.
"""

from __future__ import annotations

from functools import partial
from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.heads import l2_normalize


def stack_trees(trees: Sequence[Any]) -> Any:
    """Stack identical pytrees along a new leading (client) axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def unstack_tree(tree: Any, n: int) -> List[Any]:
    return [jax.tree_util.tree_map(lambda x: x[i], tree) for i in range(n)]


def fed_weighted_average(stacked: Any, weights: jnp.ndarray) -> Any:
    """Weighted mean over the leading client axis of every leaf."""
    w = weights / jnp.sum(weights)

    def avg(leaf):
        wshape = (-1,) + (1,) * (leaf.ndim - 1)
        return jnp.sum(leaf * w.reshape(wshape).astype(leaf.dtype), axis=0)

    return jax.tree_util.tree_map(avg, stacked)


@partial(jax.jit, donate_argnums=(0,))
def _axpy_tree(acc: Any, tree: Any, w: jnp.ndarray) -> Any:
    return jax.tree_util.tree_map(
        lambda a, x: a + w.astype(x.dtype) * x, acc, tree)


@jax.jit
def _scale_tree(tree: Any, w: jnp.ndarray) -> Any:
    return jax.tree_util.tree_map(lambda x: w.astype(x.dtype) * x, tree)


def streaming_weighted_average(trees: Sequence[Any], weights) -> Any:
    """Weighted mean over client states WITHOUT stacking them on device.

    Numerically identical to ``fed_weighted_average(stack_trees(trees), w)``
    (same left-to-right accumulation in each leaf's dtype) but peak device
    memory is one client state + the accumulator instead of K states —
    40 x iresnet200 (~250 MB each) aggregates within a single chip's HBM.
    Reference math: server.py:25-34.
    """
    w = np.asarray(jax.device_get(weights), np.float32)
    w = w / w.sum()  # f32 normalization, same as fed_weighted_average
    acc = _scale_tree(jax.tree_util.tree_map(jnp.asarray, trees[0]),
                      jnp.float32(w[0]))
    for tree, wi in zip(trees[1:], w[1:]):
        acc = _axpy_tree(acc, jax.tree_util.tree_map(jnp.asarray, tree),
                         jnp.float32(wi))
    return acc


def fedavg_on_fc(pretrain_fc: jnp.ndarray, fc_stack: jnp.ndarray,
                 weights: jnp.ndarray, p: float = 1.0) -> jnp.ndarray:
    """(K, C, E) client copies of the global FC -> aggregated (C, E)."""
    aggr = fed_weighted_average(fc_stack, weights)
    if p == 1.0:
        return aggr
    return (1.0 - p) * pretrain_fc + p * aggr


def _spreadout_loss(fc: jnp.ndarray, margin: float, mode: str) -> jnp.ndarray:
    fcn = l2_normalize(fc, axis=1)
    sim = jnp.dot(fcn, fcn.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    n = fc.shape[0]
    offdiag = ~jnp.eye(n, dtype=bool)
    h = jnp.where(offdiag, jax.nn.relu(sim - margin), 0.0)
    sq = h * h
    if mode == "sum":
        return jnp.sum(sq)
    # 'mean' over the N*(N-1) off-diagonal elements (masked_select semantics)
    return jnp.sum(sq) / (n * (n - 1))


@partial(jax.jit, static_argnames=("iters", "mode"))
def spreadout(fc_all: jnp.ndarray, *, margin: float = 0.4, iters: int = 20,
              lr: float = 0.01, momentum: float = 0.9, weight_decay: float = 5e-4,
              mode: str = "mean") -> jnp.ndarray:
    """Run ``iters`` momentum-SGD steps of the SpreadOut objective.

    ``fc_all``: (sum_K C_k, E) concatenation of the sampled clients' local FC
    rows.  Server call sites use margin 0.4, lr = 10x base lr, 20 iters,
    mode='mean' (server.py:348-349, train.py:81).
    """
    grad_fn = jax.grad(_spreadout_loss)

    def step(_, carry):
        fc, buf = carry
        g = grad_fn(fc, margin, mode) + weight_decay * fc
        buf = momentum * buf + g
        return fc - lr * buf, buf

    fc, _ = jax.lax.fori_loop(0, iters, step, (fc_all, jnp.zeros_like(fc_all)))
    return fc
