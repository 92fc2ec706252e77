"""torch-semantics SGD as a pure pytree transform.

Matches torch.optim.SGD(momentum, weight_decay, dampening=0, nesterov=False)
exactly (the reference's only optimizer, client.py:335):

    g   <- g + wd * p
    buf <- momentum * buf + g        (buf starts at 0 -> first step buf = g)
    p   <- p - lr * buf

The learning rate is a traced scalar so StepLR-style schedules (reference
client.py:348) never trigger recompilation.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SGDState(NamedTuple):
    momentum: Any  # pytree like params


def sgd_init(params: Any) -> SGDState:
    return SGDState(jax.tree_util.tree_map(jnp.zeros_like, params))


def sgd_update(params: Any, grads: Any, state: SGDState, lr,
               momentum: float = 0.9, weight_decay: float = 5e-4
               ) -> Tuple[Any, SGDState]:
    def upd(p, g, buf):
        g = g + weight_decay * p
        buf = momentum * buf + g
        return p - lr * buf, buf

    out = jax.tree_util.tree_map(upd, params, grads, state.momentum)
    new_params = jax.tree_util.tree_map(lambda t: t[0], out,
                                        is_leaf=lambda t: isinstance(t, tuple))
    new_buf = jax.tree_util.tree_map(lambda t: t[1], out,
                                     is_leaf=lambda t: isinstance(t, tuple))
    return new_params, SGDState(new_buf)


def step_lr(base_lr: float, epoch_in_run: int, step_size: int, gamma: float = 0.1) -> float:
    """StepLR within one local run (fresh each round, reference client.py:348)."""
    return base_lr * (gamma ** (epoch_in_run // step_size))
