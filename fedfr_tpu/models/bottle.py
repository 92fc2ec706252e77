"""Four-branch bottleneck MLP residual block (alternate BCE converter).

Behavioral port of the reference BottleBlock (backbones/bottle.py:11-47):
four parallel Linear-LeakyReLU-Linear-LeakyReLU branches at in_dim/rate
width, concatenated and projected back, with a residual connection.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import dense_fp32


class BottleBlock(nn.Module):
    in_dim: int
    bottle_rate: int = 4

    @nn.compact
    def __call__(self, x):
        branch_dim = self.in_dim // self.bottle_rate
        outs = []
        for i in range(1, 5):
            y = dense_fp32(branch_dim, name=f"br{i}_dense1")(x)
            y = nn.leaky_relu(y, negative_slope=0.01)
            y = dense_fp32(branch_dim, name=f"br{i}_dense2")(y)
            y = nn.leaky_relu(y, negative_slope=0.01)
            outs.append(y)
        concat = jnp.concatenate(outs, axis=-1)
        return x + dense_fp32(self.in_dim, name="concat_fc")(concat)
