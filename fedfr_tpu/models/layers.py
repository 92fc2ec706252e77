"""Shared layers for the face backbones (flax.linen, NHWC, bf16-trunk)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class PReLU(nn.Module):
    """Per-channel parametric ReLU (torch nn.PReLU semantics, init 0.25).

    Elementwise, so it runs on the VPU in whatever dtype the trunk uses.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), (self.features,), jnp.float32)
        alpha = alpha.astype(self.dtype)
        return jnp.where(x >= 0, x, alpha * x)


def _precision_for(dtype):
    """fp32 layers compute at HIGHEST precision (XLA's 'default' silently runs
    reduced-precision passes even for f32 operands); the bf16 trunk uses the
    native fast MXU path."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def conv3x3(features: int, stride: int = 1, use_bias: bool = False,
            dtype=jnp.float32, kernel_init=None, bias_init=None, name=None) -> nn.Conv:
    """3x3 conv, SAME-1 padding, NHWC — tiles straight onto the MXU."""
    kwargs = {}
    if kernel_init is not None:
        kwargs["kernel_init"] = kernel_init
    if bias_init is not None:
        kwargs["bias_init"] = bias_init
    return nn.Conv(features, (3, 3), strides=(stride, stride), padding=[(1, 1), (1, 1)],
                   use_bias=use_bias, dtype=dtype, param_dtype=jnp.float32, name=name,
                   precision=_precision_for(dtype), **kwargs)


def conv1x1(features: int, stride: int = 1, dtype=jnp.float32, kernel_init=None, name=None) -> nn.Conv:
    kwargs = {}
    if kernel_init is not None:
        kwargs["kernel_init"] = kernel_init
    return nn.Conv(features, (1, 1), strides=(stride, stride), padding="VALID",
                   use_bias=False, dtype=dtype, param_dtype=jnp.float32, name=name,
                   precision=_precision_for(dtype), **kwargs)


def dense_fp32(features: int, kernel_init=None, bias_init=None, name=None) -> nn.Dense:
    """fp32 Dense at HIGHEST precision (embedding projections, converters)."""
    kwargs = {}
    if kernel_init is not None:
        kwargs["kernel_init"] = kernel_init
    if bias_init is not None:
        kwargs["bias_init"] = bias_init
    return nn.Dense(features, dtype=jnp.float32, param_dtype=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST, name=name, **kwargs)


class TorchBatchNorm(nn.Module):
    """BatchNorm matching torch.nn.BatchNorm1d/2d TRAIN semantics exactly.

    flax's ``nn.BatchNorm`` folds the BIASED batch variance into the running
    average; torch folds the UNBIASED (Bessel-corrected, n/(n-1)) one while
    still normalizing with the biased value (reference backbones train-mode
    BN, iresnet.py:37-42).  The difference only shows in the running stats —
    which FedFR *aggregates across clients* (reference server.py:25-33), so
    round-level parity needs the torch rule.  Variable layout is identical
    to ``nn.BatchNorm`` (params/{scale,bias}, batch_stats/{mean,var}):
    checkpoints and the torch converters are unaffected.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        xf = x.astype(jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf - mean), axes)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                bessel = n / max(n - 1, 1)
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var * bessel
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            y = y * self.param("scale", nn.initializers.ones, (feat,),
                               jnp.float32)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (feat,),
                               jnp.float32)
        return y


def batch_norm(train: bool, name: Optional[str] = None) -> TorchBatchNorm:
    """BatchNorm with torch-equivalent hyperparameters.

    torch BN momentum 0.1 == flax momentum 0.9 (ra = 0.9*ra + 0.1*batch);
    eps 1e-5 matches the reference backbones (iresnet.py:37-42).  Statistics
    are always computed in float32 regardless of trunk dtype.
    """
    return TorchBatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, name=name)


def normal_init(stddev: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * stddev
    return init


xavier_uniform = nn.initializers.xavier_uniform()
