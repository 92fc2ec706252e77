"""Backbone factory mirroring the reference's string-keyed construction
(``eval("backbones.%s" % name)`` at reference client.py:162 etc., but without
the eval)."""

from __future__ import annotations

from flax import linen as nn

import jax.numpy as jnp

from .iresnet import IResNet
from .layers import batch_norm, conv3x3, dense_fp32
from .sphnet import SphNet


class ToyNet(nn.Module):
    """Tiny conv embedder (global-avg-pool, any input size) for tests/smoke."""

    embedding_size: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3(16, stride=2, name="conv1")(x)
        x = batch_norm(train, name="bn1")(x)
        x = nn.relu(x)
        x = conv3x3(32, stride=2, name="conv2")(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return dense_fp32(self.embedding_size, name="fc")(x)


def build_backbone(name: str, embedding_size: int = 512, dropout: float = 0.0,
                   bf16: bool = True, scan_blocks: bool = False,
                   freeze_bn: bool = False,
                   remat_blocks: bool = False) -> nn.Module:
    """``freeze_bn`` puts BatchNorm in inference mode during training
    (reference freeze_BN/unfreeze_BN, iresnet.py:140-156); sphere nets are
    BN-free so it is a no-op there.  ``remat_blocks`` trades one extra
    forward of FLOPs for an O(depth) cut in peak activation memory
    (numerics unchanged) — used by lockstep client groups to fit HBM."""
    if name == "toy":
        return ToyNet(embedding_size=embedding_size)
    if name == "sphnet":
        return SphNet(depth=64, embedding_size=embedding_size, bf16=bf16,
                      scan_blocks=scan_blocks, remat_blocks=remat_blocks)
    if name == "sphnet20":
        return SphNet(depth=20, embedding_size=embedding_size, bf16=bf16,
                      scan_blocks=scan_blocks, remat_blocks=remat_blocks)
    if name.startswith("iresnet"):
        depth = int(name[len("iresnet"):])
        return IResNet(depth=depth, embedding_size=embedding_size,
                       dropout=dropout, bf16=bf16, scan_blocks=scan_blocks,
                       freeze_bn=freeze_bn, remat_blocks=remat_blocks)
    raise ValueError(f"unknown backbone '{name}'")


def fast_zero_variables(module, *init_args, **init_kwargs):
    """Zero-valued variables with the exact structure/shapes of module.init.

    ``module.init`` is a full device program (expensive to compile on remote
    rigs); for compile checks and throughput benchmarks the values are
    irrelevant, so materialize zeros from ``jax.eval_shape`` in ONE tiny
    program instead.
    """
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(lambda: module.init(*init_args, **init_kwargs))

    @jax.jit
    def zeros():
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    return zeros()
