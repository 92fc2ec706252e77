"""SphereFace-style plain CNN backbone (flax, NHWC).

Re-designed from the behavior of the reference sphnet (backbones/sphnet.py):
four stages of [strided conv + PReLU + k residual PReLU blocks] over filter
sizes (64, 128, 256, 512) on 112x112 input, flattened 512*7*7 features into a
512-d embedding via a single Linear.  sphere20 uses layers [1,2,4,1],
sphere64 (the FedFR default) [3,7,16,3] (reference sphnet.py:21-26).

TPU mapping: NHWC convolutions in bfloat16 feed the MXU; the final fp32
Linear mirrors the reference's autocast boundary (sphnet.py:56-64) where the
embedding projection runs in full precision.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import PReLU, conv3x3, dense_fp32, normal_init, xavier_uniform


class SphereBlock(nn.Module):
    """Residual unit: x + prelu(conv(prelu(conv(x)))) (reference sphnet.py:4-13)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = conv3x3(self.features, use_bias=False, dtype=self.dtype,
                    kernel_init=normal_init(0.01), name="conv1")(x)
        y = PReLU(self.features, dtype=self.dtype, name="prelu1")(y)
        y = conv3x3(self.features, use_bias=False, dtype=self.dtype,
                    kernel_init=normal_init(0.01), name="conv2")(y)
        y = PReLU(self.features, dtype=self.dtype, name="prelu2")(y)
        return x + y


class _ScanSphereBlock(nn.Module):
    """SphereBlock with a (carry, _) -> (carry, None) signature for nn.scan."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, _):
        return SphereBlock(self.features, dtype=self.dtype, name="block")(x), None


class SphNet(nn.Module):
    """sphere20/64 embedding backbone -> (B, embedding_size) float32.

    ``scan_blocks=True`` rolls each stage's identical residual blocks into one
    ``nn.scan`` (params stacked on a leading axis): the traced program shrinks
    ~5x, cutting XLA compile time accordingly.  Numerics are identical; the
    checkpoint layout differs (see utils/torch_interop.sphnet_scan_params).

    ``remat_blocks=True`` wraps each residual block in ``nn.remat``
    (jax.checkpoint): the backward pass recomputes block activations instead
    of keeping every intermediate live, trading ~1 extra forward of FLOPs
    for an O(depth) cut in peak activation memory — the knob that lets
    K-stacked lockstep client groups (parallel/client_parallel.py) fit HBM
    at K where the un-remat'd program's temps exceed it (DESIGN.md
    lockstep notes).  Numerics are unchanged.
    """

    depth: int = 64
    embedding_size: int = 512
    bf16: bool = True
    scan_blocks: bool = False
    remat_blocks: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.depth == 20:
            layers: Sequence[int] = (1, 2, 4, 1)
        elif self.depth == 64:
            layers = (3, 7, 16, 3)
        else:
            raise ValueError(f"sphere{self.depth} unsupported (20 or 64)")
        dtype = jnp.bfloat16 if self.bf16 else jnp.float32
        filters = (64, 128, 256, 512)

        x = x.astype(dtype)
        for stage, (blocks, feats) in enumerate(zip(layers, filters), start=1):
            # strided stage conv has a bias (torch Conv2d default) -> xavier init
            x = conv3x3(feats, stride=2, use_bias=True, dtype=dtype,
                        kernel_init=xavier_uniform,
                        bias_init=nn.initializers.zeros,
                        name=f"layer{stage}_conv")(x)
            x = PReLU(feats, dtype=dtype, name=f"layer{stage}_prelu")(x)
            if self.scan_blocks:
                body = (nn.remat(_ScanSphereBlock) if self.remat_blocks
                        else _ScanSphereBlock)
                scan = nn.scan(body,
                               variable_axes={"params": 0},
                               split_rngs={"params": True},
                               length=blocks)
                x, _ = scan(feats, dtype=dtype,
                            name=f"layer{stage}_blocks")(x, None)
            else:
                blk = nn.remat(SphereBlock) if self.remat_blocks else SphereBlock
                for b in range(blocks):
                    x = blk(feats, dtype=dtype,
                            name=f"layer{stage}_block{b}")(x)

        # (B, 7, 7, 512) -> flatten; embedding projection in fp32
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        x = dense_fp32(self.embedding_size, kernel_init=xavier_uniform,
                       bias_init=nn.initializers.zeros, name="fc")(x)
        return x
