"""Insightface-style improved ResNet family (flax, NHWC).

Built from the behavior of the reference iresnet (backbones/iresnet.py):
BN-first basic blocks (bn-conv-bn-prelu-conv-bn + identity), stride-2 at the
head of every stage, a stem conv without pooling, then BN2d -> flatten ->
dropout -> Dense(512*7*7 -> E) -> BN1d with the scale frozen at 1
(iresnet.py:95-100).  Depths: 18/34/50/100/200 via per-stage block counts
(iresnet.py:182-204).

TPU mapping: NHWC bf16 convolutions on the MXU; BatchNorm statistics in fp32;
the final Dense + BN1d in fp32, mirroring the reference autocast boundary
(iresnet.py:158-172).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import (PReLU, TorchBatchNorm, batch_norm, conv1x1, conv3x3,
                     dense_fp32, normal_init)

_DEPTH_LAYERS: Dict[int, Tuple[int, int, int, int]] = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 14, 3),
    100: (3, 13, 30, 3),
    200: (6, 26, 60, 6),
}


class IBasicBlock(nn.Module):
    """BN-first residual block (reference iresnet.py:28-57)."""

    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    freeze_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        train = train and not self.freeze_bn  # freeze_BN (iresnet.py:140-148)
        y = batch_norm(train, name="bn1")(x.astype(jnp.float32))
        y = conv3x3(self.features, dtype=self.dtype,
                    kernel_init=normal_init(0.1), name="conv1")(y.astype(self.dtype))
        y = batch_norm(train, name="bn2")(y.astype(jnp.float32))
        y = PReLU(self.features, dtype=jnp.float32, name="prelu")(y)
        y = conv3x3(self.features, stride=self.stride, dtype=self.dtype,
                    kernel_init=normal_init(0.1), name="conv2")(y.astype(self.dtype))
        y = batch_norm(train, name="bn3")(y.astype(jnp.float32))
        if self.downsample:
            identity = conv1x1(self.features, stride=self.stride, dtype=self.dtype,
                               kernel_init=normal_init(0.1), name="ds_conv")(x.astype(self.dtype))
            identity = batch_norm(train, name="ds_bn")(identity.astype(jnp.float32))
        return y + identity


class _ScanIBasicBlock(nn.Module):
    """IBasicBlock with a scan-compatible (carry, _) signature."""

    features: int
    dtype: Any = jnp.float32
    freeze_bn: bool = False
    train: bool = False

    @nn.compact
    def __call__(self, x, _):
        y = IBasicBlock(self.features, stride=1, downsample=False,
                        dtype=self.dtype, freeze_bn=self.freeze_bn,
                        name="block")(x, train=self.train)
        return y, None


class IResNet(nn.Module):
    """iresnet{18..200} embedding backbone -> (B, embedding_size) float32.

    ``scan_blocks=True`` rolls each stage's identical stride-1 blocks
    (everything after the stage's strided head block) into one ``nn.scan``
    with params/batch_stats stacked on a leading axis — iresnet200 traces 4
    head blocks + 4 scans instead of 98 blocks.
    """

    depth: int = 18
    embedding_size: int = 512
    dropout: float = 0.0
    bf16: bool = True
    freeze_bn: bool = False  # BN in eval mode during training (iresnet.py:140)
    scan_blocks: bool = False
    # nn.remat every residual block: backward recomputes block activations,
    # cutting peak activation memory O(depth) for ~1 extra forward of FLOPs
    # (numerics unchanged) — see sphnet.SphNet.remat_blocks
    remat_blocks: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        layers = _DEPTH_LAYERS[self.depth]
        dtype = jnp.bfloat16 if self.bf16 else jnp.float32
        bn_train = train and not self.freeze_bn

        x = conv3x3(64, dtype=dtype, kernel_init=normal_init(0.1), name="conv1")(
            x.astype(dtype))
        x = batch_norm(bn_train, name="bn1")(x.astype(jnp.float32))
        x = PReLU(64, dtype=jnp.float32, name="prelu")(x)

        inplanes = 64
        # remat'd blocks: `train` is a module attribute of the scan body and
        # a static kwarg of IBasicBlock — mark it static so jax.checkpoint
        # only sees array operands (BN stats thread through as collections)
        blk = (nn.remat(IBasicBlock, static_argnums=(2,))
               if self.remat_blocks else IBasicBlock)
        scan_body = (nn.remat(_ScanIBasicBlock) if self.remat_blocks
                     else _ScanIBasicBlock)
        for stage, (blocks, feats) in enumerate(zip(layers, (64, 128, 256, 512)), start=1):
            if self.scan_blocks:
                x = blk(feats, stride=2, downsample=True, dtype=dtype,
                        freeze_bn=self.freeze_bn,
                        name=f"layer{stage}_block0")(x, train)
                if blocks > 1:
                    scan = nn.scan(scan_body,
                                   variable_axes={"params": 0, "batch_stats": 0},
                                   split_rngs={"params": True},
                                   length=blocks - 1)
                    x, _ = scan(feats, dtype=dtype, freeze_bn=self.freeze_bn,
                                train=train,
                                name=f"layer{stage}_blocks")(x, None)
                inplanes = feats
                continue
            for b in range(blocks):
                stride = 2 if b == 0 else 1
                need_ds = stride != 1 or inplanes != feats
                x = blk(feats, stride=stride, downsample=need_ds, dtype=dtype,
                        freeze_bn=self.freeze_bn,
                        name=f"layer{stage}_block{b}")(x, train)
                inplanes = feats

        x = batch_norm(bn_train, name="bn2")(x.astype(jnp.float32))
        x = x.reshape(x.shape[0], -1)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = dense_fp32(self.embedding_size, name="fc")(x)
        # BN1d "features" head: scale frozen at 1 (use_scale=False), bias trained
        x = TorchBatchNorm(use_running_average=not bn_train, momentum=0.9,
                           epsilon=1e-5, use_scale=False, use_bias=True,
                           name="features")(x)
        return x
