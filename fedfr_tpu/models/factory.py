"""Backbone factory mirroring the reference's string-keyed construction
(``eval("backbones.%s" % name)`` at reference client.py:162 etc., but without
the eval)."""

from __future__ import annotations

from flax import linen as nn

from .iresnet import IResNet
from .sphnet import SphNet


def build_backbone(name: str, embedding_size: int = 512, dropout: float = 0.0,
                   bf16: bool = True) -> nn.Module:
    if name == "sphnet":
        return SphNet(depth=64, embedding_size=embedding_size, bf16=bf16)
    if name == "sphnet20":
        return SphNet(depth=20, embedding_size=embedding_size, bf16=bf16)
    if name.startswith("iresnet"):
        depth = int(name[len("iresnet"):])
        return IResNet(depth=depth, embedding_size=embedding_size,
                       dropout=dropout, bf16=bf16)
    raise ValueError(f"unknown backbone '{name}'")
