from .bottle import BottleBlock
from .factory import build_backbone
from .heads import BCEModule, LinearConverter, cosine_logits, l2_normalize
from .iresnet import IResNet
from .layers import PReLU
from .sphnet import SphNet

__all__ = [
    "BottleBlock",
    "build_backbone",
    "BCEModule",
    "LinearConverter",
    "cosine_logits",
    "l2_normalize",
    "IResNet",
    "PReLU",
    "SphNet",
]
