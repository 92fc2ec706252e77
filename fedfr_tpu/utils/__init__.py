from . import torch_interop

__all__ = ["torch_interop"]
