from . import torch_ckpt

__all__ = ["torch_ckpt"]
