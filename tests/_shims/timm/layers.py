"""Shim for timm.layers used by reference honeybee.py at import time."""

import torch.nn as nn


class LayerNorm(nn.LayerNorm):
    """timm.layers.LayerNorm defaults eps to 1e-6 (norm.py), unlike torch's 1e-5."""

    def __init__(self, num_channels, eps=1e-6, affine=True):
        super().__init__(num_channels, eps=eps, elementwise_affine=affine)


class LayerNorm2d(nn.LayerNorm):
    """Channels-first LayerNorm over C of NCHW (timm semantics, eps 1e-6)."""

    def __init__(self, num_channels, eps=1e-6, affine=True):
        super().__init__(num_channels, eps=eps, elementwise_affine=affine)

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = super().forward(x)
        return x.permute(0, 3, 1, 2)
