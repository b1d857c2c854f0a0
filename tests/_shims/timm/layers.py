"""Shim for timm.layers used by reference honeybee.py at import time."""

import torch.nn as nn


class LayerNorm(nn.LayerNorm):
    pass


class LayerNorm2d(nn.LayerNorm):
    """Channels-first LayerNorm over C of NCHW (timm semantics)."""

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = super().forward(x)
        return x.permute(0, 3, 1, 2)
