"""Shim for timm.models.layers used by the reference InternViT at import time.

DropPath(p) at eval time is an identity, which is all the inference-only
reference path exercises (drop_path_rate=0.0 for the 6B config)."""

import torch.nn as nn


class DropPath(nn.Module):
    def __init__(self, drop_prob: float = 0.0, scale_by_keep: bool = True):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        return x
