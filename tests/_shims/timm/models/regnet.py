"""Test-only shim: a functional RegStage so the reference honeybee.py
(/root/reference/omchat/model/multimodal_projector/honeybee.py:86-105) runs on
CPU as the CAbstractor parity oracle.

timm is not installable in this offline environment, so this reimplements the
timm==0.9.11 (pyproject.toml:24 pin) ``timm.models.regnet`` semantics for the
configuration honeybee instantiates — ``RegStage(depth, in_chs, out_chs,
stride=1, dilation=1, act_layer=SiLU, norm_layer=LayerNorm2d)`` with Bottleneck
defaults ``bottle_ratio=1, group_size=1, se_ratio=0.25, downsample='conv1x1'``:

- ConvNormAct: conv (bias-free) → norm → act; ``apply_act=False`` for conv3
  and the downsample shortcut;
- conv2 is a 3×3 *grouped* conv with ``groups = bottleneck_chs // group_size``
  (= bottleneck_chs at group_size=1, i.e. depthwise);
- SE block between conv2 and conv3: ``rd_channels = round(in_chs * se_ratio)``,
  1×1 convs with bias, act inside, sigmoid gate;
- residual: ``act3(drop_path(x) + shortcut)``; shortcut is
  conv1x1+norm (no act) when in_chs != out_chs, identity otherwise.

Module/parameter names follow timm so state dicts convert identically
(``bN.conv1.conv.weight``, ``bN.conv1.bn.{weight,bias}``,
``bN.se.fc1.{weight,bias}``, ``bN.downsample.conv.weight``…).
"""

import torch
import torch.nn as nn


class ConvNormAct(nn.Module):
    def __init__(self, in_chs, out_chs, kernel_size, groups=1, act_layer=nn.ReLU,
                 norm_layer=nn.BatchNorm2d, apply_act=True):
        super().__init__()
        self.conv = nn.Conv2d(
            in_chs, out_chs, kernel_size, padding=kernel_size // 2, groups=groups, bias=False
        )
        self.bn = norm_layer(out_chs)
        self.act = act_layer() if apply_act else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class SEModule(nn.Module):
    def __init__(self, channels, rd_channels, act_layer=nn.ReLU):
        super().__init__()
        self.fc1 = nn.Conv2d(channels, rd_channels, 1, bias=True)
        self.act = act_layer()
        self.fc2 = nn.Conv2d(rd_channels, channels, 1, bias=True)
        self.gate = nn.Sigmoid()

    def forward(self, x):
        x_se = x.mean((2, 3), keepdim=True)
        x_se = self.fc2(self.act(self.fc1(x_se)))
        return x * self.gate(x_se)


class Bottleneck(nn.Module):
    def __init__(self, in_chs, out_chs, stride=1, dilation=(1, 1), bottle_ratio=1,
                 group_size=1, se_ratio=0.25, act_layer=nn.ReLU, norm_layer=nn.BatchNorm2d):
        super().__init__()
        bottleneck_chs = int(round(out_chs * bottle_ratio))
        groups = bottleneck_chs // group_size
        cargs = dict(act_layer=act_layer, norm_layer=norm_layer)
        self.conv1 = ConvNormAct(in_chs, bottleneck_chs, 1, **cargs)
        self.conv2 = ConvNormAct(bottleneck_chs, bottleneck_chs, 3, groups=groups, **cargs)
        if se_ratio:
            self.se = SEModule(bottleneck_chs, rd_channels=int(round(in_chs * se_ratio)),
                               act_layer=act_layer)
        else:
            self.se = nn.Identity()
        self.conv3 = ConvNormAct(bottleneck_chs, out_chs, 1, apply_act=False, **cargs)
        self.act3 = act_layer()
        if in_chs != out_chs or stride != 1:
            self.downsample = ConvNormAct(in_chs, out_chs, 1, apply_act=False, **cargs)
        else:
            self.downsample = nn.Identity()

    def forward(self, x):
        shortcut = self.downsample(x)
        x = self.conv1(x)
        x = self.conv2(x)
        x = self.se(x)
        x = self.conv3(x)
        return self.act3(x + shortcut)


class RegStage(nn.Module):
    def __init__(self, depth, in_chs, out_chs, stride=1, dilation=1,
                 act_layer=nn.ReLU, norm_layer=nn.BatchNorm2d, **block_kwargs):
        super().__init__()
        for i in range(depth):
            block_in = in_chs if i == 0 else out_chs
            block_stride = stride if i == 0 else 1
            self.add_module(
                f"b{i + 1}",
                Bottleneck(block_in, out_chs, stride=block_stride,
                           act_layer=act_layer, norm_layer=norm_layer, **block_kwargs),
            )

    def forward(self, x):
        for block in self.children():
            x = block(x)
        return x
