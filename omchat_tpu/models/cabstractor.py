"""CAbstractor (Honeybee) projector — convolutional token compressor.

Structure follows /root/reference/omchat/model/multimodal_projector/honeybee.py:
learned position embeddings (+ optional prenorm) → RegStage(depth) →
AdaptiveAvgPool2d(√n_query) → RegStage(depth) → MLP readout
(Linear + (SiLU + Linear)×(mlp_depth−1)), compressing 1024 → n_query tokens.

RegStage blocks are RegNet bottlenecks (1×1 → 3×3 → 1×1, LayerNorm2d after
each conv, SiLU, residual with 1×1 shortcut on channel change, post-residual
activation), bottle_ratio=1, groups=1, no SE — the configuration honeybee
instantiates via timm.  NOTE: no public OmChat checkpoint ships cabstract
weights (the flagship uses mlp2x_gelu), so this path is validated by shape and
self-consistency tests rather than weight-level parity.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from omchat_tpu.config import ProjectorConfig
from omchat_tpu.ops.norms import layer_norm


def _conv(x: jax.Array, p: dict, stride: int = 1) -> jax.Array:
    """NHWC conv with HWIO kernel; 'SAME' padding for 3x3, VALID for 1x1."""
    kh = p["kernel"].shape[0]
    pad = "SAME" if kh > 1 else "VALID"
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    if "bias" in p:
        y = y + p["bias"]
    return y


def _ln2d(x: jax.Array, p: dict) -> jax.Array:
    """LayerNorm over channels of NHWC (timm LayerNorm2d semantics)."""
    return layer_norm(x, p["scale"], p["bias"], eps=1e-6)


def _bottleneck(x: jax.Array, p: dict) -> jax.Array:
    out = jax.nn.silu(_ln2d(_conv(x, p["conv1"]), p["norm1"]))
    out = jax.nn.silu(_ln2d(_conv(out, p["conv2"]), p["norm2"]))
    out = _ln2d(_conv(out, p["conv3"]), p["norm3"])
    shortcut = _conv(x, p["downsample"]) if "downsample" in p else x
    return jax.nn.silu(out + shortcut)


def _reg_stage(x: jax.Array, blocks: list) -> jax.Array:
    for p in blocks:
        x = _bottleneck(x, p)
    return x


def _adaptive_avg_pool(x: jax.Array, out_hw: int) -> jax.Array:
    """AdaptiveAvgPool2d for NHWC; exact for divisible sizes, torch-compatible
    binning otherwise."""
    b, h, w, c = x.shape
    if h % out_hw == 0 and w % out_hw == 0:
        x = x.reshape(b, out_hw, h // out_hw, out_hw, w // out_hw, c)
        return x.mean(axis=(2, 4))
    # torch bins: start=floor(i*h/out), end=ceil((i+1)*h/out)
    rows = [x[:, (i * h) // out_hw : -(-((i + 1) * h) // out_hw)].mean(axis=1) for i in range(out_hw)]
    x = jnp.stack(rows, axis=1)  # [b, out, w, c]
    cols = [x[:, :, (j * w) // out_hw : -(-((j + 1) * w) // out_hw)].mean(axis=2) for j in range(out_hw)]
    return jnp.stack(cols, axis=2)


def cabstractor_forward(params: dict, cfg: ProjectorConfig, features: jax.Array) -> jax.Array:
    """[B, L, mm_hidden] → [B, n_query, hidden]."""
    b, l, d = features.shape
    hw = int(math.isqrt(l))
    x = features
    if "pos_emb" in params:
        x = x + params["pos_emb"].astype(x.dtype)
    x = x.reshape(b, hw, hw, d)

    x = _reg_stage(x, params["s1"])
    x = _adaptive_avg_pool(x, int(math.isqrt(cfg.n_query)))
    x = _reg_stage(x, params["s2"])

    x = x.reshape(b, cfg.n_query, -1)
    # readout MLP: Linear + (SiLU + Linear)*(mlp_depth-1)
    x = x @ params["readout"][0]["kernel"] + params["readout"][0]["bias"]
    for p in params["readout"][1:]:
        x = jax.nn.silu(x) @ p["kernel"] + p["bias"]
    return x


def init_params(
    key: jax.Array,
    cfg: ProjectorConfig,
    mm_hidden: int,
    out_hidden: int,
    dtype=jnp.float32,
    hidden: int = 1024,
    num_input_tokens: int = 1024,
) -> dict:
    keys = iter(jax.random.split(key, 64))

    def nrm(shape, scale=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(dtype)

    def block(i, o):
        p = {
            "conv1": {"kernel": nrm((1, 1, i, o)), "bias": jnp.zeros((o,), dtype)},
            "norm1": {"scale": jnp.ones((o,), dtype), "bias": jnp.zeros((o,), dtype)},
            "conv2": {"kernel": nrm((3, 3, o, o)), "bias": jnp.zeros((o,), dtype)},
            "norm2": {"scale": jnp.ones((o,), dtype), "bias": jnp.zeros((o,), dtype)},
            "conv3": {"kernel": nrm((1, 1, o, o)), "bias": jnp.zeros((o,), dtype)},
            "norm3": {"scale": jnp.ones((o,), dtype), "bias": jnp.zeros((o,), dtype)},
        }
        if i != o:
            p["downsample"] = {"kernel": nrm((1, 1, i, o)), "bias": jnp.zeros((o,), dtype)}
        return p

    s1 = [block(mm_hidden if j == 0 else hidden, hidden) for j in range(cfg.depth)]
    s2 = [block(hidden, hidden) for _ in range(cfg.depth)]
    readout = [{"kernel": nrm((hidden, out_hidden)), "bias": jnp.zeros((out_hidden,), dtype)}]
    for _ in range(1):  # honeybee build_mlp default mlp_depth=2
        readout.append({"kernel": nrm((out_hidden, out_hidden)), "bias": jnp.zeros((out_hidden,), dtype)})
    return {
        "pos_emb": nrm((num_input_tokens, mm_hidden)),
        "s1": s1,
        "s2": s2,
        "readout": readout,
    }
