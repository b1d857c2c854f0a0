"""CAbstractor (Honeybee) projector — convolutional token compressor.

Structure follows /root/reference/omchat/model/multimodal_projector/honeybee.py:
learned position embeddings (+ optional prenorm) → RegStage(depth) →
AdaptiveAvgPool2d(√n_query) → RegStage(depth) → MLP readout
(Linear + (SiLU + Linear)×(mlp_depth−1)), compressing 1024 → n_query tokens.

RegStage blocks follow the timm==0.9.11 Bottleneck the reference instantiates
(``bottle_ratio=1, group_size=1, se_ratio=0.25``, SiLU, LayerNorm2d):
1×1 conv→LN→SiLU; **depthwise** 3×3 conv→LN→SiLU (group_size=1 makes
groups == channels); SE (rd = in_chs/4, 1×1 convs with bias, sigmoid gate);
1×1 conv→LN; residual through a conv1x1+LN shortcut on channel change;
post-residual SiLU.  Convs inside ConvNormAct are bias-free; LayerNorm eps is
timm's 1e-6 default.  Parity-tested against the reference honeybee module
driven through the RegStage shim (tests/test_cabstractor_parity.py).
"""

from __future__ import annotations

import math
import re
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from omchat_tpu.config import ProjectorConfig
from omchat_tpu.ops.norms import layer_norm

_LN_EPS = 1e-6  # timm LayerNorm2d default (timm/layers/norm.py), not torch's 1e-5


def _conv(x: jax.Array, kernel: jax.Array, *, depthwise: bool = False) -> jax.Array:
    """Bias-free NHWC conv, HWIO kernel; SAME padding for 3x3, VALID for 1x1."""
    kh = kernel.shape[0]
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        (1, 1),
        "SAME" if kh > 1 else "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1] if depthwise else 1,
    )


def _ln2d(x: jax.Array, p: dict) -> jax.Array:
    return layer_norm(x, p["scale"], p["bias"], eps=_LN_EPS)


def _se(x: jax.Array, p: dict) -> jax.Array:
    """Squeeze-excite: global-mean → fc1 → SiLU → fc2 → sigmoid gate."""
    x_se = x.mean(axis=(1, 2))  # [B, C]
    x_se = jax.nn.silu(x_se @ p["fc1"]["kernel"] + p["fc1"]["bias"])
    x_se = x_se @ p["fc2"]["kernel"] + p["fc2"]["bias"]
    return x * jax.nn.sigmoid(x_se)[:, None, None, :]


def _bottleneck(x: jax.Array, p: dict) -> jax.Array:
    out = jax.nn.silu(_ln2d(_conv(x, p["conv1"]["kernel"]), p["norm1"]))
    out = jax.nn.silu(_ln2d(_conv(out, p["conv2"]["kernel"], depthwise=True), p["norm2"]))
    out = _se(out, p["se"])
    out = _ln2d(_conv(out, p["conv3"]["kernel"]), p["norm3"])
    if "downsample" in p:
        shortcut = _ln2d(_conv(x, p["downsample"]["conv"]["kernel"]), p["downsample"]["norm"])
    else:
        shortcut = x
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
    keys = iter(jax.random.split(key, 128))

    def nrm(shape, scale=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(dtype)

    def norm(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    def block(i, o):
        rd = int(round(i * 0.25))
        p = {
            "conv1": {"kernel": nrm((1, 1, i, o))},
            "norm1": norm(o),
            "conv2": {"kernel": nrm((3, 3, 1, o))},  # depthwise
            "norm2": norm(o),
            "se": {
                "fc1": {"kernel": nrm((o, rd)), "bias": jnp.zeros((rd,), dtype)},
                "fc2": {"kernel": nrm((rd, o)), "bias": jnp.zeros((o,), dtype)},
            },
            "conv3": {"kernel": nrm((1, 1, o, o))},
            "norm3": norm(o),
        }
        if i != o:
            p["downsample"] = {"conv": {"kernel": nrm((1, 1, i, o))}, "norm": norm(o)}
        return p

    s1 = [block(mm_hidden if j == 0 else hidden, hidden) for j in range(cfg.depth)]
    s2 = [block(hidden, hidden) for _ in range(cfg.depth)]
    readout = [{"kernel": nrm((hidden, out_hidden)), "bias": jnp.zeros((out_hidden,), dtype)}]
    for _ in range(cfg.mlp_depth - 1):
        readout.append({"kernel": nrm((out_hidden, out_hidden)), "bias": jnp.zeros((out_hidden,), dtype)})
    return {
        "pos_emb": nrm((num_input_tokens, mm_hidden)),
        "s1": s1,
        "s2": s2,
        "readout": readout,
    }


def convert_honeybee_state_dict(
    state: Dict[str, "np.ndarray"], cfg: ProjectorConfig, dtype=jnp.float32
) -> dict:
    """Reference honeybee CAbstractor state dict → pytree.

    Key layout (honeybee.py:99-105 net = Sequential(s1, pool, s2); timm
    naming): ``net.{0,2}.bN.conv{1,2,3}.{conv,bn}.*``, ``net.*.bN.se.fc*``,
    ``net.*.bN.downsample.{conv,bn}.*``, ``readout.{0,2,4…}``, ``pos_emb``.
    """

    def _a(k):
        v = state[k]
        return np.asarray(v if isinstance(v, np.ndarray) else v.detach().cpu().numpy())

    def conv_kernel(k):
        # torch OIHW → HWIO; depthwise [C,1,3,3] lands as [3,3,1,C] the same way
        return jnp.asarray(_a(k).transpose(2, 3, 1, 0), dtype)

    def norm(prefix):
        return {"scale": jnp.asarray(_a(f"{prefix}.weight"), dtype),
                "bias": jnp.asarray(_a(f"{prefix}.bias"), dtype)}

    def block(prefix):
        p = {
            "conv1": {"kernel": conv_kernel(f"{prefix}.conv1.conv.weight")},
            "norm1": norm(f"{prefix}.conv1.bn"),
            "conv2": {"kernel": conv_kernel(f"{prefix}.conv2.conv.weight")},
            "norm2": norm(f"{prefix}.conv2.bn"),
            "se": {
                "fc1": {
                    "kernel": jnp.asarray(_a(f"{prefix}.se.fc1.weight")[:, :, 0, 0].T, dtype),
                    "bias": jnp.asarray(_a(f"{prefix}.se.fc1.bias"), dtype),
                },
                "fc2": {
                    "kernel": jnp.asarray(_a(f"{prefix}.se.fc2.weight")[:, :, 0, 0].T, dtype),
                    "bias": jnp.asarray(_a(f"{prefix}.se.fc2.bias"), dtype),
                },
            },
            "conv3": {"kernel": conv_kernel(f"{prefix}.conv3.conv.weight")},
            "norm3": norm(f"{prefix}.conv3.bn"),
        }
        if f"{prefix}.downsample.conv.weight" in state:
            p["downsample"] = {
                "conv": {"kernel": conv_kernel(f"{prefix}.downsample.conv.weight")},
                "norm": norm(f"{prefix}.downsample.bn"),
            }
        return p

    params = {
        "s1": [block(f"net.0.b{i + 1}") for i in range(cfg.depth)],
        "s2": [block(f"net.2.b{i + 1}") for i in range(cfg.depth)],
    }
    if "pos_emb" in state:
        params["pos_emb"] = jnp.asarray(_a("pos_emb")[0], dtype)
    readout = []
    idxs = sorted(
        int(m.group(1)) for k in state if (m := re.match(r"^readout\.(\d+)\.weight$", k))
    )
    for i in idxs:
        readout.append({
            "kernel": jnp.asarray(_a(f"readout.{i}.weight").T, dtype),
            "bias": jnp.asarray(_a(f"readout.{i}.bias"), dtype),
        })
    params["readout"] = readout
    return params
