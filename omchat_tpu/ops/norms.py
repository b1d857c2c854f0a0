"""Normalization ops.

RMSNorm matches the reference semantics exactly: statistics in float32, output
cast back to the input dtype (reference: modeling_intern_vit.py:33-44 InternRMSNorm,
HF Qwen2RMSNorm).  XLA fuses these into neighboring ops — the TPU-native
equivalent of the reference's apex/flash-attn FusedRMSNorm (SURVEY.md §2.2).

``add_rmsnorm_quant`` is the w8a8 serving-mode "block glue" kernel: residual
add + LayerScale + RMSNorm + per-token int8 quantization in one VMEM-resident
pass.  XLA runs this chain as three HBM passes (residual fusion, norm stats,
norm+quant codes); fusing them reads x and delta once and writes the new
residual plus the int8 codes — ~130MB/layer less HBM traffic at the ViT-6B
5-tile shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def rms_norm(x: jax.Array, scale: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm over the last axis; fp32 statistics, output in x.dtype."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (scale.astype(jnp.float32) * xf).astype(dtype)


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-6) -> jax.Array:
    """LayerNorm over the last axis; fp32 statistics (InternViT-300M norm_type)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def apply_norm(x: jax.Array, params: dict, eps: float = 1e-6) -> jax.Array:
    """Dispatch on the param dict: {'scale'} → RMSNorm, {'scale','bias'} → LayerNorm."""
    if "bias" in params:
        return layer_norm(x, params["scale"], params["bias"], eps)
    return rms_norm(x, params["scale"], eps)


# ---------------------------------------------------------------------------
# Fused residual + RMSNorm + int8 quantize (w8a8 serving glue)
# ---------------------------------------------------------------------------


def _add_rmsnorm_quant_kernel(x_ref, d_ref, ls_ref, g_ref, xn_ref, q_ref, rs_ref, *, eps):
    # Match the unfused XLA chain bit-for-bit: XLA fuses x + delta*ls in fp32
    # with a single rounding to the storage dtype; the norm then reads the
    # rounded value back.
    xf = x_ref[...].astype(jnp.float32) + d_ref[...].astype(jnp.float32) * ls_ref[...].astype(
        jnp.float32
    )
    xn = xf.astype(xn_ref.dtype)
    xn_ref[...] = xn
    xf = xn.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=1, keepdims=True)
    # Quantize the fp32 normalized value directly.  (The unfused chain rounds
    # the norm output to bf16 before quantizing; skipping that intermediate
    # rounding is strictly more accurate and moves <7% of int8 codes by ±1.)
    n = xf * jax.lax.rsqrt(var + eps) * g_ref[...].astype(jnp.float32)
    amax = jnp.max(jnp.abs(n), axis=1, keepdims=True)
    rs = jnp.maximum(amax, 1e-6) / 127.0
    q_ref[...] = jnp.clip(jnp.round(n / rs), -127, 127).astype(jnp.int8)
    rs_ref[...] = rs


def _row_block(rows: int) -> int:
    """Largest multiple-of-8 divisor of ``rows`` that is ≤ 128 (VMEM-friendly)."""
    for cand in range(min(rows, 128), 7, -1):
        if cand % 8 == 0 and rows % cand == 0:
            return cand
    return rows  # tiny inputs: single block


def _rmsnorm_quant_kernel(x_ref, g_ref, q_ref, rs_ref, *, eps):
    xf = x_ref[...].astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=1, keepdims=True)
    # Quantize the fp32 normalized value directly (same intentional skip of
    # the bf16 intermediate rounding as _add_rmsnorm_quant_kernel).
    n = xf * jax.lax.rsqrt(var + eps) * g_ref[...].astype(jnp.float32)
    amax = jnp.max(jnp.abs(n), axis=1, keepdims=True)
    rs = jnp.maximum(amax, 1e-6) / 127.0
    q_ref[...] = jnp.clip(jnp.round(n / rs), -127, 127).astype(jnp.int8)
    rs_ref[...] = rs


def rmsnorm_quant(
    x: jax.Array,
    gamma: jax.Array,
    eps: float = 1e-6,
    *,
    interpret: bool = False,
):
    """Fused ``codes = int8(rms_norm(x, gamma))`` — the norm + per-token
    activation quantization at the top of a w8a8 block, written as one pass so
    only int8 codes (not the bf16 normed activations) reach HBM.

    Returns (codes [..., D] int8, row_scale [..., 1] fp32), matching
    ``quantize_activations(rms_norm(x, gamma, eps))`` up to ±1 int8 code.
    """
    shape = x.shape
    d = shape[-1]
    rows = 1
    for s in shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)
    bm = 128
    rows_pad = (rows + bm - 1) // bm * bm
    if rows_pad != rows:
        x2 = jnp.pad(x2, ((0, rows_pad - rows), (0, 0)))

    kernel = functools.partial(_rmsnorm_quant_kernel, eps=eps)
    codes, rs = pl.pallas_call(
        kernel,
        grid=(rows_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm, d), lambda r: (r, 0)),
            pl.BlockSpec((1, d), lambda r: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, d), lambda r: (r, 0)),
            pl.BlockSpec((bm, 1), lambda r: (r, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad, d), jnp.int8),
            jax.ShapeDtypeStruct((rows_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x2, gamma.reshape(1, d))
    return (
        codes[:rows].reshape(shape),
        rs[:rows].reshape(shape[:-1] + (1,)),
    )


def add_rmsnorm_quant(
    x: jax.Array,
    delta: jax.Array,
    ls: jax.Array,
    gamma: jax.Array,
    eps: float = 1e-6,
    *,
    interpret: bool = False,
):
    """Fused ``x_new = x + delta*ls; codes = int8(rms_norm(x_new)*gamma)``.

    Args:
      x, delta: [..., D] residual stream and branch output (same shape/dtype).
      ls: [D] LayerScale vector (pass ones for plain residuals).
      gamma: [D] RMSNorm scale of the NEXT norm in the chain.

    Returns (x_new [..., D] x.dtype, codes [..., D] int8, row_scale [..., 1] fp32),
    matching ``quantize_activations(rms_norm(x + delta*ls, gamma, eps))`` up to
    ±1 int8 code and one bf16 ulp of row_scale — the kernel intentionally
    skips the unfused chain's bf16 intermediate rounding.
    """
    shape = x.shape
    d = shape[-1]
    rows = 1
    for s in shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)
    d2 = delta.reshape(rows, d)
    ls2 = ls.reshape(1, d)
    g2 = gamma.reshape(1, d)
    sb = _row_block(rows)

    kernel = functools.partial(_add_rmsnorm_quant_kernel, eps=eps)
    xn, codes, rs = pl.pallas_call(
        kernel,
        grid=(rows // sb,),
        in_specs=[
            pl.BlockSpec((sb, d), lambda r: (r, 0)),
            pl.BlockSpec((sb, d), lambda r: (r, 0)),
            pl.BlockSpec((1, d), lambda r: (0, 0)),
            pl.BlockSpec((1, d), lambda r: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((sb, d), lambda r: (r, 0)),
            pl.BlockSpec((sb, d), lambda r: (r, 0)),
            pl.BlockSpec((sb, 1), lambda r: (r, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), x.dtype),
            jax.ShapeDtypeStruct((rows, d), jnp.int8),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x2, d2, ls2, g2)
    return (
        xn.reshape(shape),
        codes.reshape(shape),
        rs.reshape(shape[:-1] + (1,)),
    )
