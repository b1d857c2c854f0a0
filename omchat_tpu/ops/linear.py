"""Linear layer helper with int8 weight-only and weight+activation quantization.

Serving features the reference lacks (it relies on fp16 + ``device_map="auto"``
to fit 13B on GPUs, builder.py:22-28):

- **w8 (weight-only)**: per-output-channel int8 weights halve HBM footprint and
  bandwidth; the int8→bf16 convert fuses into the matmul so the MXU runs its
  native bf16 path.  This is what lets the full 13B flagship (ViT-6B +
  Qwen2-7B) serve on a single 16GB TPU chip, and is the right mode for the
  bandwidth-bound decode step.
- **w8a8 (weight + dynamic activation)**: activations quantize per token
  (symmetric, dynamic amax) so the matmul runs int8×int8→int32 on the MXU —
  ~2× the bf16 MXU rate on v5e (394 vs 197 TOP/s peak).  The right mode for
  the compute-bound paths: ViT encode and LLM prefill.  Dequantization is a
  rank-1 rescale (row scales ⊗ column scales) fused into the epilogue by XLA.

A param dict is either
  {"kernel": [in, out], "bias"?}                          — dense
  {"kernel_q": int8 [in, out], "scale": [out], "bias"?}   — quantized
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_activations(x: jax.Array):
    """Dynamic symmetric per-token (last-axis) int8 quantization.

    Returns (x_q int8, row_scale fp32 [..., 1]) with x ≈ x_q * row_scale.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    row_scale = jnp.maximum(amax, 1e-6) / 127.0
    xq = jnp.clip(jnp.round(xf / row_scale), -127, 127).astype(jnp.int8)
    return xq, row_scale


def _dense_w8a8(x: jax.Array, p: dict) -> jax.Array:
    xq, row_scale = quantize_activations(x)
    acc = jax.lax.dot_general(
        xq, p["kernel_q"], (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = (acc.astype(jnp.float32) * row_scale * p["scale"].astype(jnp.float32)).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"]
    return y


def dense_prequant(xq: jax.Array, row_scale: jax.Array, p: dict, dtype=jnp.bfloat16) -> jax.Array:
    """w8a8 matmul over activations already quantized elsewhere (e.g. by the
    fused add_rmsnorm_quant glue kernel): y = (xq @ Wq) * row_scale * w_scale.

    xq: int8 [..., in]; row_scale: fp32 [..., 1]; p: quantized param dict.
    """
    acc = jax.lax.dot_general(
        xq, p["kernel_q"], (((xq.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = (acc.astype(jnp.float32) * row_scale * p["scale"].astype(jnp.float32)).astype(dtype)
    if "bias" in p:
        y = y + p["bias"]
    return y


def dense_prequant_gelu_quant(
    xq: jax.Array, row_scale: jax.Array, p: dict, out_scale: jax.Array
) -> jax.Array:
    """fc1 int8 matmul + tanh-GELU + *static-scale* int8 re-quantization.

    With a calibrated static output scale the re-quantize is purely
    elementwise, so XLA folds dequant→gelu→quant into the matmul's writeback
    and only int8 codes touch HBM — the wide bf16 fc1 intermediate never
    round-trips.  (Dynamic per-token scales need a full-row amax before any
    element can be scaled, which is what forces the unfused path's extra
    ~190MB/layer of traffic at the ViT-6B geometry.)

    xq: int8 [..., in]; row_scale: fp32 input dequant scale; out_scale:
    scalar (or broadcastable) static scale for the gelu output.
    Returns int8 codes; feed to :func:`dense_prequant` with ``out_scale``.
    """
    acc = jax.lax.dot_general(
        xq, p["kernel_q"], (((xq.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    h = acc.astype(jnp.float32) * row_scale * p["scale"].astype(jnp.float32)
    if "bias" in p:
        h = h + p["bias"].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=True)
    return jnp.clip(jnp.round(h / out_scale), -127, 127).astype(jnp.int8)


def dense_prequant_swiglu_quant(
    xq: jax.Array,
    row_scale: jax.Array,
    gate_p: dict,
    up_p: dict,
    out_scale: jax.Array,
) -> jax.Array:
    """SwiGLU int8 matmuls + *static-scale* int8 re-quantization (XLA chain).

    ``codes = int8(silu(xq @ Wg) * (xq @ Wu) / out_scale)`` with all epilogue
    math in fp32 — the static scale makes the re-quantize elementwise so XLA
    can fold it into the matmul writeback and the wide bf16 SwiGLU
    intermediate (~196 MB/layer at the Qwen2-7B prefill shape) never
    round-trips HBM.  Feed the codes to :func:`dense_prequant` (down_proj)
    with ``out_scale``.
    """
    dims = (((xq.ndim - 1,), (0,)), ((), ()))
    accg = jax.lax.dot_general(xq, gate_p["kernel_q"], dims, preferred_element_type=jnp.int32)
    accu = jax.lax.dot_general(xq, up_p["kernel_q"], dims, preferred_element_type=jnp.int32)
    g = accg.astype(jnp.float32) * row_scale * gate_p["scale"].astype(jnp.float32)
    u = accu.astype(jnp.float32) * row_scale * up_p["scale"].astype(jnp.float32)
    h = jax.nn.silu(g) * u
    return jnp.clip(jnp.round(h / out_scale), -127, 127).astype(jnp.int8)


def dense(x: jax.Array, p: dict, *, a8: bool = False) -> jax.Array:
    """y = x @ W (+ bias), transparently dequantizing int8 weights.

    ``a8=True`` additionally quantizes activations per token and runs the
    matmul on the MXU's int8 path (no-op for unquantized params).
    """
    if "kernel_q" in p:
        if a8:
            return _dense_w8a8(x, p)
        w = p["kernel_q"].astype(x.dtype)
        y = (x @ w) * p["scale"].astype(x.dtype)
    else:
        y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def quantize_linear(p: dict) -> dict:
    """Per-output-channel symmetric int8 quantization of a linear param dict.

    Stacked per-layer kernels [L, in, out] get per-(layer, out) scales [L, out]
    — the reduction is over the contraction (in) axis only."""
    if "kernel" not in p:
        return p
    w = p["kernel"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=-2) / 127.0  # [..., out]
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(w / scale[..., None, :]), -127, 127).astype(jnp.int8)
    out = {"kernel_q": q, "scale": scale.astype(jnp.bfloat16)}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantize_tree(params):
    """Quantize every linear param dict in a pytree (dicts holding 'kernel')."""
    if isinstance(params, dict):
        if "kernel" in params and getattr(params["kernel"], "ndim", 0) in (2, 3):
            return quantize_linear(params)
        return {k: quantize_tree(v) for k, v in params.items()}
    return params
