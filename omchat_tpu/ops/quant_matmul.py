"""Pallas int8 matmul with a quantizing tanh-GELU epilogue (the ViT fc1 hot op).

The w8a8 ViT MLP wants ``int8 codes = quant(gelu(dequant(xq @ Wq)))`` with a
*static* output scale so the wide bf16 fc1 intermediate (~190 MB/layer at the
InternViT-6B geometry, reference hot loop modeling_intern_vit.py:179-192)
never round-trips HBM.  XLA fuses the isolated chain well
(`dense_prequant_gelu_quant`, dev/exp_fc1_pallas.py: 2.23 ms vs 2.86 ms for
the bf16-writeback matmul at [5160, 3200]x[3200, 12800]) but recovers only
part of that inside the full encoder graph; this kernel forces the fusion
regardless of surrounding ops: the int32 accumulator is dequantized, biased,
GELU'd, and re-quantized in VMEM and only int8 codes are written back.

Grid layout: ``(N/bn outer, M/bm inner)`` so each [K, bn] weight tile stays
VMEM-resident across the whole M sweep (weights stream once per kernel, not
once per row block).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bm(m: int) -> tuple[int, int]:
    """Largest multiple-of-8 row block <= 512 dividing m (zero pad), else pad
    m up to a 512 multiple.  5160 rows (5 tiles x 1032) -> bm=344, no pad."""
    for bm in range(512, 7, -8):
        if m % bm == 0:
            return bm, m
    return 512, (m + 511) // 512 * 512


def _pick_bn(n: int) -> Optional[int]:
    for bn in (1280, 1024, 896, 768, 640, 512, 384, 256, 128):
        if n % bn == 0:
            return bn
    return None


def pallas_supported(k: int, n: int) -> bool:
    """Geometry gate: contraction axis a lane multiple, N tileable."""
    return k % 128 == 0 and _pick_bn(n) is not None


def _fc1_kernel(x_ref, w_ref, rs_ref, cs_ref, b_ref, os_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = acc.astype(jnp.float32) * rs_ref[...] * cs_ref[...].astype(jnp.float32)
    h = h + b_ref[...].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=True)
    inv = 1.0 / os_ref[0, 0]
    o_ref[...] = jnp.clip(jnp.round(h * inv), -127, 127).astype(jnp.int8)


def dense_prequant_gelu_quant_pallas(
    xq: jax.Array,
    row_scale: jax.Array,
    p: dict,
    out_scale: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Pallas twin of :func:`omchat_tpu.ops.linear.dense_prequant_gelu_quant`
    (same contract; codes match the XLA chain exactly —
    tests/test_pallas_kernels.py).

    xq: int8 [..., K]; row_scale: fp32 [..., 1]; p: quantized param dict with
    ``kernel_q`` [K, N]; out_scale: scalar static scale.  Returns int8 [..., N].
    """
    k, n = p["kernel_q"].shape
    lead = xq.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    xq2 = xq.reshape(m, k)
    rs2 = row_scale.astype(jnp.float32).reshape(m, 1)

    bm, m_pad = _pick_bm(m)
    bn = _pick_bn(n)
    if bn is None or k % 128 != 0:
        raise ValueError(f"unsupported fc1 geometry K={k} N={n} (use the XLA chain)")
    if m_pad != m:
        xq2 = jnp.pad(xq2, ((0, m_pad - m), (0, 0)))
        rs2 = jnp.pad(rs2, ((0, m_pad - m), (0, 0)))

    cs = p["scale"].astype(jnp.float32)[None]  # [1, N]
    bias = p.get("bias")
    bias = (jnp.zeros((n,), jnp.float32) if bias is None else bias.astype(jnp.float32))[None]
    os_ = jnp.asarray(out_scale, jnp.float32).reshape(1, 1)

    out = pl.pallas_call(
        _fc1_kernel,
        grid=(n // bn, m_pad // bm),
        in_specs=[
            pl.BlockSpec((bm, k), lambda j, i: (i, 0)),
            pl.BlockSpec((k, bn), lambda j, i: (0, j)),
            pl.BlockSpec((bm, 1), lambda j, i: (i, 0)),
            pl.BlockSpec((1, bn), lambda j, i: (0, j)),
            pl.BlockSpec((1, bn), lambda j, i: (0, j)),
            pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, i: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(xq2, p["kernel_q"], rs2, cs, bias, os_)
    return out[:m].reshape(*lead, n)


def _swiglu_kernel(x_ref, wg_ref, wu_ref, rs_ref, csg_ref, csu_ref, os_ref, o_ref):
    dims = (((1,), (0,)), ((), ()))
    accg = jax.lax.dot_general(x_ref[...], wg_ref[...], dims, preferred_element_type=jnp.int32)
    accu = jax.lax.dot_general(x_ref[...], wu_ref[...], dims, preferred_element_type=jnp.int32)
    rs = rs_ref[...]
    g = accg.astype(jnp.float32) * rs * csg_ref[...].astype(jnp.float32)
    u = accu.astype(jnp.float32) * rs * csu_ref[...].astype(jnp.float32)
    h = jax.nn.silu(g) * u
    inv = 1.0 / os_ref[0, 0]
    o_ref[...] = jnp.clip(jnp.round(h * inv), -127, 127).astype(jnp.int8)


def dense_prequant_swiglu_quant_pallas(
    xq: jax.Array,
    row_scale: jax.Array,
    gate_p: dict,
    up_p: dict,
    out_scale: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Pallas twin of :func:`omchat_tpu.ops.linear.dense_prequant_swiglu_quant`
    (the w8a8 LLM MLP hot op): both int8 matmuls + fp32 silu·mul + static-scale
    re-quantize run in VMEM; only int8 codes are written back.  Grid
    ``(N/bn, M/bm)`` keeps each pair of [K, bn] weight tiles resident across
    the M sweep."""
    k, n = gate_p["kernel_q"].shape
    lead = xq.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    xq2 = xq.reshape(m, k)
    rs2 = row_scale.astype(jnp.float32).reshape(m, 1)

    bm, m_pad = _pick_bm(m)
    bn = _pick_bn(n)
    if bn is None or k % 128 != 0:
        raise ValueError(f"unsupported swiglu geometry K={k} N={n} (use the XLA chain)")
    if m_pad != m:
        xq2 = jnp.pad(xq2, ((0, m_pad - m), (0, 0)))
        rs2 = jnp.pad(rs2, ((0, m_pad - m), (0, 0)))

    csg = gate_p["scale"].astype(jnp.float32)[None]
    csu = up_p["scale"].astype(jnp.float32)[None]
    os_ = jnp.asarray(out_scale, jnp.float32).reshape(1, 1)

    out = pl.pallas_call(
        _swiglu_kernel,
        grid=(n // bn, m_pad // bm),
        in_specs=[
            pl.BlockSpec((bm, k), lambda j, i: (i, 0)),
            pl.BlockSpec((k, bn), lambda j, i: (0, j)),
            pl.BlockSpec((k, bn), lambda j, i: (0, j)),
            pl.BlockSpec((bm, 1), lambda j, i: (i, 0)),
            pl.BlockSpec((1, bn), lambda j, i: (0, j)),
            pl.BlockSpec((1, bn), lambda j, i: (0, j)),
            pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, i: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(xq2, gate_p["kernel_q"], up_p["kernel_q"], rs2, csg, csu, os_)
    return out[:m].reshape(*lead, n)


def swiglu_quant(
    xq: jax.Array,
    row_scale: jax.Array,
    gate_p: dict,
    up_p: dict,
    out_scale: jax.Array,
    *,
    impl: Optional[str] = None,
    interpret: bool = False,
) -> jax.Array:
    """Dispatch the static-scale quantizing SwiGLU epilogue (auto: Pallas when
    the geometry supports it on TPU or in interpret mode, XLA chain otherwise)."""
    from omchat_tpu.ops.linear import dense_prequant_swiglu_quant

    if impl is None:
        impl = (
            "pallas"
            if (interpret or jax.default_backend() == "tpu")
            and pallas_supported(*gate_p["kernel_q"].shape)
            else "xla"
        )
    if impl == "pallas":
        return dense_prequant_swiglu_quant_pallas(
            xq, row_scale, gate_p, up_p, out_scale, interpret=interpret
        )
    return dense_prequant_swiglu_quant(xq, row_scale, gate_p, up_p, out_scale)


def _proj_glue_kernel(a_ref, x_ref, w_ref, cs_ref, b_ref, ls_ref, g_ref,
                      xo_ref, q_ref, rs_ref, *, eps):
    """quantize(a) @ Wq → dequant+bias → residual+LayerScale → RMSNorm → int8."""
    # dynamic per-row activation quantization (mirrors quantize_activations)
    a = a_ref[...].astype(jnp.float32)
    amax = jnp.max(jnp.abs(a), axis=1, keepdims=True)
    sa = jnp.maximum(amax, 1e-6) / 127.0
    aq = jnp.clip(jnp.round(a / sa), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        aq, w_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    # mirror _dense_w8a8's roundings: bf16 cast, then bf16 bias add
    y = (acc.astype(jnp.float32) * sa * cs_ref[...].astype(jnp.float32)).astype(
        xo_ref.dtype
    )
    y = y + b_ref[...]
    # glue (mirrors _add_rmsnorm_quant_kernel)
    xf = x_ref[...].astype(jnp.float32) + y.astype(jnp.float32) * ls_ref[...].astype(
        jnp.float32
    )
    xn = xf.astype(xo_ref.dtype)
    xo_ref[...] = xn
    xf = xn.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=1, keepdims=True)
    n = xf * jax.lax.rsqrt(var + eps) * g_ref[...].astype(jnp.float32)
    nmax = jnp.max(jnp.abs(n), axis=1, keepdims=True)
    rs = jnp.maximum(nmax, 1e-6) / 127.0
    q_ref[...] = jnp.clip(jnp.round(n / rs), -127, 127).astype(jnp.int8)
    rs_ref[...] = rs


def proj_glue_supported(k: int, n: int) -> bool:
    """The fused proj+glue kernel keeps the whole [K, N] int8 weight
    VMEM-resident across the M sweep — gate on a square lane-aligned weight
    that fits the (raised) VMEM budget (InternViT-6B proj: 3200^2 = 9.8 MB,
    Qwen2-7B o_proj: 3584^2 = 12.9 MB; v5e has 128 MiB VMEM and the kernel
    asks for a 64 MB scoped limit)."""
    return k == n and k % 128 == 0 and k * n <= 4096 * 4096


def attn_proj_glue_quant(
    attn_out: jax.Array,
    x: jax.Array,
    p: dict,
    ls: jax.Array,
    gamma: jax.Array,
    eps: float = 1e-6,
    *,
    interpret: bool = False,
):
    """Fused ``dense(attn_out, p, a8=True)`` + ``add_rmsnorm_quant`` — the
    attention-proj glue point of the w8a8 ViT scan.

    The unfused chain writes the bf16 proj output to HBM (33 MB at the 5-tile
    6B shape) and reads it straight back in the glue kernel; here the proj
    weight (square, int8, VMEM-resident via a constant index_map) rides one
    kernel with dynamic row quantization, dequant+bias, residual+LayerScale,
    RMSNorm and re-quantization, so only x' (bf16), codes (int8) and row
    scales reach HBM.  Measured 1.77 vs 2.38 ms standalone at [5160, 3200]
    (dev/exp_proj_glue.py).  Matches the chain to ≤1 int8 code; x' can differ
    by one bf16 ulp (fp32 association of the dequant rescale differs from
    XLA's fusion, occasionally flipping a bf16 rounding boundary).

    Returns (x_new [..., D], codes int8 [..., D], row_scale fp32 [..., 1]).
    """
    k, n = p["kernel_q"].shape
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    a2 = attn_out.reshape(m, k)
    x2 = x.reshape(m, n)

    bm = 128
    m_pad = (m + bm - 1) // bm * bm
    if m_pad != m:
        a2 = jnp.pad(a2, ((0, m_pad - m), (0, 0)))
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    cs = p["scale"].astype(jnp.float32)[None]
    bias = p.get("bias")
    bias = (jnp.zeros((n,), x.dtype) if bias is None else bias.astype(x.dtype))[None]

    kernel = functools.partial(_proj_glue_kernel, eps=eps)
    xn, q, rs = pl.pallas_call(
        kernel,
        grid=(m_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((bm, n), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),  # resident weight
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, n), lambda i: (i, 0)),
            pl.BlockSpec((bm, n), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, n), x.dtype),
            jax.ShapeDtypeStruct((m_pad, n), jnp.int8),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # resident weight + fp32 row-block temps exceed the 16 MB scoped
            # default at the 3584^2 o_proj geometry
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(a2, x2, p["kernel_q"], cs, bias, ls.reshape(1, n), gamma.reshape(1, n))
    return (
        xn[:m].reshape(*lead, n),
        q[:m].reshape(*lead, n),
        rs[:m].reshape(*lead, 1),
    )


def fc1_gelu_quant(
    xq: jax.Array,
    row_scale: jax.Array,
    p: dict,
    out_scale: jax.Array,
    *,
    impl: Optional[str] = None,
    interpret: bool = False,
) -> jax.Array:
    """Dispatch the static-scale quantizing fc1 epilogue.

    impl: ``"pallas"`` | ``"xla"`` | None (auto: Pallas when the geometry
    supports it and we're on TPU — or in interpret mode, so CPU glue-path
    tests exercise the production kernel — the XLA chain otherwise).
    """
    from omchat_tpu.ops.linear import dense_prequant_gelu_quant

    if impl is None:
        impl = (
            "pallas"
            if (interpret or jax.default_backend() == "tpu")
            and pallas_supported(*p["kernel_q"].shape)
            else "xla"
        )
    if impl == "pallas":
        return dense_prequant_gelu_quant_pallas(
            xq, row_scale, p, out_scale, interpret=interpret
        )
    return dense_prequant_gelu_quant(xq, row_scale, p, out_scale)
