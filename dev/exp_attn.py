"""Packed ViT attention kernel variants, timed at the 13B 5-tile shape.

Chains 45 applications (output feeds back as q) to time the kernel at
in-graph conditions: [5, 1032, 25*128], valid_len=1025.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from omchat_tpu.ops.flash_attention import packed_self_attention

import os

B, SP, H, D = 5, 1032, int(os.environ.get("EXP_H", "25")), 128
VALID = 1025
LAYERS = 45


def _sync(x):
    return float(jnp.ravel(x)[0])


# --- V2: prescaled q (scale folded outside), exp2, shared bf16 p ------------


def _kernel_v2(q_ref, k_ref, v_ref, o_ref, *, valid_len: int):
    sp = q_ref.shape[1]
    # q arrives pre-scaled by D**-0.5 * log2(e); use exp2.
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if valid_len < sp:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < valid_len, s, -jnp.inf)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m).astype(v_ref.dtype)  # one bf16 p for both dots
    l_inv = 1.0 / jax.lax.dot(
        p, jnp.ones((sp, 1), v_ref.dtype), preferred_element_type=jnp.float32
    )
    o = jax.lax.dot(p, v_ref[0], preferred_element_type=jnp.float32)
    o_ref[0] = (o * l_inv).astype(o_ref.dtype)


def packed_v2(q, k, v):
    scale = (D**-0.5) * 1.4426950408889634
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)  # fuses into producer
    kernel = functools.partial(_kernel_v2, valid_len=VALID)
    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[pl.BlockSpec((1, SP, D), lambda b, h: (b, 0, h))] * 3,
        out_specs=pl.BlockSpec((1, SP, D), lambda b, h: (b, 0, h)),
        out_shape=jax.ShapeDtypeStruct((B, SP, H * D), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
    )(q, k, v)


# --- V3: like V2 but fp32 p for the l dot (current numerics) ----------------


def _kernel_v3(q_ref, k_ref, v_ref, o_ref, *, valid_len: int):
    sp = q_ref.shape[1]
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if valid_len < sp:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < valid_len, s, -jnp.inf)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    l_inv = 1.0 / jax.lax.dot(p, jnp.ones((sp, 1), jnp.float32), preferred_element_type=jnp.float32)
    o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32)
    o_ref[0] = (o * l_inv).astype(o_ref.dtype)


def packed_v3(q, k, v):
    scale = (D**-0.5) * 1.4426950408889634
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    kernel = functools.partial(_kernel_v3, valid_len=VALID)
    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[pl.BlockSpec((1, SP, D), lambda b, h: (b, 0, h))] * 3,
        out_specs=pl.BlockSpec((1, SP, D), lambda b, h: (b, 0, h)),
        out_shape=jax.ShapeDtypeStruct((B, SP, H * D), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
    )(q, k, v)


# --- V4: V2 + no explicit l matmul: append ones into PV via 2-output trick --
# (l computed by VPU row-sum of bf16 p)


def _kernel_v4(q_ref, k_ref, v_ref, o_ref, *, valid_len: int):
    sp = q_ref.shape[1]
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if valid_len < sp:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < valid_len, s, -jnp.inf)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    l_inv = 1.0 / jnp.sum(p, axis=1, keepdims=True)  # VPU cross-lane reduce
    o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32)
    o_ref[0] = (o * l_inv).astype(o_ref.dtype)


def packed_v4(q, k, v):
    scale = (D**-0.5) * 1.4426950408889634
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    kernel = functools.partial(_kernel_v4, valid_len=VALID)
    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[pl.BlockSpec((1, SP, D), lambda b, h: (b, 0, h))] * 3,
        out_specs=pl.BlockSpec((1, SP, D), lambda b, h: (b, 0, h)),
        out_shape=jax.ShapeDtypeStruct((B, SP, H * D), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
    )(q, k, v)


# --- V5: v4 + tail-slice mask (touch only the padded columns) ---------------


def _kernel_v5(q_ref, k_ref, v_ref, o_ref, *, valid_len: int):
    sp = q_ref.shape[1]
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if valid_len < sp:
        tail_lo = (valid_len // 128) * 128  # lane-tile-aligned tail start
        tail = jax.lax.dynamic_slice(s, (0, tail_lo), (sp, sp - tail_lo))
        col = jax.lax.broadcasted_iota(jnp.int32, tail.shape, 1) + tail_lo
        tail = jnp.where(col < valid_len, tail, -jnp.inf)
        s = jax.lax.dynamic_update_slice(s, tail, (0, tail_lo))
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    l_inv = 1.0 / jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32)
    o_ref[0] = (o * l_inv).astype(o_ref.dtype)


def packed_v5(q, k, v):
    scale = (D**-0.5) * 1.4426950408889634
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    kernel = functools.partial(_kernel_v5, valid_len=VALID)
    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[pl.BlockSpec((1, SP, D), lambda b, h: (b, 0, h))] * 3,
        out_specs=pl.BlockSpec((1, SP, D), lambda b, h: (b, 0, h)),
        out_shape=jax.ShapeDtypeStruct((B, SP, H * D), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
    )(q, k, v)


# --- V6: v4 + two heads per grid step (halve launch count) ------------------


def _kernel_v6(q_ref, k_ref, v_ref, o_ref, *, valid_len: int):
    sp = q_ref.shape[1]
    for h0 in (0, D):
        q = q_ref[0, :, h0:h0 + D]
        k = k_ref[0, :, h0:h0 + D]
        v = v_ref[0, :, h0:h0 + D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if valid_len < sp:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < valid_len, s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        l_inv = 1.0 / jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[0, :, h0:h0 + D] = (o * l_inv).astype(o_ref.dtype)


def packed_v6(q, k, v):
    if H % 2:
        raise ValueError("even head count required")
    scale = (D**-0.5) * 1.4426950408889634
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    kernel = functools.partial(_kernel_v6, valid_len=VALID)
    return pl.pallas_call(
        kernel,
        grid=(B, H // 2),
        in_specs=[pl.BlockSpec((1, SP, 2 * D), lambda b, h: (b, 0, h))] * 3,
        out_specs=pl.BlockSpec((1, SP, 2 * D), lambda b, h: (b, 0, h)),
        out_shape=jax.ShapeDtypeStruct((B, SP, H * D), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
    )(q, k, v)


# --- V7: v4 + additive bias-row mask (one broadcast add vs iota+cmp+select) --


def _kernel_v7(q_ref, k_ref, v_ref, bias_ref, o_ref):
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s + bias_ref[...]  # [1, SP] broadcast: -inf on pad columns
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    l_inv = 1.0 / jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32)
    o_ref[0] = (o * l_inv).astype(o_ref.dtype)


def packed_v7(q, k, v):
    scale = (D**-0.5) * 1.4426950408889634
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    bias = jnp.where(jnp.arange(SP) < VALID, 0.0, -jnp.inf).astype(jnp.float32)[None]
    return pl.pallas_call(
        _kernel_v7,
        grid=(B, H),
        in_specs=[pl.BlockSpec((1, SP, D), lambda b, h: (b, 0, h))] * 3
        + [pl.BlockSpec((1, SP), lambda b, h: (0, 0))],
        out_specs=pl.BlockSpec((1, SP, D), lambda b, h: (b, 0, h)),
        out_shape=jax.ShapeDtypeStruct((B, SP, H * D), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
    )(q, k, v, bias)


# --- harness -----------------------------------------------------------------


def chain(fn):
    def run(q, k, v):
        def body(i, q):
            return fn(q, k, v)

        return jax.lax.fori_loop(0, LAYERS, body, q)

    return run


def baseline(q, k, v):
    return packed_self_attention(q, k, v, num_heads=H, valid_len=VALID)


def xla_sdpa(q, k, v):
    qh = q.reshape(B, SP, H, D)
    kh = k.reshape(B, SP, H, D)
    vh = v.reshape(B, SP, H, D)
    mask = (jnp.arange(SP) < VALID)[None, None, None, :]
    o = jax.nn.dot_product_attention(qh, kh, vh, mask=mask)
    return o.reshape(B, SP, H * D)


def main():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, SP, H * D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, SP, H * D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, SP, H * D), jnp.bfloat16)

    if os.environ.get("EXP_V7_ONLY"):
        variants = [("v4 exp2+vpu-rowsum", packed_v4), ("v7 bias-row mask", packed_v7)]
    elif os.environ.get("EXP_V6_ONLY"):
        if H % 2:
            sys.exit(f"v6 needs an even head count; run with EXP_H=24 (got H={H})")
        variants = [("v4 exp2+vpu-rowsum", packed_v4), ("v6 two-heads/step", packed_v6)]
    else:
        variants = [
            ("baseline packed", baseline),
            ("v2 exp2+bf16p", packed_v2),
            ("v3 exp2+fp32l", packed_v3),
            ("v4 exp2+vpu-rowsum", packed_v4),
            ("v5 v4+tailmask", packed_v5),
            ("xla sdpa", xla_sdpa),
        ]
    ref = None
    for name, fn in variants:
        one = jax.jit(fn)(q, k, v)
        _sync(one)
        if ref is None:
            ref = np.asarray(one[:, :VALID]).astype(np.float32)
            err = 0.0
        else:
            cur = np.asarray(one[:, :VALID]).astype(np.float32)
            err = float(np.abs(cur - ref).max() / (np.abs(ref).max() + 1e-9))
        f = jax.jit(chain(fn))
        out = f(q, k, v)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(q, k, v)
        _sync(out)
        dt = (time.perf_counter() - t0) / 5 / LAYERS * 1000
        print(f"{name:22s} {dt:7.3f} ms/layer   max-rel-err vs baseline {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
