"""Pallas kernel correctness vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omchat_tpu.ops.attention import _xla_attention
from omchat_tpu.ops.decode_attention import flash_decode
from omchat_tpu.ops.flash_attention import flash_attention


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def test_noncausal_matches_xla(rng):
    """ViT-style: S == T, no masking beyond the (padded) length."""
    B, S, H, D = 2, 130, 4, 128  # 130 exercises the padded remainder
    q, k, v = _rand(rng, B, S, H, D), _rand(rng, B, S, H, D), _rand(rng, B, S, H, D)
    ref = _xla_attention(q, k, v, causal=False, q_offset=None, kv_len=None)
    out = flash_attention(q, k, v, causal=False, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_causal_matches_xla(rng):
    B, S, H, D = 1, 200, 2, 128
    q, k, v = _rand(rng, B, S, H, D), _rand(rng, B, S, H, D), _rand(rng, B, S, H, D)
    ref = _xla_attention(q, k, v, causal=True, q_offset=None, kv_len=None)
    out = flash_attention(q, k, v, causal=True, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_gqa_with_lengths_and_offset(rng):
    """Prefill-against-cache shape: kv longer than q, per-batch offset + kv_len."""
    B, S, T, H, KVH, D = 2, 64, 256, 4, 2, 128
    q = _rand(rng, B, S, H, D)
    k, v = _rand(rng, B, T, KVH, D), _rand(rng, B, T, KVH, D)
    q_offset = jnp.asarray([32, 64], jnp.int32)
    kv_len = jnp.asarray([96, 128], jnp.int32)
    ref = _xla_attention(q, k, v, causal=True, q_offset=q_offset, kv_len=kv_len)
    out = flash_attention(
        q, k, v, causal=True, q_offset=q_offset, kv_len=kv_len,
        block_q=64, block_k=128, interpret=True,
    )
    # Only rows within the valid region are meaningful; rows beyond kv_len have
    # fully-masked score rows in both impls but may differ in garbage content.
    for b in range(B):
        valid_rows = int(kv_len[b]) - int(q_offset[b])
        np.testing.assert_allclose(
            np.asarray(out)[b, :valid_rows], np.asarray(ref)[b, :valid_rows], atol=2e-5, rtol=1e-4
        )


def test_bntd_kv_format(rng):
    B, S, T, H, KVH, D = 1, 128, 256, 4, 2, 128
    q = _rand(rng, B, S, H, D)
    k, v = _rand(rng, B, KVH, T, D), _rand(rng, B, KVH, T, D)
    kv_len = jnp.asarray([200], jnp.int32)
    ref = _xla_attention(
        q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        causal=True, q_offset=jnp.asarray([72]), kv_len=kv_len,
    )
    out = flash_attention(
        q, k, v, causal=True, q_offset=jnp.asarray([72]), kv_len=kv_len,
        kv_format="bntd", block_q=128, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_decode_matches_xla(rng):
    B, H, KVH, D, T = 2, 28, 4, 128, 384
    q = _rand(rng, B, 1, H, D)
    k = _rand(rng, B, KVH, T, D)
    v = _rand(rng, B, KVH, T, D)
    lengths = jnp.asarray([137, 384], jnp.int32)
    ref = _xla_attention(
        q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        causal=False, q_offset=None, kv_len=lengths,
    )
    out = flash_decode(q, k, v, lengths, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_decode_group_not_multiple_of_8(rng):
    """G = H/KVH = 7 (Qwen2-7B) exercises sublane padding."""
    B, H, KVH, D, T = 1, 28, 4, 128, 128
    q = _rand(rng, B, 1, H, D)
    k = _rand(rng, B, KVH, T, D)
    v = _rand(rng, B, KVH, T, D)
    lengths = jnp.asarray([100], jnp.int32)
    ref = _xla_attention(
        q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        causal=False, q_offset=None, kv_len=lengths,
    )
    out = flash_decode(q, k, v, lengths, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_segment_ids_pallas_matches_xla(rng):
    """Pallas varlen packing (scalar-prefetched kv-block windows) == XLA
    segment-ids path — causal and non-causal, multiple kv blocks, padding."""
    B, S, H, D = 2, 384, 2, 128
    q, k, v = (_rand(rng, B, S, H, D) for _ in range(3))
    # batch 0: 3 docs + pad; batch 1: one doc + long pad
    seg = np.full((B, S), -1, np.int32)
    seg[0, :100] = 0
    seg[0, 100:260] = 1
    seg[0, 260:300] = 2
    seg[1, :180] = 0
    seg = jnp.asarray(seg)
    kv_len = jnp.asarray([300, 180], jnp.int32)

    for causal in (False, True):
        ref = _xla_attention(
            q, k, v, causal=causal, q_offset=jnp.zeros(2, jnp.int32) if causal else None,
            kv_len=kv_len, segment_ids=seg,
        )
        out = flash_attention(
            q, k, v, causal=causal, segment_ids=seg,
            block_q=128, block_k=128, interpret=True,
        )
        # valid rows only (pad rows are garbage in both impls)
        for b, n in enumerate([300, 180]):
            np.testing.assert_allclose(
                np.asarray(out)[b, :n], np.asarray(ref)[b, :n], atol=2e-5, rtol=1e-4,
                err_msg=f"causal={causal} b={b}",
            )


def test_segment_ids_mismatched_block_padding(rng):
    """Regression: block_q != block_k pads the sequence to different extents
    (s_pad != t_pad); the segment arrays must be padded per tiling or the
    per-block stats reshape crashes at trace time."""
    B, S, H, D = 1, 200, 2, 128  # s_pad=256 (bq=128) vs t_pad=384 (bk=192)
    q, k, v = (_rand(rng, B, S, H, D) for _ in range(3))
    seg = np.full((B, S), -1, np.int32)
    seg[0, :90] = 0
    seg[0, 90:170] = 1
    seg = jnp.asarray(seg)
    ref = _xla_attention(
        q, k, v, causal=True, q_offset=jnp.zeros(1, jnp.int32),
        kv_len=jnp.asarray([170]), segment_ids=seg,
    )
    out = flash_attention(
        q, k, v, causal=True, segment_ids=seg, block_q=128, block_k=192, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out)[0, :170], np.asarray(ref)[0, :170], atol=2e-5, rtol=1e-4
    )


def test_segment_ids_pallas_matches_unpacked(rng):
    """Two packed documents behave exactly like two separate rows."""
    B, S, H, D = 1, 256, 2, 128
    q, k, v = (_rand(rng, B, S, H, D) for _ in range(3))
    seg = jnp.asarray(np.concatenate([np.zeros(150, np.int32), np.ones(106, np.int32)])[None])

    packed = flash_attention(
        q, k, v, causal=True, segment_ids=seg, block_q=128, block_k=128, interpret=True
    )
    doc0 = _xla_attention(
        q[:, :150], k[:, :150], v[:, :150], causal=True, q_offset=None, kv_len=None
    )
    doc1 = _xla_attention(
        q[:, 150:], k[:, 150:], v[:, 150:], causal=True, q_offset=None, kv_len=None
    )
    np.testing.assert_allclose(np.asarray(packed[:, :150]), np.asarray(doc0), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(packed[:, 150:]), np.asarray(doc1), atol=2e-5, rtol=1e-4)


def test_packed_self_attention_matches_xla(rng):
    """ViT fast path: packed [B, SP, H*D] lane-sliced heads, pad-row masking."""
    from omchat_tpu.ops.flash_attention import packed_self_attention

    B, S, H, D = 2, 120, 3, 128
    SP = 128  # padded to a multiple of 64 by the caller
    q, k, v = (_rand(rng, B, S, H, D) for _ in range(3))
    ref = _xla_attention(q, k, v, causal=False, q_offset=None, kv_len=None)

    def pack(a):
        flat = a.reshape(B, S, H * D)
        return jnp.pad(flat, ((0, 0), (0, SP - S), (0, 0)))

    out = packed_self_attention(
        pack(q), pack(k), pack(v), num_heads=H, valid_len=S, interpret=True
    )
    out = out[:, :S].reshape(B, S, H, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_packed_self_attention_no_padding(rng):
    from omchat_tpu.ops.flash_attention import packed_self_attention

    B, S, H, D = 1, 64, 2, 128
    q, k, v = (_rand(rng, B, S, H, D) for _ in range(3))
    ref = _xla_attention(q, k, v, causal=False, q_offset=None, kv_len=None)
    out = packed_self_attention(
        q.reshape(B, S, H * D), k.reshape(B, S, H * D), v.reshape(B, S, H * D),
        num_heads=H, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out.reshape(B, S, H, D)), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


def test_packed_qkv_norm_attention_matches_split_path(rng):
    """Folding qk-RMSNorm into the packed kernel == norm-then-attend: the
    rstd stats are computed over the flattened head axis outside, applied
    per head-slice inside (the InternViT-6B attention contract,
    modeling_intern_vit.py:143-146)."""
    from omchat_tpu.ops.flash_attention import (
        packed_prescale,
        packed_qkv_norm_attention,
        packed_self_attention,
    )
    from omchat_tpu.ops.norms import rms_norm

    B, S, H, D = 2, 56, 3, 128
    SP, eps = 64, 1e-6
    qkv = jnp.asarray(rng.standard_normal((B, SP, 3 * H * D)).astype(np.float32), jnp.bfloat16)
    qg = jnp.asarray(1.0 + 0.1 * rng.standard_normal(H * D).astype(np.float32), jnp.bfloat16)
    kg = jnp.asarray(1.0 - 0.1 * rng.standard_normal(H * D).astype(np.float32), jnp.bfloat16)

    q, k, v = jnp.split(qkv, 3, axis=-1)
    ref = packed_self_attention(
        rms_norm(q, qg * packed_prescale(D), eps),
        rms_norm(k, kg, eps),
        v,
        num_heads=H,
        valid_len=S,
        prescaled=True,
        interpret=True,
    )
    out = packed_qkv_norm_attention(
        qkv,
        num_heads=H,
        q_gamma=qg * packed_prescale(D),
        k_gamma=kg,
        eps=eps,
        valid_len=S,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out[:, :S], np.float32), np.asarray(ref[:, :S], np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_fc1_gelu_quant_pallas_matches_xla_chain(rng):
    """The quantizing fc1 epilogue kernel writes the same int8 codes as the
    XLA chain (dense_prequant_gelu_quant) — same fp32 dequant/GELU/requant
    math, just fused into the matmul writeback (ops/quant_matmul.py)."""
    from omchat_tpu.ops.linear import dense_prequant_gelu_quant
    from omchat_tpu.ops.quant_matmul import dense_prequant_gelu_quant_pallas

    M, K, N = 24, 256, 384  # M deliberately not a block multiple (pads)
    xq = jnp.asarray(rng.integers(-127, 128, (2, M, K)), jnp.int8)
    rs = jnp.asarray(rng.random((2, M, 1)) * 0.01 + 1e-3, jnp.float32)
    p = {
        "kernel_q": jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8),
        "scale": jnp.asarray(rng.random(N) * 4e-4 + 1e-4, jnp.bfloat16),
        "bias": jnp.asarray(rng.standard_normal(N) * 0.01, jnp.bfloat16),
    }
    out_scale = jnp.float32(0.01)
    ref = dense_prequant_gelu_quant(xq, rs, p, out_scale)
    got = dense_prequant_gelu_quant_pallas(xq, rs, p, out_scale, interpret=True)
    assert got.shape == ref.shape and got.dtype == jnp.int8
    diff = np.abs(np.asarray(ref, np.int32) - np.asarray(got, np.int32))
    assert diff.max() <= 1, f"codes diverge by {diff.max()}"
    # no bias present -> implicit zeros
    p2 = {k: v for k, v in p.items() if k != "bias"}
    ref2 = dense_prequant_gelu_quant(xq, rs, p2, out_scale)
    got2 = dense_prequant_gelu_quant_pallas(xq, rs, p2, out_scale, interpret=True)
    assert np.abs(np.asarray(ref2, np.int32) - np.asarray(got2, np.int32)).max() <= 1


def test_attn_proj_glue_quant_matches_chain():
    """The fused proj+glue kernel (quantize → int8 proj matmul → dequant/bias
    → residual+LayerScale → RMSNorm → int8) matches dense(a8) followed by
    add_rmsnorm_quant to ≤1 int8 code (ops/quant_matmul.py)."""
    from omchat_tpu.ops.linear import dense
    from omchat_tpu.ops.norms import add_rmsnorm_quant
    from omchat_tpu.ops.quant_matmul import attn_proj_glue_quant, proj_glue_supported

    # local generator: the session rng fixture's stream is shared and
    # draw-order-sensitive downstream
    rng = np.random.default_rng(7)

    B, M, K = 2, 70, 256  # M not a block multiple (pads to 128)
    assert proj_glue_supported(K, K) and not proj_glue_supported(K, 2 * K)
    attn_out = jnp.asarray(rng.standard_normal((B, M, K)) * 0.5, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, M, K)), jnp.bfloat16)
    p = {
        "kernel_q": jnp.asarray(rng.integers(-127, 128, (K, K)), jnp.int8),
        "scale": jnp.asarray(rng.random(K) * 4e-4 + 1e-4, jnp.bfloat16),
        "bias": jnp.asarray(rng.standard_normal(K) * 0.01, jnp.bfloat16),
    }
    ls = jnp.asarray(rng.random(K) * 0.1, jnp.bfloat16)
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(K), jnp.bfloat16)

    y = dense(attn_out, p, a8=True)
    xr, qr, rr = add_rmsnorm_quant(x, y, ls, gamma, 1e-6, interpret=True)
    xg, qg, rg = attn_proj_glue_quant(attn_out, x, p, ls, gamma, 1e-6, interpret=True)
    assert xg.shape == xr.shape and qg.dtype == jnp.int8 and rg.shape == rr.shape
    # x' to one bf16 ulp (fp32 association of the dequant rescale differs),
    # codes to ±1, row scales to an ulp.
    np.testing.assert_allclose(
        np.asarray(xg, np.float32), np.asarray(xr, np.float32), rtol=1e-2, atol=2e-2
    )
    dq = np.abs(np.asarray(qg, np.int32) - np.asarray(qr, np.int32))
    assert dq.max() <= 1 and (dq == 0).mean() > 0.9
    np.testing.assert_allclose(np.asarray(rg), np.asarray(rr), rtol=1e-2)
    # no-bias proj params take the implicit-zeros path
    p2 = {k: v for k, v in p.items() if k != "bias"}
    y2 = dense(attn_out, p2, a8=True)
    _, qr2, _ = add_rmsnorm_quant(x, y2, ls, gamma, 1e-6, interpret=True)
    _, qg2, _ = attn_proj_glue_quant(attn_out, x, p2, ls, gamma, 1e-6, interpret=True)
    assert np.abs(np.asarray(qg2, np.int32) - np.asarray(qr2, np.int32)).max() <= 1


def test_intern_vit_fused_path_matches_xla(rng):
    """The padded-stack Pallas path produces the same features as the XLA path
    (head_dim=128 geometry so the packed kernel engages; interpret on CPU)."""
    from omchat_tpu.config import VisionConfig
    from omchat_tpu.models.intern_vit import init_params, intern_vit_forward

    cfg = VisionConfig(
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=2,
        num_attention_heads=2,  # head_dim 128
        image_size=56,
        patch_size=14,  # 4x4+1 = 17 tokens -> pads to 64
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    px = jnp.asarray(rng.standard_normal((2, 3, 56, 56)).astype(np.float32))
    ref = intern_vit_forward(params, cfg, px, attn_impl="xla")
    out = intern_vit_forward(params, cfg, px, attn_impl="pallas")
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_segment_ids_packing(rng):
    """Packed multi-document attention: two documents in one row behave like
    two separate rows (the varlen-packing contract)."""
    import jax.numpy as jnp

    from omchat_tpu.ops.attention import attention

    B, S, H, D = 1, 16, 2, 128
    q = _rand(rng, B, S, H, D)
    k = _rand(rng, B, S, H, D)
    v = _rand(rng, B, S, H, D)
    seg = jnp.asarray([[0] * 10 + [1] * 6])

    packed = attention(q, k, v, causal=True, segment_ids=seg, impl="xla")
    doc0 = attention(q[:, :10], k[:, :10], v[:, :10], causal=True, impl="xla")
    doc1 = attention(q[:, 10:], k[:, 10:], v[:, 10:], causal=True, q_offset=jnp.asarray([0]), impl="xla")
    np.testing.assert_allclose(np.asarray(packed[:, :10]), np.asarray(doc0), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(packed[:, 10:]), np.asarray(doc1), atol=2e-5, rtol=1e-4)


def test_add_rmsnorm_quant_matches_unfused(rng):
    """The w8a8 glue kernel (residual + LayerScale + RMSNorm + int8 quantize)
    is bit-identical to the unfused chain it replaces."""
    from omchat_tpu.ops.linear import quantize_activations
    from omchat_tpu.ops.norms import add_rmsnorm_quant, rms_norm

    B, S, D = 2, 24, 256
    x = jnp.asarray(rng.standard_normal((B, S, D)).astype(np.float32), jnp.bfloat16)
    delta = jnp.asarray(rng.standard_normal((B, S, D)).astype(np.float32), jnp.bfloat16)
    ls = jnp.asarray(rng.standard_normal(D).astype(np.float32) * 0.1, jnp.bfloat16)
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D).astype(np.float32), jnp.bfloat16)

    xn, codes, rs = add_rmsnorm_quant(x, delta, ls, gamma, eps=1e-6, interpret=True)

    x_ref = jax.jit(lambda x, d, l: x + d * l)(x, delta, ls)
    codes_ref, rs_ref = quantize_activations(rms_norm(x_ref, gamma, 1e-6))
    # x_new agrees to the last bf16 ulp (exact equality depends on how the
    # backend fuses/rounds x + delta*ls — it differs even between CPU runs
    # with different XLA flags); codes may differ by ±1 where the kernel's
    # skipped bf16 intermediate rounding lands on a code boundary.
    xn_f, xr_f = np.asarray(xn, np.float32), np.asarray(x_ref, np.float32)
    np.testing.assert_allclose(xn_f, xr_f, rtol=1e-2, atol=1e-2)
    c, cr = np.asarray(codes, np.int32), np.asarray(codes_ref, np.int32)
    assert np.abs(c - cr).max() <= 1
    assert (c == cr).mean() > 0.9
    # row scale = bf16 row-max / 127: the kernel's skipped bf16 intermediate
    # rounding can move the max by one bf16 ulp (~0.8% relative near the low
    # end of a binade), and which way the unfused chain rounds depends on how
    # XLA fuses x + delta*ls — so the tolerance must cover a full ulp.
    np.testing.assert_allclose(np.asarray(rs), np.asarray(rs_ref), rtol=1e-2)


def test_intern_vit_glue_path_matches_xla_w8a8(rng):
    """w8a8 + fused Pallas: the glue-carry scan (fused residual/norm/quantize)
    matches the unfused w8a8 XLA path."""
    import dataclasses

    from omchat_tpu.config import VisionConfig
    from omchat_tpu.models.intern_vit import init_params, intern_vit_forward
    from omchat_tpu.ops.linear import quantize_tree

    cfg = VisionConfig(
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=3,
        num_attention_heads=2,  # head_dim 128
        image_size=56,
        patch_size=14,
    )
    params = init_params(jax.random.PRNGKey(1), cfg)
    params = {
        "layers": quantize_tree(params["layers"]),
        **{k: v for k, v in params.items() if k != "layers"},
    }
    a8cfg = dataclasses.replace(cfg, w8a8=True)
    px = jnp.asarray(rng.standard_normal((2, 3, 56, 56)).astype(np.float32))
    ref = intern_vit_forward(params, a8cfg, px, attn_impl="xla")
    out = intern_vit_forward(params, a8cfg, px, attn_impl="pallas")
    assert out.shape == ref.shape
    ref = np.asarray(ref, dtype=np.float32)
    out = np.asarray(out, dtype=np.float32)
    denom = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / denom < 2e-2


def test_intern_vit_static_fc1_scales_match_dynamic(rng):
    """Calibrated static fc1-output scales (quantizing epilogue,
    dense_prequant_gelu_quant) stay close to the dynamic-per-token glue path
    on the calibration distribution, and the calibration helper threads the
    scales so the glue scan picks them up."""
    import dataclasses

    from omchat_tpu.config import VisionConfig
    from omchat_tpu.models.intern_vit import (
        calibrate_fc1_scales,
        init_params,
        intern_vit_forward,
    )
    from omchat_tpu.ops.linear import quantize_tree

    cfg = VisionConfig(
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=3,
        num_attention_heads=2,
        image_size=56,
        patch_size=14,
    )
    params = init_params(jax.random.PRNGKey(1), cfg)
    params = {
        "layers": quantize_tree(params["layers"]),
        **{k: v for k, v in params.items() if k != "layers"},
    }
    a8cfg = dataclasses.replace(cfg, w8a8=True)
    px = jnp.asarray(rng.standard_normal((2, 3, 56, 56)).astype(np.float32))
    calib = calibrate_fc1_scales(params, a8cfg, px)
    assert calib["layers"]["mlp"]["fc1_out_scale"].shape == (3,)

    ref = intern_vit_forward(params, a8cfg, px, attn_impl="pallas")  # dynamic glue
    out = intern_vit_forward(calib, a8cfg, px, attn_impl="pallas")  # static epilogue
    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    denom = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / denom < 3e-2


def test_dense_prequant_gelu_quant_contract(rng):
    """The fused epilogue == clip(round(gelu(dense_prequant(...)) / s))."""
    from omchat_tpu.ops.linear import (
        dense_prequant,
        dense_prequant_gelu_quant,
        quantize_activations,
        quantize_linear,
    )

    p = quantize_linear(
        {"kernel": jnp.asarray(rng.standard_normal((64, 96)).astype(np.float32)),
         "bias": jnp.asarray(rng.standard_normal(96).astype(np.float32) * 0.1)}
    )
    x = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
    xq, rs = quantize_activations(x)
    s = jnp.float32(0.01)
    ref = jax.nn.gelu(dense_prequant(xq, rs, p, dtype=jnp.float32), approximate=True)
    expected = np.clip(np.round(np.asarray(ref) / 0.01), -127, 127).astype(np.int8)
    got = np.asarray(dense_prequant_gelu_quant(xq, rs, p, s))
    assert np.abs(got.astype(np.int32) - expected.astype(np.int32)).max() <= 1


def test_anchored_softmax_matches_online():
    """The diagonal-anchored softmax (descending kv walk, fixed per-row shift
    from the anchor tile's max) is exact vs the online-softmax kernel — shift
    invariance — including ragged kv lengths, chunked-prefill q offsets, and
    large logit magnitudes (anchor headroom)."""
    rng = np.random.default_rng(11)
    B, S, T, H, KVH, D = 2, 256, 512, 4, 2, 128
    q = _rand(rng, B, S, H, D)
    k = _rand(rng, B, T, KVH, D)
    v = _rand(rng, B, T, KVH, D)
    # chunked-prefill geometry: q block writes at differing offsets, ragged kv
    q_off = jnp.asarray([100, 37], jnp.int32)
    kv_len = jnp.asarray([356, 293], jnp.int32)
    kw = dict(causal=True, q_offset=q_off, kv_len=kv_len, block_q=128, block_k=128,
              interpret=True)
    ref = flash_attention(q, k, v, softmax="online", **kw)
    out = flash_attention(q, k, v, softmax="anchored", **kw)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-5, rtol=1e-3
    )
    # large-magnitude logits: scale q so scores span ±~40 in the exp2 domain
    q2 = q * 30.0
    ref2 = flash_attention(q2, k, v, softmax="online", **kw)
    out2 = flash_attention(q2, k, v, softmax="anchored", **kw)
    np.testing.assert_allclose(
        np.asarray(out2, np.float32), np.asarray(ref2, np.float32), atol=3e-5, rtol=1e-3
    )
    # anchored requires causal, no segments
    import pytest

    with pytest.raises(ValueError):
        flash_attention(q, k, v, causal=False, softmax="anchored", interpret=True)


def test_grouped_gqa_multi_kv_tile_default_blocks(rng):
    """The GQA group-stacked kernel with the default block heuristic and
    num_kv_blocks > 1 (T > 1024): cross-tile online-softmax accumulation,
    interior-tile fast path, and the kv clamp all engage."""
    B, S, H, KVH, D = 1, 1408, 4, 2, 128
    q = _rand(rng, B, S, H, D)
    k = _rand(rng, B, S, KVH, D)
    v = _rand(rng, B, S, KVH, D)
    kv_len = jnp.asarray([1300], jnp.int32)
    ref = _xla_attention(q, k, v, causal=True, q_offset=jnp.asarray([0], jnp.int32), kv_len=kv_len)
    out = flash_attention(
        q, k, v, causal=True, q_offset=jnp.asarray([0], jnp.int32), kv_len=kv_len,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_grouped_gqa_group7(rng):
    """group = H/KVH = 7 (Qwen2-7B): odd group count through the stacked
    [group, block_q, D] q blocks."""
    B, S, H, KVH, D = 1, 192, 14, 2, 128
    q = _rand(rng, B, S, H, D)
    k = _rand(rng, B, S, KVH, D)
    v = _rand(rng, B, S, KVH, D)
    ref = _xla_attention(q, k, v, causal=True, q_offset=jnp.asarray([0], jnp.int32), kv_len=None)
    out = flash_attention(
        q, k, v, causal=True, q_offset=jnp.asarray([0], jnp.int32),
        block_q=64, block_k=64, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)
