"""InternViT vision tower (6B and 300M geometries) — functional JAX.

Re-implements the behavior of the reference torch model
(/root/reference/omchat/model/multimodal_encoder/intern_vit_6b/modeling_intern_vit.py):

- Conv patchify + CLS token + bicubic-interpolated position embeddings for
  arbitrary grids (modeling_intern_vit.py:61-102),
- packed-QKV attention with optional qk-RMSNorm over the flattened head dim
  (modeling_intern_vit.py:105-176),
- pre-norm blocks with LayerScale ls1/ls2 (modeling_intern_vit.py:194-222),
- 300M variant's rms/layer-norm switch (intern_vit_300m/modeling_intern_vit.py:61-65).

TPU-first design: layers are stacked along a leading axis and executed with
``lax.scan`` (one compiled layer body for all 45 layers), bf16-friendly, with
fp32 softmax/norm statistics.  There is no final layernorm — the last hidden
state is the raw block output, as in the reference.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from omchat_tpu.config import VisionConfig
from omchat_tpu.ops.attention import attention
from omchat_tpu.ops.linear import dense, dense_prequant, quantize_activations
from omchat_tpu.ops.quant_matmul import (
    attn_proj_glue_quant,
    fc1_gelu_quant,
    proj_glue_supported,
)
from omchat_tpu.ops.norms import add_rmsnorm_quant, apply_norm, rms_norm


# ---------------------------------------------------------------------------
# Position embedding interpolation (torch.nn.functional.interpolate parity)
# ---------------------------------------------------------------------------


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel with A=-0.75 (torch bicubic)."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=64)
def bicubic_interp_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] interpolation matrix matching F.interpolate(mode='bicubic',
    align_corners=False) with index clamping at the borders."""
    if src == dst:
        return np.eye(src, dtype=np.float32)
    scale = src / dst
    out = np.zeros((dst, src), dtype=np.float64)
    for i in range(dst):
        center = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(center))
        t = center - x0
        taps = np.array([x0 - 1, x0, x0 + 1, x0 + 2])
        weights = _cubic_kernel(np.array([t + 1.0, t, 1.0 - t, 2.0 - t]))
        for tap, w in zip(taps, weights):
            out[i, min(max(tap, 0), src - 1)] += w
    return out.astype(np.float32)


def interpolate_pos_embed(pos_embed: jax.Array, src_grid: int, dst_h: int, dst_w: int) -> jax.Array:
    """Bicubic-resample patch position embeddings [src*src, D] → [dst_h*dst_w, D].

    fp32 math, matching the reference's ``_get_pos_embed``
    (modeling_intern_vit.py:82-88).
    """
    if src_grid == dst_h == dst_w:
        return pos_embed
    d = pos_embed.shape[-1]
    grid = pos_embed.astype(jnp.float32).reshape(src_grid, src_grid, d)
    mh = jnp.asarray(bicubic_interp_matrix(src_grid, dst_h))
    mw = jnp.asarray(bicubic_interp_matrix(src_grid, dst_w))
    grid = jnp.einsum("hs,swd->hwd", mh, grid)
    grid = jnp.einsum("wt,htd->hwd", mw, grid)
    return grid.reshape(dst_h * dst_w, d).astype(pos_embed.dtype)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def embeddings(params: dict, cfg: VisionConfig, pixel_values: jax.Array) -> jax.Array:
    """Patchify + CLS + position embeddings.  pixel_values: [B, 3, H, W] → [B, 1+N, D]."""
    x = jnp.transpose(pixel_values, (0, 2, 3, 1))  # NHWC
    kernel = params["patch_embedding"]["kernel"]  # [P, P, 3, D]
    dtype = kernel.dtype
    x = jax.lax.conv_general_dilated(
        x.astype(dtype),
        kernel,
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = x + params["patch_embedding"]["bias"].astype(dtype)
    b, h, w, d = x.shape
    patch_embeds = x.reshape(b, h * w, d)

    cls = jnp.broadcast_to(params["class_embedding"].astype(dtype), (b, 1, d))
    embeds = jnp.concatenate([cls, patch_embeds], axis=1)

    pos = params["position_embedding"]  # [1+N_train, D]
    src_grid = cfg.num_patches_per_side
    patch_pos = interpolate_pos_embed(pos[1:], src_grid, h, w)
    pos = jnp.concatenate([pos[:1], patch_pos], axis=0)
    return embeds + pos[None].astype(dtype)


def _layer_forward(
    cfg: VisionConfig,
    x: jax.Array,
    layer: dict,
    *,
    attn_impl: Optional[str],
    fused_valid_len: Optional[int] = None,
    with_fc1_amax: bool = False,
) -> jax.Array:
    """One pre-norm block: x + ls1*attn(norm1(x)); x + ls2*mlp(norm2(x)).

    ``fused_valid_len`` selects the packed-layout Pallas attention fast path
    (see :func:`intern_vit_forward`): q/k/v stay in the [B, SP, H*D] layout
    the qkv matmul produces and rows ≥ fused_valid_len are padding.
    """
    b, n, d = x.shape
    h = cfg.num_attention_heads
    hd = cfg.head_dim
    a8 = cfg.w8a8

    # Attention
    y = apply_norm(x, layer["norm1"], cfg.layer_norm_eps)
    qkv = dense(y, layer["attn"]["qkv"], a8=a8)
    if fused_valid_len is not None:
        attn_out = _attention_fused(cfg, layer, qkv, fused_valid_len)
    else:
        q, k, v = jnp.split(qkv, 3, axis=-1)  # each [B, N, D]
        if cfg.qk_normalization:
            # qk-RMSNorm over the flattened (head, head_dim) axis
            # (modeling_intern_vit.py:143-146).
            q = rms_norm(q, layer["attn"]["q_norm"]["scale"], cfg.layer_norm_eps)
            k = rms_norm(k, layer["attn"]["k_norm"]["scale"], cfg.layer_norm_eps)
        q = q.reshape(b, n, h, hd)
        k = k.reshape(b, n, h, hd)
        v = v.reshape(b, n, h, hd)
        attn_out = attention(q, k, v, causal=False, impl=attn_impl).reshape(b, n, d)
    attn_out = dense(attn_out, layer["attn"]["proj"], a8=a8)
    x = x + attn_out * layer["ls1"]

    # MLP. Parity mode: exact erf GELU (transformers ACT2FN['gelu']).  In w8a8
    # serving mode with actually-quantized params the tanh approximation is
    # used instead: the next op re-quantizes to int8 per token, and measured on
    # the fc1 activation volume the approximation moves 0.26% of int8 codes by
    # ±1 (below the quantizer's own noise) while cutting ~28% off the epilogue
    # pass (dev/exp_gelu.py).  On unquantized bf16 params a8 is a documented
    # no-op, so the quantizer-noise justification doesn't apply — keep erf.
    approx = a8 and "kernel_q" in layer["mlp"]["fc1"]
    y = apply_norm(x, layer["norm2"], cfg.layer_norm_eps)
    h = jax.nn.gelu(dense(y, layer["mlp"]["fc1"], a8=a8), approximate=approx)
    y = dense(h, layer["mlp"]["fc2"], a8=a8)
    x = x + y * layer["ls2"]
    if with_fc1_amax:
        return x, jnp.max(jnp.abs(h.astype(jnp.float32)))
    return x


def _attention_fused(cfg: VisionConfig, layer: dict, qkv: jax.Array, valid_len: int) -> jax.Array:
    """qk-norm (prescale folded) + packed Pallas attention on [B, SP, 3D]."""
    from omchat_tpu.ops.flash_attention import (
        packed_prescale,
        packed_qkv_norm_attention,
        packed_self_attention,
    )

    h, hd = cfg.num_attention_heads, cfg.head_dim
    interpret = jax.default_backend() != "tpu"
    if cfg.qk_normalization:
        # qk-norm folds into the kernel: only the [B, SP, 1] rstd stats
        # materialize; normalized q/k never round-trip HBM.  Measured win is
        # small — 0.99 vs 1.01 ms/layer standalone, ~0.4 ms on the whole
        # encode (XLA already fuses the separate norms well;
        # dev/exp_attn_qknorm.py) — kept for the exact parity + less glue.
        return packed_qkv_norm_attention(
            qkv,
            num_heads=h,
            q_gamma=layer["attn"]["q_norm"]["scale"] * packed_prescale(hd),
            k_gamma=layer["attn"]["k_norm"]["scale"],
            eps=cfg.layer_norm_eps,
            valid_len=valid_len,
            interpret=interpret,
        )
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return packed_self_attention(
        q,
        k,
        v,
        num_heads=h,
        valid_len=valid_len,
        prescaled=False,
        interpret=interpret,
    )


def _layer_forward_glue(
    cfg: VisionConfig,
    carry: tuple,
    layer: dict,
    *,
    valid_len: int,
    fc1_impl: Optional[str] = None,
    proj_impl: Optional[str] = None,
) -> tuple:
    """w8a8 fast-path block: the scan carry holds (x, int8 codes of norm(x),
    row scales), so the residual add, the next norm, and the activation
    quantization run as one fused Pallas pass (add_rmsnorm_quant) instead of
    three XLA HBM passes.  ``layer['next_norm1_scale']`` is this stack's norm1
    gamma rolled by one layer (the carry's codes are always "quantized input
    of the next matmul").
    """
    x, xq, rs = carry
    interpret = jax.default_backend() != "tpu"

    qkv = dense_prequant(xq, rs, layer["attn"]["qkv"], dtype=x.dtype)
    attn_out = _attention_fused(cfg, layer, qkv, valid_len)
    if proj_impl is None:
        proj_impl = (
            "pallas"
            if proj_glue_supported(*layer["attn"]["proj"]["kernel_q"].shape)
            else "xla"
        )
    if proj_impl == "pallas":
        # Fused proj matmul + glue: the bf16 proj output never round-trips
        # HBM (ops/quant_matmul.py attn_proj_glue_quant; 1.77 vs 2.38
        # ms/layer standalone, dev/exp_proj_glue.py).
        x, xq, rs = attn_proj_glue_quant(
            attn_out,
            x,
            layer["attn"]["proj"],
            layer["ls1"],
            layer["norm2"]["scale"],
            cfg.layer_norm_eps,
            interpret=interpret,
        )
    else:
        attn_out = dense(attn_out, layer["attn"]["proj"], a8=True)
        x, xq, rs = add_rmsnorm_quant(
            x, attn_out, layer["ls1"], layer["norm2"]["scale"], cfg.layer_norm_eps, interpret=interpret
        )

    if "fc1_out_scale" in layer["mlp"]:
        # Static-scale epilogue: dequant→gelu→quant folds into the fc1 matmul
        # writeback, so only int8 codes hit HBM (scales come from
        # calibrate_fc1_scales).  The Pallas kernel forces the fusion XLA only
        # partially performs in the full graph (ops/quant_matmul.py).
        codes = fc1_gelu_quant(
            xq,
            rs,
            layer["mlp"]["fc1"],
            layer["mlp"]["fc1_out_scale"],
            impl=fc1_impl,
            interpret=interpret,
        )
        y = dense_prequant(codes, layer["mlp"]["fc1_out_scale"], layer["mlp"]["fc2"], dtype=x.dtype)
    else:
        y = dense_prequant(xq, rs, layer["mlp"]["fc1"], dtype=x.dtype)
        y = jax.nn.gelu(y, approximate=True)
        y = dense(y, layer["mlp"]["fc2"], a8=True)
    x, xq, rs = add_rmsnorm_quant(
        x, y, layer["ls2"], layer["next_norm1_scale"], cfg.layer_norm_eps, interpret=interpret
    )
    return x, xq, rs


def intern_vit_forward(
    params: dict,
    cfg: VisionConfig,
    pixel_values: jax.Array,
    *,
    feature_layer: int = -1,
    attn_impl: Optional[str] = None,
    remat: bool = False,
    fc1_impl: Optional[str] = None,
    proj_impl: Optional[str] = None,
) -> jax.Array:
    """Run the tower; returns hidden states after layer ``feature_layer``.

    ``feature_layer=-1`` reproduces the HF bundle's hardcoded
    ``hidden_states[-1]`` (modeling_omchat.py:750-753). Negative indices count
    from the end as in the reference's Python list indexing; CLS is NOT dropped
    here (see :func:`feature_select`).

    Fast path (TPU inference): when the Pallas impl is selected and the
    geometry allows (head_dim % 128 == 0), the whole stack runs at the
    sequence length padded once to a multiple of 64 — every op except
    attention is row-local, and attention masks the pad columns — so no
    per-layer pad/slice/transpose materializes around the attention kernel
    (the 1025-token 6B shape would otherwise repack 3×33MB per layer).
    """
    from omchat_tpu.ops.attention import default_impl
    from omchat_tpu.ops.flash_attention import packed_seq_supported

    x = embeddings(params, cfg, pixel_values)
    s = x.shape[1]

    impl = attn_impl or default_impl()
    fused = impl == "pallas" and packed_seq_supported(s, cfg.head_dim) and not remat
    # Pad to the sublane multiple (8) only — every extra row costs 0.1% of the
    # whole stack's matmul FLOPs (1025 → 1032 is 0.7% waste vs 6.1% at 1088).
    sp = (s + 7) // 8 * 8 if fused else s
    if fused and sp != s:
        x = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))

    num_layers = cfg.num_hidden_layers
    n_run = num_layers + 1 + feature_layer if feature_layer < 0 else feature_layer
    n_run = max(0, min(num_layers, n_run))

    layers = params["layers"]
    if n_run < num_layers:
        layers = jax.tree.map(lambda a: a[:n_run], layers)

    # w8a8 + fused + RMSNorm + actually-quantized params: glue-carry path —
    # the scan carries (x, int8 codes of norm1(x), row scales) so
    # residual/norm/quantize run as one Pallas pass per glue point (see
    # _layer_forward_glue).  The kernel_q check preserves dense()'s contract
    # that a8=True is a no-op on unquantized params (a w8a8 config can be
    # paired with bf16 weights).
    glue = (
        fused
        and cfg.w8a8
        and "bias" not in layers["norm1"]
        and n_run > 0
        and "kernel_q" in layers["attn"]["qkv"]
    )
    if glue:
        layers = dict(layers)
        layers["next_norm1_scale"] = jnp.roll(layers["norm1"]["scale"], -1, axis=0)
        y = rms_norm(x, layers["norm1"]["scale"][0], cfg.layer_norm_eps)
        xq, rs = quantize_activations(y)

        def glue_scan(carry, layer):
            return (
                _layer_forward_glue(
                    cfg, carry, layer, valid_len=s, fc1_impl=fc1_impl, proj_impl=proj_impl
                ),
                None,
            )

        (x, _, _), _ = jax.lax.scan(glue_scan, (x, xq, rs), layers)
    else:
        body = functools.partial(
            _layer_forward, cfg, attn_impl=attn_impl, fused_valid_len=s if fused else None
        )
        if remat:
            body = jax.checkpoint(body)

        def scan_body(carry, layer):
            return body(carry, layer), None

        x, _ = jax.lax.scan(scan_body, x, layers)
    if fused and sp != s:
        x = x[:, :s]
    return x


@functools.partial(jax.jit, static_argnames=("cfg",))
def _calibrate_amax(params, cfg: VisionConfig, pixel_values):
    x = embeddings(params, cfg, pixel_values)

    def body(carry, layer):
        return _layer_forward(cfg, carry, layer, attn_impl=None, with_fc1_amax=True)

    _, amax = jax.lax.scan(body, x, params["layers"])
    return amax


def calibrate_fc1_scales(params: dict, cfg: VisionConfig, pixel_values: jax.Array) -> dict:
    """Per-layer static fc1-output scales for the quantizing epilogue.

    Runs the tower on a calibration batch through the dynamic w8a8 path and
    records each layer's amax of ``gelu(fc1(·))``; the stored scale amax/127
    makes the static quantizer (:func:`~omchat_tpu.ops.linear.
    dense_prequant_gelu_quant`) clip nothing seen during calibration.  Returns
    a new params dict with ``layers.mlp.fc1_out_scale`` [L] fp32 set — the
    glue-scan fast path picks it up automatically.
    """
    amax = np.asarray(_calibrate_amax(params, cfg, pixel_values))
    scales = np.maximum(amax, 1e-6).astype(np.float32) / 127.0
    out = dict(params)
    out["layers"] = dict(params["layers"])
    out["layers"]["mlp"] = dict(params["layers"]["mlp"])
    out["layers"]["mlp"]["fc1_out_scale"] = jnp.asarray(scales)
    return out


def feature_select(hidden: jax.Array, strategy: str = "default") -> jax.Array:
    """'default' drops the CLS token (reference feature_select, internVIT_encoder.py:35-43)."""
    if strategy in ("default", "patch"):
        return hidden[:, 1:]
    if strategy in ("full", "cls_patch"):
        return hidden
    raise ValueError(f"Unknown vision_feature_select_strategy: {strategy}")


# ---------------------------------------------------------------------------
# Init (tests / dryrun; real weights come from the checkpoint loader)
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, cfg: VisionConfig, dtype=jnp.float32) -> dict:
    d, f, l = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    n_pos = cfg.num_patch_tokens + 1
    keys = jax.random.split(key, 8)

    def nrm(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    params = {
        "class_embedding": nrm(keys[0], (d,), 1.0),
        "position_embedding": nrm(keys[1], (n_pos, d), 0.02),
        "patch_embedding": {
            "kernel": nrm(keys[2], (cfg.patch_size, cfg.patch_size, cfg.num_channels, d)),
            "bias": jnp.zeros((d,), dtype),
        },
        "layers": {
            "norm1": {"scale": jnp.ones((l, d), dtype)},
            "norm2": {"scale": jnp.ones((l, d), dtype)},
            "ls1": jnp.full((l, d), cfg.initializer_factor, dtype),
            "ls2": jnp.full((l, d), cfg.initializer_factor, dtype),
            "attn": {
                "qkv": {"kernel": nrm(keys[3], (l, d, 3 * d))},
                "proj": {"kernel": nrm(keys[4], (l, d, d)), "bias": jnp.zeros((l, d), dtype)},
            },
            "mlp": {
                "fc1": {"kernel": nrm(keys[5], (l, d, f)), "bias": jnp.zeros((l, f), dtype)},
                "fc2": {"kernel": nrm(keys[6], (l, f, d)), "bias": jnp.zeros((l, d), dtype)},
            },
        },
    }
    if cfg.qkv_bias:
        params["layers"]["attn"]["qkv"]["bias"] = jnp.zeros((l, 3 * d), dtype)
    if cfg.qk_normalization:
        params["layers"]["attn"]["q_norm"] = {"scale": jnp.ones((l, d), dtype)}
        params["layers"]["attn"]["k_norm"] = {"scale": jnp.ones((l, d), dtype)}
    if cfg.norm_type == "layer_norm":
        params["layers"]["norm1"]["bias"] = jnp.zeros((l, d), dtype)
        params["layers"]["norm2"]["bias"] = jnp.zeros((l, d), dtype)
    return params
