"""LoRA / QLoRA fine-tuning: low-rank adapters over a frozen base.

No counterpart exists in the reference (its training loop was stripped —
SURVEY.md §0); this supplies the standard parameter-efficient fine-tune the
reference's users reach for elsewhere, rebuilt functionally for TPU:

- adapters are a separate pytree mirroring ``params["language_model"]
  ["layers"]`` (stacked [L, ...] leaves, so they scan with the trunk);
- the differentiated argument of the loss is the adapter tree alone — the
  frozen base rides the closure, so gradients, optimizer state, and updates
  are rank-sized (the functional equivalent of requires_grad=False);
- the base may be int8-quantized (QLoRA): ``apply_lora`` dequantizes the
  target kernels while adding the deltas, so a 7B base held in int8 trains
  adapters in bf16.  NOTE: the merged [L, in, out] bf16 kernels materialize
  per step inside jit (a few GB transient at 7B) — the memory-for-simplicity
  trade of merge-at-forward; remat covers the activations as usual;
- ``merge_lora`` folds trained adapters back into the checkpoint (bf16, or
  re-quantized int8 via ops.linear.quantize_linear) for serving.

B starts at zero (standard LoRA init), so step 0 is exactly the base model.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from omchat_tpu.config import OmChatConfig

DEFAULT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj")
ALL_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")


def _kernel_shape(p: dict) -> Tuple[int, ...]:
    return (p["kernel"] if "kernel" in p else p["kernel_q"]).shape


def _find_targets(layers: dict, targets: Sequence[str]):
    """Yield (group_key, name, param_dict) for each adapted linear."""
    for group in ("self_attn", "mlp"):
        for name, p in layers.get(group, {}).items():
            if name in targets and isinstance(p, dict) and ("kernel" in p or "kernel_q" in p):
                yield group, name, p


def init_lora(
    rng: jax.Array,
    params: dict,
    rank: int = 16,
    *,
    alpha: Optional[float] = None,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.bfloat16,
) -> dict:
    """Adapter tree for ``params["language_model"]["layers"]``.

    Per target: ``a`` [L, in, r] ~ N(0, 1/r), ``b`` [L, r, out] = 0, plus the
    scalar ``scale`` = alpha / rank (alpha defaults to rank, scale 1.0).
    """
    layers = params["language_model"]["layers"]
    scale = (alpha if alpha is not None else float(rank)) / float(rank)
    out: dict = {}
    for group, name, p in _find_targets(layers, targets):
        l, d_in, d_out = _kernel_shape(p)
        rng, ka = jax.random.split(rng)
        out.setdefault(group, {})[name] = {
            "a": (jax.random.normal(ka, (l, d_in, rank)) * rank**-0.5).astype(dtype),
            "b": jnp.zeros((l, rank, d_out), dtype),
        }
    return {"layers": out, "scale": scale}


def apply_lora(params: dict, lora: dict) -> dict:
    """Effective full-model params: target kernels become
    ``dequant(kernel) + scale * a @ b`` (bf16); everything else is shared by
    reference.  Shape-preserving, jit-friendly — call inside the loss."""
    scale = lora["scale"]
    layers = params["language_model"]["layers"]
    new_layers = dict(layers)
    for group, adapters in lora["layers"].items():
        new_group = dict(new_layers[group])
        for name, ab in adapters.items():
            p = new_group[name]
            if "kernel" in p:
                base = p["kernel"]
            else:  # QLoRA: int8 base dequantized at adapter-apply time
                base = p["kernel_q"].astype(jnp.bfloat16) * p["scale"][..., None, :].astype(jnp.bfloat16)
            delta = jnp.einsum("lir,lro->lio", ab["a"], ab["b"]) * scale
            q = {"kernel": (base + delta.astype(base.dtype))}
            if "bias" in p:
                q["bias"] = p["bias"]
            new_group[name] = q
        new_layers[group] = new_group
    lm = dict(params["language_model"])
    lm["layers"] = new_layers
    return {**params, "language_model": lm}


def merge_lora(params: dict, lora: dict, *, quantize: bool = False) -> dict:
    """Fold trained adapters into the checkpoint for serving.  With
    ``quantize=True`` the merged kernels re-quantize to int8 (w8a8/weight-only
    serving keeps working on the fine-tuned weights)."""
    merged = apply_lora(params, lora)
    if quantize:
        from omchat_tpu.ops.linear import quantize_tree

        lm = dict(merged["language_model"])
        lm["layers"] = quantize_tree(lm["layers"])
        merged = {**merged, "language_model": lm}
    return merged


def build_lora_bank(adapters: Sequence[dict], dtype=jnp.bfloat16) -> dict:
    """Stack adapter trees (training/lora.py layout) into a serving bank for
    per-request multi-LoRA (:func:`omchat_tpu.models.qwen2.lora_delta`).

    Returns {"layers": {group: {name: {"a": [L, N+1, in, rmax],
    "b": [L, N+1, rmax, out]}}}} — leading axis L so the bank scans with the
    trunk, bank axis second.  Row 0 is the all-zero adapter (= the base
    model); adapter i serves as bank id i+1.  Each adapter's ``scale`` is
    folded into its b, ranks are zero-padded to the widest (exact: the padded
    rows contribute a@0 + 0@b = 0), and adapters may target different
    projection sets — a missing target contributes zeros for that adapter.
    """
    if not adapters:
        raise ValueError("build_lora_bank needs at least one adapter")
    n = len(adapters)
    rmax = max(
        ab["a"].shape[-1]
        for ad in adapters
        for group in ad["layers"].values()
        for ab in group.values()
    )
    # union of (group, name) targets with their [L, in, out] shapes
    shapes: dict = {}
    for ad in adapters:
        for group, names in ad["layers"].items():
            for name, ab in names.items():
                l, d_in, _ = ab["a"].shape
                d_out = ab["b"].shape[-1]
                shapes.setdefault(group, {})[name] = (l, d_in, d_out)
    bank: dict = {}
    for group, names in shapes.items():
        for name, (l, d_in, d_out) in names.items():
            a = jnp.zeros((l, n + 1, d_in, rmax), dtype)
            b = jnp.zeros((l, n + 1, rmax, d_out), dtype)
            for i, ad in enumerate(adapters):
                ab = ad["layers"].get(group, {}).get(name)
                if ab is None:
                    continue
                r = ab["a"].shape[-1]
                a = a.at[:, i + 1, :, :r].set(ab["a"].astype(dtype))
                b = b.at[:, i + 1, :r, :].set((ab["b"] * ad["scale"]).astype(dtype))
            bank.setdefault(group, {})[name] = {"a": a, "b": b}
    return {"layers": bank}


def lora_loss_fn(
    lora: dict,
    params: dict,
    cfg: OmChatConfig,
    batch: dict,
    *,
    attn_impl: Optional[str] = None,
    remat: bool = True,
):
    """Differentiate THIS wrt ``lora`` only — the frozen base is a closure
    argument, so grad/opt state never touch it."""
    from omchat_tpu.training.train_step import loss_fn

    return loss_fn(apply_lora(params, lora), cfg, batch, attn_impl=attn_impl, remat=remat)


def lora_train_step(
    lora: dict,
    opt_state,
    params: dict,
    cfg: OmChatConfig,
    batch: dict,
    optimizer: optax.GradientTransformation,
    *,
    attn_impl: Optional[str] = None,
    remat: bool = True,
):
    (loss, _), grads = jax.value_and_grad(lora_loss_fn, has_aux=True)(
        lora, params, cfg, batch, attn_impl=attn_impl, remat=remat
    )
    updates, opt_state = optimizer.update(grads, opt_state, lora)
    return optax.apply_updates(lora, updates), opt_state, loss
