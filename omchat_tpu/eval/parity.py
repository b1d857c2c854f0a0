"""Checkpoint parity runbook — the north-star acceptance harness.

BASELINE.json's acceptance criterion is argmax-exact greedy decode against the
reference stack on a real checkpoint (the contract of
/root/reference/single_inference.py:52-62: fp16 CUDA there, fp32 CPU torch as
the environment-portable truth here).  This module runs the torch reference
twin and the JAX engine side by side on the same inputs and reports:

- per-step argmax-match rate, first-divergence step,
- per-step max |Δlogit| (teacher-forced on the torch-chosen tokens, so the
  comparison stays aligned past a divergence),
- the engine's own end-to-end greedy tokens (the actual serving path),
- optional per-module deltas (tower features, projector output, prompt logits).

The torch side prefers the checkpoint's own `trust_remote_code` bundle (the
reference's converter output ships its modeling code in-dir,
convert_omchat_to_hf.py:104-106); a checkpoint without code files falls back
to the in-repo torch twin (omchat_tpu/export/hf_code) fed the same weights
through flatten_to_hf_state, which supports both key layouts.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np


def load_torch_twin(model_path: str, jax_params=None):
    """Return (torch_model fp32 eval, source) where source is
    'remote_code' (the checkpoint's own code bundle via AutoModel) or
    'in-repo-twin' (our torch twin loaded with the JAX-side weights)."""
    import torch

    cfg_path = os.path.join(model_path, "config.json")
    with open(cfg_path) as f:
        cfg_json = json.load(f)
    if "auto_map" in cfg_json and any("AutoModel" in k for k in cfg_json["auto_map"]):
        from transformers import AutoModel

        model = AutoModel.from_pretrained(model_path, trust_remote_code=True, dtype=torch.float32)
        model.eval()
        return model, "remote_code"

    # In-repo twin: same weights as the JAX engine, HF layout via the exporter.
    from omchat_tpu.checkpoint.save import flatten_to_hf_state
    from omchat_tpu.export.hf_code.configuration_omchat import OmChatConfig as TwinConfig
    from omchat_tpu.export.hf_code.modeling_omchat import OmChatForConditionalGeneration

    if jax_params is None:
        raise ValueError("repo-native checkpoint parity needs the loaded JAX params")
    from omchat_tpu.config import OmChatConfig

    cfg = OmChatConfig.from_hf_dict(cfg_json) if "vision_config" in cfg_json else None
    if cfg is None:
        from omchat_tpu.checkpoint.loader import load_omchat_checkpoint

        cfg, _ = load_omchat_checkpoint(model_path, np.float32)
    hf = cfg.to_hf_dict()
    twin_cfg = TwinConfig(
        vision_config=hf["vision_config"],
        text_config=hf["text_config"],
        mm_projector_type=hf["mm_projector_type"],
        image_grid_pinpoints=hf["image_grid_pinpoints"],
        vision_feature_layer=hf["vision_feature_layer"],
        vision_feature_select_strategy=hf["vision_feature_select_strategy"],
        tokenizer_model_max_length=hf.get("tokenizer_model_max_length"),
    )
    model = OmChatForConditionalGeneration(twin_cfg)
    state = {k: torch.from_numpy(np.ascontiguousarray(v).astype(np.float32))
             for k, v in flatten_to_hf_state(jax_params).items()}
    missing, unexpected = model.load_state_dict(state, strict=False)
    real_missing = [k for k in missing if "rotary" not in k]
    if real_missing or unexpected:
        raise ValueError(f"twin load mismatch: missing={real_missing} unexpected={unexpected}")
    model = model.float().eval()
    return model, "in-repo-twin"


def torch_greedy_with_logits(torch_model, input_ids: np.ndarray, images: Optional[np.ndarray], n_new: int):
    """Step the torch model greedily, returning (tokens [n], logits [n, V])."""
    import torch

    ids = torch.from_numpy(np.asarray(input_ids, dtype=np.int64))[None]
    imgs = torch.from_numpy(np.asarray(images, dtype=np.float32)) if images is not None else None
    tokens: List[int] = []
    logits_steps: List[np.ndarray] = []
    past = None
    with torch.no_grad():
        out = torch_model(input_ids=ids, images=imgs, use_cache=True)
        for _ in range(n_new):
            step_logits = out.logits[0, -1].float().numpy()
            logits_steps.append(step_logits)
            nxt = int(step_logits.argmax())
            tokens.append(nxt)
            past = out.past_key_values
            out = torch_model(
                input_ids=torch.tensor([[nxt]], dtype=torch.long),
                past_key_values=past,
                use_cache=True,
            )
    return tokens, np.stack(logits_steps)


def jax_teacher_forced_logits(model, input_ids: List[int], images: Optional[np.ndarray], gen_tokens: List[int]):
    """Full-sequence JAX logits over prompt+gen_tokens; returns
    (step_logits [n, V] fp32 — logits predicting each gen token —
    prompt_logits [V] at the last prompt position)."""
    import jax.numpy as jnp

    from omchat_tpu.models.omchat import encode_images, fuse_embeddings, plan_multimodal_merge
    from omchat_tpu.models.qwen2 import lm_head, qwen2_forward

    cfg = model.config
    params = model.engine.params
    full = list(input_ids) + [int(t) for t in gen_tokens]
    plan = plan_multimodal_merge([full], cfg.image_seq_len, bucket=8)
    if images is not None:
        feats = encode_images(params, cfg, jnp.asarray(images), attn_impl=model.engine.attn_impl)
        feats = feats.reshape(-1, feats.shape[-1])
    else:
        feats = None
    embeds = fuse_embeddings(
        params, jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
        jnp.asarray(plan.image_index), feats,
    )
    if cfg.text.is_moe:
        from omchat_tpu.models.qwen2_moe import qwen2_moe_forward

        hidden, _ = qwen2_moe_forward(
            params["language_model"], cfg.text, embeds, jnp.asarray(plan.positions),
            attn_impl=model.engine.attn_impl,
        )
    else:
        hidden, _ = qwen2_forward(
            params["language_model"], cfg.text, embeds, jnp.asarray(plan.positions),
            attn_impl=model.engine.attn_impl,
        )
    logits = np.asarray(lm_head(params["language_model"], cfg.text, hidden), np.float32)[0]
    merged_len = int(plan.lengths[0])
    n = len(gen_tokens)
    prompt_end = merged_len - n  # merged prompt length
    steps = logits[prompt_end - 1 : merged_len - 1]
    return steps, logits[prompt_end - 1]


def per_module_report(model, torch_model, images: np.ndarray) -> dict:
    """Max |Δ| between the two stacks at each module boundary on the prompt's
    image tiles: tower features (post feature-select), projector output."""
    import jax.numpy as jnp
    import torch

    from omchat_tpu.models.intern_vit import feature_select, intern_vit_forward
    from omchat_tpu.models.projector import projector_forward

    cfg = model.config
    params = model.engine.params
    hidden = intern_vit_forward(
        params["vision_tower"], cfg.vision, jnp.asarray(images),
        feature_layer=cfg.vision_feature_layer, attn_impl=model.engine.attn_impl,
    )
    feats_j = np.asarray(feature_select(hidden, cfg.vision_feature_select_strategy), np.float32)
    proj_j = np.asarray(
        projector_forward(params["projector"], cfg.projector, jnp.asarray(feats_j)), np.float32
    )

    with torch.no_grad():
        imgs = torch.from_numpy(np.asarray(images, dtype=np.float32))
        hidden_t = torch_model.vision_tower(imgs, feature_layer=cfg.vision_feature_layer)
        if cfg.vision_feature_select_strategy in ("default", "patch"):
            hidden_t = hidden_t[:, 1:]
        feats_t = hidden_t.float().numpy()
        proj_t = torch_model.multi_modal_projector(hidden_t).float().numpy()

    def delta(a, b):
        d = np.abs(a - b)
        scale = np.maximum(np.abs(b), 1e-6)
        return {"max_abs": float(d.max()), "max_rel": float((d / scale).max()),
                "mean_abs": float(d.mean())}

    return {"tower_features": delta(feats_j, feats_t), "projector": delta(proj_j, proj_t)}


def run_parity(
    model,
    torch_model,
    input_ids: List[int],
    images: Optional[np.ndarray],
    *,
    max_new_tokens: int = 32,
    per_module: bool = False,
) -> dict:
    """The full report.  ``model`` is an OmChatModel (JAX); ``torch_model``
    the fp32 reference twin."""
    from omchat_tpu.config import GenerationConfig

    torch_tokens, torch_logits = torch_greedy_with_logits(
        torch_model, np.asarray(input_ids), images, max_new_tokens
    )
    jax_steps, _ = jax_teacher_forced_logits(model, input_ids, images, torch_tokens)

    n = len(torch_tokens)
    argmax_match = [int(jax_steps[i].argmax()) == torch_tokens[i] for i in range(n)]
    max_dlogit = [float(np.abs(jax_steps[i] - torch_logits[i]).max()) for i in range(n)]
    first_div = next((i for i, m in enumerate(argmax_match) if not m), None)

    engine_out = model.engine.generate(
        [list(input_ids)], images,
        GenerationConfig(max_new_tokens=max_new_tokens, eos_token_id=-1),
    )
    engine_tokens = [int(t) for t in engine_out.token_ids[0]]

    report = {
        "steps": n,
        "argmax_match_rate": float(np.mean(argmax_match)) if n else 1.0,
        "first_divergence_step": first_div,
        "max_logit_diff": float(np.max(max_dlogit)) if n else 0.0,
        "mean_logit_diff": float(np.mean(max_dlogit)) if n else 0.0,
        "per_step_max_logit_diff": [round(v, 6) for v in max_dlogit],
        "torch_tokens": torch_tokens,
        "engine_tokens": engine_tokens,
        "engine_matches_torch": engine_tokens[:n] == torch_tokens[: len(engine_tokens)],
    }
    if per_module and images is not None:
        report["per_module"] = per_module_report(model, torch_model, images)
    return report
