"""Decoder-trunk dispatch: dense Qwen2 or Qwen2-MoE, selected by config.

The reference ships two interchangeable language models —
``OmChatQwen2ForCausalLM`` (omchat_qwen2.py:29) and
``OmChatQwen2MoeForCausalLM`` (omchat_qwen2_moe.py:28-117) — picked by the
checkpoint's ``model_type``.  Here both forwards share one contract
(:func:`omchat_tpu.models.qwen2.qwen2_forward`), so the generation runtime and
serving engine stay decoder-agnostic: ``cfg.is_moe`` (``num_experts > 0`` in
the HF config) routes to the MoE trunk.
"""

from __future__ import annotations

from omchat_tpu.config import TextConfig
from omchat_tpu.models.qwen2 import qwen2_forward


def decoder_forward(params: dict, cfg: TextConfig, *args, **kwargs):
    """Same signature/returns as :func:`qwen2_forward`; MoE when configured."""
    if cfg.is_moe:
        from omchat_tpu.models.qwen2_moe import qwen2_moe_forward

        return qwen2_moe_forward(params, cfg, *args, **kwargs)
    return qwen2_forward(params, cfg, *args, **kwargs)
