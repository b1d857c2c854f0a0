"""Vision tower dispatch — the reference's builder
(/root/reference/omchat/model/multimodal_encoder/builder.py:7-16: name
containing "internvit-300m" → InternViT-300M, "internvit-6b" → InternViT-6B,
anything else → CLIP; SigLIP present but unreachable there — reachable here
via an explicit name).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax

from omchat_tpu.config import VisionConfig
from omchat_tpu.models.clip_vit import ClipVisionConfig, clip_vit_forward, convert_hf_clip_vision
from omchat_tpu.models.intern_vit import intern_vit_forward


@dataclass(frozen=True)
class VisionTower:
    """A tower = (config, forward, checkpoint converter)."""

    name: str
    config: object
    forward: Callable  # (params, config, pixel_values, *, feature_layer, attn_impl) -> hidden
    convert: Callable  # (torch state dict, config, dtype) -> params pytree

    @property
    def hidden_size(self) -> int:
        return self.config.hidden_size


def build_vision_tower(
    mm_vision_tower: str,
    config: Optional[object] = None,
    *,
    clip_smoe: bool = False,
    num_experts: int = 4,
    num_selected: int = 2,
) -> VisionTower:
    """Dispatch by tower name, reference-compatible (substring matching).

    ``clip_smoe``/``num_experts``/``num_selected`` are the legacy v1
    CLIP-SMoE knobs (omchat_llama.py:62-63,104-111): they turn the CLIP /
    SigLIP branch's layer MLPs into top-k routed expert banks
    (models/smoe.py).  InternViT towers ignore them, like the reference
    (clip_smoe only ever touched the CLIP tower's state dict)."""
    import dataclasses

    from omchat_tpu.checkpoint.loader import convert_vision_tower

    name = mm_vision_tower.lower()
    if "internvit-300m" in name or "intern_vit_300m" in name:
        cfg = config or VisionConfig.internvit_300m()
        return VisionTower(name, cfg, intern_vit_forward, convert_vision_tower)
    if "internvit" in name or "intern_vit" in name:
        cfg = config or VisionConfig.internvit_6b()
        return VisionTower(name, cfg, intern_vit_forward, convert_vision_tower)
    cfg = config or (
        ClipVisionConfig.siglip_so400m() if "siglip" in name else ClipVisionConfig()
    )
    # reference falls through to CLIP for any other name (builder.py:15-16)
    if clip_smoe and not cfg.clip_smoe:
        cfg = dataclasses.replace(
            cfg, clip_smoe=True, num_experts=num_experts, num_selected=num_selected
        )
    return VisionTower(name, cfg, clip_vit_forward, convert_hf_clip_vision)
