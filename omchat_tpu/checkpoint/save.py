"""Checkpoint saving: pytree → safetensors (HF layout) and orbax train state.

The export side of the weight-name contract (the counterpart of
/root/reference/convert_omchat_to_hf.py): :func:`save_hf_safetensors` writes
the HF-bundle key layout (``vision_tower.*``, ``multi_modal_projector.*``,
``language_model.*``) so checkpoints round-trip through
:mod:`omchat_tpu.checkpoint.loader`.

:class:`TrainCheckpointer` is the training-side save/auto-resume, replacing
the reference's dead torch-AMP/deepspeed checkpoint machinery
(multimodal_encoder/utils.py:444-517) with orbax.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional

import jax
import numpy as np


def _t(a) -> np.ndarray:
    return np.asarray(a)


def flatten_to_hf_state(params: dict) -> Dict[str, np.ndarray]:
    """Inverse of loader.convert_omchat_state_dict: pytree → flat HF-layout
    torch-convention (transposed, unstacked) tensors."""
    out: Dict[str, np.ndarray] = {}

    def vis(p: dict, prefix: str):
        out[f"{prefix}embeddings.class_embedding"] = _t(p["class_embedding"]).reshape(1, 1, -1)
        out[f"{prefix}embeddings.position_embedding"] = _t(p["position_embedding"])[None]
        out[f"{prefix}embeddings.patch_embedding.weight"] = _t(
            p["patch_embedding"]["kernel"]
        ).transpose(3, 2, 0, 1)
        out[f"{prefix}embeddings.patch_embedding.bias"] = _t(p["patch_embedding"]["bias"])
        layers = p["layers"]
        n = _t(layers["ls1"]).shape[0]
        for i in range(n):
            lp = f"{prefix}encoder.layers.{i}."
            out[lp + "norm1.weight"] = _t(layers["norm1"]["scale"][i])
            out[lp + "norm2.weight"] = _t(layers["norm2"]["scale"][i])
            if "bias" in layers["norm1"]:
                out[lp + "norm1.bias"] = _t(layers["norm1"]["bias"][i])
                out[lp + "norm2.bias"] = _t(layers["norm2"]["bias"][i])
            out[lp + "ls1"] = _t(layers["ls1"][i])
            out[lp + "ls2"] = _t(layers["ls2"][i])
            out[lp + "attn.qkv.weight"] = _t(layers["attn"]["qkv"]["kernel"][i]).T
            if "bias" in layers["attn"]["qkv"]:
                out[lp + "attn.qkv.bias"] = _t(layers["attn"]["qkv"]["bias"][i])
            out[lp + "attn.proj.weight"] = _t(layers["attn"]["proj"]["kernel"][i]).T
            out[lp + "attn.proj.bias"] = _t(layers["attn"]["proj"]["bias"][i])
            if "q_norm" in layers["attn"]:
                out[lp + "attn.q_norm.weight"] = _t(layers["attn"]["q_norm"]["scale"][i])
                out[lp + "attn.k_norm.weight"] = _t(layers["attn"]["k_norm"]["scale"][i])
            out[lp + "mlp.fc1.weight"] = _t(layers["mlp"]["fc1"]["kernel"][i]).T
            out[lp + "mlp.fc1.bias"] = _t(layers["mlp"]["fc1"]["bias"][i])
            out[lp + "mlp.fc2.weight"] = _t(layers["mlp"]["fc2"]["kernel"][i]).T
            out[lp + "mlp.fc2.bias"] = _t(layers["mlp"]["fc2"]["bias"][i])

    def lm(p: dict, prefix: str):
        out[f"{prefix}model.embed_tokens.weight"] = _t(p["embed_tokens"])
        layers = p["layers"]
        if np.ndim(layers["input_layernorm"]["scale"]) != 2:
            # a silently exported staged tree would write wrongly-shaped 3D/4D
            # weight tensors that torch loads as garbage
            raise ValueError(
                "staged pipeline-parallel layer tree ([S, L/S, ...] leaves); "
                "call training.train_step.unstage_params(params) before export"
            )
        n = _t(layers["input_layernorm"]["scale"]).shape[0]
        for i in range(n):
            lp = f"{prefix}model.layers.{i}."
            out[lp + "input_layernorm.weight"] = _t(layers["input_layernorm"]["scale"][i])
            out[lp + "post_attention_layernorm.weight"] = _t(
                layers["post_attention_layernorm"]["scale"][i]
            )
            for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
                pp = layers["self_attn"][name]
                out[lp + f"self_attn.{name}.weight"] = _t(pp["kernel"][i]).T
                if "bias" in pp:
                    out[lp + f"self_attn.{name}.bias"] = _t(pp["bias"][i])
            mlp = layers["mlp"]
            if "gate_proj" in mlp:  # dense
                for name in ("gate_proj", "up_proj", "down_proj"):
                    out[lp + f"mlp.{name}.weight"] = _t(mlp[name]["kernel"][i]).T
            else:  # MoE
                out[lp + "mlp.gate.weight"] = _t(mlp["gate"]["kernel"][i]).T
                e = _t(mlp["experts"]["gate_proj"]).shape[1]
                for j in range(e):
                    for name in ("gate_proj", "up_proj", "down_proj"):
                        out[lp + f"mlp.experts.{j}.{name}.weight"] = _t(
                            mlp["experts"][name][i, j]
                        ).T
                for name in ("gate_proj", "up_proj", "down_proj"):
                    out[lp + f"mlp.shared_expert.{name}.weight"] = _t(
                        mlp["shared_expert"][name]["kernel"][i]
                    ).T
                out[lp + "mlp.shared_expert_gate.weight"] = _t(
                    mlp["shared_expert_gate"]["kernel"][i]
                ).T
        out[f"{prefix}model.norm.weight"] = _t(p["norm"]["scale"])
        if "lm_head" in p:
            out[f"{prefix}lm_head.weight"] = _t(p["lm_head"]["kernel"]).T

    vis(params["vision_tower"], "vision_tower.")
    for name, pp in params.get("projector", {}).items():
        out[f"multi_modal_projector.{name}.weight"] = _t(pp["kernel"]).T
        if "bias" in pp:
            out[f"multi_modal_projector.{name}.bias"] = _t(pp["bias"])
    lm(params["language_model"], "language_model.")
    if "image_newline" in params:  # v1 spatial_unpad newline embedding
        out["image_newline"] = _t(params["image_newline"])
    return out


def save_hf_safetensors(params: dict, directory: str, max_shard_bytes: int = 4 << 30) -> None:
    """Write the pytree as sharded safetensors in the HF-bundle layout."""
    from safetensors.numpy import save_file

    os.makedirs(directory, exist_ok=True)
    state = flatten_to_hf_state(params)
    shards, cur, cur_bytes = [], {}, 0
    for k, v in state.items():
        if cur_bytes + v.nbytes > max_shard_bytes and cur:
            shards.append(cur)
            cur, cur_bytes = {}, 0
        cur[k] = v
        cur_bytes += v.nbytes
    shards.append(cur)
    weight_map = {}
    total = 0
    for i, shard in enumerate(shards):
        name = (
            "model.safetensors"
            if len(shards) == 1
            else f"model-{i + 1:05d}-of-{len(shards):05d}.safetensors"
        )
        for k, v in shard.items():
            weight_map[k] = name
            total += v.nbytes
        # safetensors writes the raw buffer; transposed views must be
        # materialized C-contiguous or the file holds pre-transpose bytes.
        shard = {k: np.ascontiguousarray(v) for k, v in shard.items()}
        save_file(shard, os.path.join(directory, name))
    if len(shards) > 1:
        # HF from_pretrained requires the shard index for multi-file checkpoints
        import json

        with open(os.path.join(directory, "model.safetensors.index.json"), "w") as f:
            json.dump({"metadata": {"total_size": total}, "weight_map": weight_map}, f)


def export_hf_bundle(config, params: dict, directory: str, source_dir: Optional[str] = None) -> None:
    """Write a complete loadable HF-bundle directory — the full
    ``save_pretrained``-equivalent surface of the reference converter
    (convert_omchat_to_hf.py:104-106): sharded safetensors (+ index when
    multi-file), config.json with ``auto_map`` entries, the self-contained
    ``trust_remote_code`` model/processor code files (so the directory loads
    through ``AutoModel.from_pretrained(..., trust_remote_code=True)`` exactly
    like the reference's output, hf_example.py:9-16),
    preprocessor_config.json / processor_config.json, and the tokenizer files
    carried over from ``source_dir``."""
    import json
    import shutil

    os.makedirs(directory, exist_ok=True)
    save_hf_safetensors(params, directory)

    # trust_remote_code bundle: standalone torch/transformers code files
    # (omchat_tpu/export/hf_code/) copied next to the weights.
    code_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "export", "hf_code"
    )
    code_files = [
        "configuration_omchat.py",
        "modeling_omchat.py",
        "processing_omchat.py",
        "image_processing_omchat.py",
    ]
    for name in code_files:
        shutil.copy(os.path.join(code_dir, name), os.path.join(directory, name))
    auto_map = {
        "AutoConfig": "configuration_omchat.OmChatConfig",
        "AutoModel": "modeling_omchat.OmChatForConditionalGeneration",
        "AutoModelForCausalLM": "modeling_omchat.OmChatForConditionalGeneration",
        "AutoProcessor": "processing_omchat.OmChatProcessor",
        "AutoImageProcessor": "image_processing_omchat.OmChatImageProcessor",
    }

    # config.json: start from the source checkpoint's config (preserves keys we
    # don't model) and overlay the canonical HF-bundle fields.
    base = {}
    if source_dir:
        src_cfg = os.path.join(source_dir, "config.json")
        if os.path.exists(src_cfg):
            with open(src_cfg) as f:
                base = json.load(f)
    base.update(config.to_hf_dict())
    base["auto_map"] = auto_map
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump(base, f, indent=2)

    # Image-processor config (hf/image_processing_omchat.py preprocess params).
    pre = {
        "image_processor_type": "OmChatImageProcessor",
        "processor_class": "OmChatProcessor",
        "auto_map": {
            "AutoImageProcessor": "image_processing_omchat.OmChatImageProcessor",
            "AutoProcessor": "processing_omchat.OmChatProcessor",
        },
        "crop_size": {"height": config.vision.image_size, "width": config.vision.image_size},
        "size": {"shortest_edge": config.vision.image_size},
        "image_grid_pinpoints": [list(p) for p in config.image_grid_pinpoints],
        "image_mean": [0.485, 0.456, 0.406],
        "image_std": [0.229, 0.224, 0.225],
        "do_resize": True,
        "do_center_crop": True,
        "do_rescale": True,
        "do_normalize": True,
        "rescale_factor": 1 / 255,
    }
    with open(os.path.join(directory, "preprocessor_config.json"), "w") as f:
        json.dump(pre, f, indent=2)
    with open(os.path.join(directory, "processor_config.json"), "w") as f:
        json.dump(
            {
                "processor_class": "OmChatProcessor",
                "auto_map": {"AutoProcessor": "processing_omchat.OmChatProcessor"},
            },
            f,
            indent=2,
        )

    if source_dir:
        for name in os.listdir(source_dir):
            if "token" in name or name.endswith(".model") or name == "generation_config.json":
                shutil.copy(os.path.join(source_dir, name), os.path.join(directory, name))


def save_mm_projector(directory: str, projector: dict) -> str:
    """Write a projector-only checkpoint — the ``pretrain_mm_mlp_adapter``
    artifact of LLaVA/OmChat stage-1 training (reference omchat_arch.py:238-247
    loads exactly this: projector weights keyed under ``mm_projector``).

    Linear/mlpNx projectors ({linear_N: {kernel, bias}}) are written in the
    HF-bundle layout (``multi_modal_projector.linear_N.{weight,bias}``,
    torch-convention transposed) so the file also loads into the reference
    stack; other projector types (cabstract) use dotted native keys under
    ``projector.``.  Returns the file path."""
    from safetensors.numpy import save_file

    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, "mm_projector.safetensors")
    linear_shape = projector and all(
        re.match(r"^linear_\d+$", k) and set(v) <= {"kernel", "bias"}
        for k, v in projector.items()
    )
    flat: Dict[str, np.ndarray] = {}
    if linear_shape:
        for name, pp in projector.items():
            flat[f"multi_modal_projector.{name}.weight"] = _t(pp["kernel"]).T
            if "bias" in pp:
                flat[f"multi_modal_projector.{name}.bias"] = _t(pp["bias"])
    else:
        for path_elems, leaf in jax.tree_util.tree_flatten_with_path(projector)[0]:
            key = ".".join(str(getattr(p, "key", p)) for p in path_elems)
            flat[f"projector.{key}"] = _t(leaf)
    # safetensors writes the raw buffer; transposed views must be
    # materialized C-contiguous or the file holds pre-transpose bytes
    save_file({k: np.ascontiguousarray(v) for k, v in flat.items()}, path)
    return path


def save_lora_adapter(directory: str, lora: dict, *, base_model: Optional[str] = None) -> None:
    """Write a LoRA adapter tree (training/lora.py layout: ``layers.{group}
    .{name}.{a,b}`` stacked [L, ...] leaves + scalar ``scale``) as
    ``adapter_model.safetensors`` + ``adapter_config.json``.

    The PEFT-shaped artifact the reference's users expect (its builder
    imports peft, builder.py:13): base checkpoint + small adapter file,
    mergeable at load via ``load_pretrained_model(lora_path=...)``."""
    import json

    from safetensors.numpy import save_file

    os.makedirs(directory, exist_ok=True)
    flat: Dict[str, np.ndarray] = {}
    targets = set()
    rank = None
    for group, adapters in lora["layers"].items():
        for name, ab in adapters.items():
            flat[f"layers.{group}.{name}.a"] = _t(ab["a"])
            flat[f"layers.{group}.{name}.b"] = _t(ab["b"])
            targets.add(name)
            rank = int(ab["a"].shape[-1])
    save_file(flat, os.path.join(directory, "adapter_model.safetensors"))
    cfg = {
        "format": "omchat-tpu-lora",
        "scale": float(lora["scale"]),
        "rank": rank,
        "targets": sorted(targets),
    }
    if base_model:
        cfg["base_model"] = base_model
    with open(os.path.join(directory, "adapter_config.json"), "w") as f:
        json.dump(cfg, f, indent=2)


class TrainCheckpointer:
    """orbax-backed train-state save + latest-scan auto-resume
    (the working replacement for multimodal_encoder/utils.py:444-517)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state) -> None:
        import orbax.checkpoint as ocp

        self.manager.save(step, args=ocp.args.StandardSave(state))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_template):
        """Auto-resume: restore the latest checkpoint into the template's
        structure/shardings; returns (state, step) or (template, None)."""
        import orbax.checkpoint as ocp

        step = self.manager.latest_step()
        if step is None:
            return state_template, None
        restored = self.manager.restore(step, args=ocp.args.StandardRestore(state_template))
        return restored, step
