"""High-level API — the equivalent of the reference's model builder + processor.

``load_pretrained_model`` mirrors /root/reference/omchat/model/builder.py:22
(tokenizer + model + image processor + context length) and returns a ready
:class:`~omchat_tpu.runtime.generate.OmChatEngine`.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

from omchat_tpu.checkpoint.loader import load_omchat_checkpoint
from omchat_tpu.config import GenerationConfig, OmChatConfig
from omchat_tpu.processing.image_processor import OmChatImageProcessor
from omchat_tpu.processing.processor import OmChatProcessor
from omchat_tpu.runtime.generate import OmChatEngine


@dataclass
class OmChatModel:
    """Bundled tokenizer + engine + processors (the builder.py return tuple,
    plus the jitted engine)."""

    tokenizer: object
    engine: OmChatEngine
    image_processor: OmChatImageProcessor
    processor: OmChatProcessor
    config: OmChatConfig
    context_len: int = 8192

    def chat(
        self,
        text: str,
        image=None,
        history=None,
        generation: Optional[GenerationConfig] = None,
        stream_callback=None,
        speculative: bool = False,
        guided_choices=None,
        json_mode: bool = False,
        json_schema: Optional[dict] = None,
        num_beams: int = 1,
    ) -> str:
        """One chat turn: build the anyres context, generate, decode.

        ``speculative=True`` (greedy only) decodes with prompt-lookup
        speculation — bit-identical tokens, fewer device steps on
        echo-heavy continuations (summarization/extraction).

        ``guided_choices``: restrict the reply to one of these strings via
        trie-masked decoding (runtime/constrained.py) — e.g. MC eval letters.

        ``json_mode``: constrain the reply to a valid JSON object
        (runtime/json_mode.py — OpenAI ``response_format: json_object``).

        ``json_schema``: constrain the reply to conform to this JSON schema
        (runtime/json_schema.py — OpenAI structured outputs / vLLM
        guided_json; see the module docstring for the supported subset)."""
        inputs = self.processor(text, images=image, history=history)
        gen = generation or GenerationConfig()
        if num_beams > 1:
            # reference parity: single_inference.py exposes num_beams through
            # HF generate; here it routes to runtime/beam_search.py (greedy
            # scoring; incompatible with sampling/constrained decoding)
            if gen.do_sample or guided_choices or json_mode or json_schema is not None:
                raise ValueError("num_beams > 1 is greedy-only (no sampling/constrained decoding)")
            from omchat_tpu.runtime.beam_search import beam_search

            ids = beam_search(
                self.engine,
                inputs["input_ids"][0].tolist(),
                inputs.get("images"),
                num_beams=num_beams,
                max_new_tokens=gen.max_new_tokens,
                eos_token_id=gen.eos_token_id,
            )
            return self.tokenizer.decode(ids, skip_special_tokens=True)
        if speculative and not gen.do_sample and not guided_choices and not json_mode and json_schema is None:
            from omchat_tpu.runtime.speculative import generate_speculative

            ids, _ = generate_speculative(
                self.engine,
                inputs["input_ids"][0].tolist(),
                inputs.get("images"),
                gen,
                stream_callback=stream_callback,
            )
            return self.tokenizer.decode(ids, skip_special_tokens=True)
        allowed_fn = None
        if guided_choices:
            from omchat_tpu.runtime.constrained import choice_mask_fn

            allowed_fn = choice_mask_fn(self.tokenizer, list(guided_choices))
        elif json_schema is not None:
            from omchat_tpu.runtime.json_schema import get_json_schema_mode

            allowed_fn = get_json_schema_mode(self.tokenizer, json_schema).mask_fn()
        elif json_mode:
            from omchat_tpu.runtime.json_mode import get_json_mode

            allowed_fn = get_json_mode(self.tokenizer).mask_fn()
        extra = {}
        if self.config.mm_patch_merge_type.startswith("spatial") and "images" in inputs:
            # OmChat-v1 assembly: variable tokens per image sentinel
            extra = {
                "num_patches": inputs["num_patches"].tolist(),
                "image_sizes": inputs["image_sizes"],
            }
        out = self.engine.generate(
            [inputs["input_ids"][0].tolist()],
            inputs.get("images"),
            gen,
            stream_callback=stream_callback,
            tokenizer=self.tokenizer,
            allowed_tokens_fn=allowed_fn,
            **extra,
        )
        return self.tokenizer.decode(out.token_ids[0], skip_special_tokens=True)

    def chat_tools(
        self,
        text: str,
        tools: list,
        image=None,
        history=None,
        tool_choice="auto",
        generation: Optional[GenerationConfig] = None,
        system: str = "You are a helpful assistant.",
    ) -> dict:
        """One chat turn with OpenAI-style tool calling (runtime/tool_calls.py).

        Returns ``{"content": str | None, "tool_calls": [{"id", "type",
        "function": {"name", "arguments"}}, ...]}``.  ``tool_choice``
        "required" or ``{"type": "function", "function": {"name": ...}}``
        constrains decoding via the schema-guided mask, so the call is
        guaranteed well-formed JSON naming a declared tool; "auto" parses
        ``<tool_call>`` blocks out of an unconstrained completion."""
        import json as _json

        from omchat_tpu.runtime.json_schema import get_json_schema_mode
        from omchat_tpu.runtime.tool_calls import (
            forced_call_schema,
            parse_tool_calls,
            parse_tool_choice,
            render_tools_system,
            validate_tools,
            wire_tool_calls,
        )

        fns = validate_tools(tools)
        mode, forced_name = parse_tool_choice(tool_choice, fns)
        if mode != "none":
            system = render_tools_system(system, fns)
        inputs = self.processor(text, images=image, history=history, system=system)
        gen = generation or GenerationConfig()
        allowed_fn = None
        if mode == "forced":
            schema = forced_call_schema(fns, forced_name)
            try:
                allowed_fn = get_json_schema_mode(self.tokenizer, schema).mask_fn()
            except ValueError:
                schema = forced_call_schema([{"name": f["name"]} for f in fns], forced_name)
                allowed_fn = get_json_schema_mode(self.tokenizer, schema).mask_fn()
        out = self.engine.generate(
            [inputs["input_ids"][0].tolist()],
            inputs.get("images"),
            gen,
            tokenizer=self.tokenizer,
            allowed_tokens_fn=allowed_fn,
        )
        reply = self.tokenizer.decode(out.token_ids[0], skip_special_tokens=True)
        if mode == "forced":
            try:
                obj = _json.loads(reply)
                calls = [{"name": obj["name"],
                          "arguments": _json.dumps(obj.get("arguments", {}), ensure_ascii=False)}]
                return {"content": None, "tool_calls": wire_tool_calls(calls)}
            except (_json.JSONDecodeError, KeyError, TypeError):
                return {"content": reply, "tool_calls": []}
        content, calls = parse_tool_calls(reply)
        return {"content": content, "tool_calls": wire_tool_calls(calls)}

    def chat_video(
        self,
        text: str,
        frames,
        num_samples: int = 32,
        generation: Optional[GenerationConfig] = None,
        stream_callback=None,
    ) -> str:
        """Video QA: uniform frame sampling, one ViT tile + sentinel per frame
        (the 32-frame MMBench-Video configuration; fixes the reference's
        undefined encode_videos, SURVEY.md §5)."""
        from omchat_tpu.processing.chat import make_context
        from omchat_tpu.processing.video import process_video_frames, video_prompt

        pixel_values = process_video_frames(
            frames, tile_size=self.config.vision.image_size, num_samples=num_samples
        )
        prompt = video_prompt(text, pixel_values.shape[0])
        _, context_tokens = make_context(self.tokenizer, prompt, None, "You are a helpful assistant.")
        out = self.engine.generate(
            [context_tokens],
            pixel_values,
            generation or GenerationConfig(),
            stream_callback=stream_callback,
            tokenizer=self.tokenizer,
        )
        return self.tokenizer.decode(out.token_ids[0], skip_special_tokens=True)


def load_pretrained_model(
    model_path: str,
    dtype=jnp.bfloat16,
    *,
    quantize_int8: bool = False,
    w8a8: bool = False,
    attn_impl: Optional[str] = None,
    tp: int = 1,
    cache_dtype=None,
    lora_path: Optional[str] = None,
) -> OmChatModel:
    """Load an OmChat checkpoint directory (HF-bundle or repo-native layout).

    ``tp > 1`` shards the weights Megatron-style over a (1, tp) device mesh
    (pjit/GSPMD inserts the ICI collectives) — the genuinely-parallel
    replacement for the reference's sequential ``device_map="auto"`` layer
    placement (builder.py:22-28).

    ``cache_dtype``: KV-cache storage override (e.g. ``jnp.float8_e4m3fn``
    for half-HBM long-context caches; kernels dequantize on load).

    ``w8a8``: the single-chip serving mode every BENCH.md headline runs —
    int8×int8 MXU matmuls on the compute-bound paths (ViT encode + LLM
    prefill; decode stays weight-only int8).  Implies ``quantize_int8`` and
    calibrates the ViT's static fc1 activation scales at load with one
    synthetic forward (~seconds; the quantizing fc1 epilogue then keeps the
    wide bf16 intermediate out of HBM — BENCH.md's measured ViT win).
    """
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(model_path, use_fast=True)
    config, params = load_omchat_checkpoint(model_path, dtype)
    if lora_path is not None:
        from omchat_tpu.checkpoint.loader import load_lora_adapter
        from omchat_tpu.training.lora import merge_lora

        # merge in bf16 BEFORE quantization so int8 scales cover the
        # fine-tuned weights, not the base
        params = merge_lora(params, load_lora_adapter(lora_path, dtype))
    if w8a8:
        config = config.with_w8a8()
    if quantize_int8 or w8a8:
        from omchat_tpu.ops.linear import quantize_tree

        params = quantize_tree(params)
    if w8a8:
        import numpy as _np

        from omchat_tpu.models.intern_vit import calibrate_fc1_scales

        pixels = jnp.asarray(
            _np.random.default_rng(0).standard_normal(
                (2, 3, config.vision.image_size, config.vision.image_size)
            ),
            jnp.bfloat16,
        )
        params["vision_tower"] = calibrate_fc1_scales(params["vision_tower"], config.vision, pixels)
    mesh = None
    if tp > 1:
        import jax

        from omchat_tpu.parallel.mesh import create_mesh
        from omchat_tpu.parallel.sharding import omchat_param_specs, shard_params

        # serving mesh is pure TP: exactly tp devices, no data axis
        mesh = create_mesh(tp=tp, devices=jax.devices()[:tp])
        params = shard_params(params, mesh, omchat_param_specs(config, params))
    engine = OmChatEngine(config, params, attn_impl=attn_impl, mesh=mesh, cache_dtype=cache_dtype)
    image_processor = OmChatImageProcessor(
        crop_size=config.vision.image_size,
        shortest_edge=config.vision.image_size,
        image_grid_pinpoints=config.image_grid_pinpoints,
    )
    processor = OmChatProcessor(
        tokenizer,
        image_processor,
        patch_expand=not config.mm_patch_merge_type.startswith("spatial"),
    )
    context_len = config.tokenizer_model_max_length or 8192
    return OmChatModel(tokenizer, engine, image_processor, processor, config, context_len)
