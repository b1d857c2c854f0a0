"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so pjit/shard_map shardings and
collectives can be exercised without a TPU pod (the TPU-native substitute for
distributed tests — SURVEY.md §4).  Env vars must be set before jax imports.
"""

import os
import sys

# The ambient environment presets JAX_PLATFORMS=axon (the tunneled TPU); tests
# must run on CPU with virtual devices, so force-override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = "/root/reference"

sys.path.insert(0, REPO_ROOT)
# Test-only shims (e.g. a minimal `timm` so the reference torch model can be
# imported as a golden-parity oracle).
sys.path.insert(0, os.path.join(REPO_ROOT, "tests", "_shims"))

import jax

# The container's sitecustomize.py registers the axon TPU plugin and sets
# jax.config.jax_platforms="axon,cpu" in-process, which overrides the env var —
# override it back before any backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# ---------------------------------------------------------------------------
# Test tiers.  The Pallas-interpret / golden-parity heavyweights dominate the
# suite (>45 s each on CPU); they carry @slow so CI and the round driver get a
# fast green signal from `pytest -m "not slow"` (<5 min at -n 8) while
# `pytest tests/` still runs everything.  Measured with --durations=0; keyed
# (file, test-function) so parametrized families tier together.
# ---------------------------------------------------------------------------

SLOW_TESTS = {
    ("test_lora.py", "test_gradients_only_on_adapters_and_loss_descends"),
    ("test_lora.py", "test_qlora_int8_base"),
    ("test_lora.py", "test_zero_init_is_identity"),
    ("test_mm_projector.py", "test_stage1_updates_projector_only"),
    ("test_api_e2e.py", "test_load_pretrained_model_int8"),
    ("test_api_e2e.py", "test_load_pretrained_model_chat"),
    ("test_api_e2e.py", "test_load_w8a8_mode"),
    ("test_intern_vit_parity.py", "test_intern_vit_matches_reference"),
    ("test_sharding.py", "test_train_step_runs_sharded"),
    ("test_sharding.py", "test_sequence_parallel_train_step_matches"),
    ("test_sharding.py", "test_moe_expert_parallel_matches_single_device"),
    ("test_sharding.py", "test_tp_quantized_params_shard"),
    ("test_sharding.py", "test_tp_batch_engine_matches_single_device"),
    ("test_sharding.py", "test_tp_generation_matches_single_device"),
    ("test_sharding.py", "test_tp_chunked_prefill_matches_single_device"),
    ("test_paged_engine.py", "test_multimodal_grouped_chunk_prefill"),
    ("test_paged_engine.py", "test_paged_engine_matches_single_request"),
    ("test_paged_engine.py", "test_chunked_paged_prefill_matches_contiguous"),
    ("test_paged_engine.py", "test_short_prefill_length_bucketing"),
    ("test_paged_engine.py", "test_decode_roll_matches_single_step"),
    ("test_paged_engine.py", "test_paged_sampling_deterministic"),
    ("test_clip_siglip_parity.py", "test_siglip_vision_matches_hf"),
    ("test_clip_siglip_parity.py", "test_clip_vision_matches_hf"),
    ("test_omchat_e2e.py", "test_fusion_logits_match_reference"),
    ("test_flash_bwd.py", "test_mqa_group_slicing"),
    ("test_flash_bwd.py", "test_flash_grads_packed_segments"),
    ("test_flash_bwd.py", "test_flash_grads_packed_isolation"),
    ("test_flash_bwd.py", "test_flash_grads_match_xla"),
    ("test_eval_harness.py", "test_perplexity_matches_manual"),
    ("test_batch_engine.py", "test_interleaved_matches_isolated"),
    ("test_batch_engine.py", "test_more_requests_than_slots"),
    ("test_llm_glue.py", "test_qwen2_glue_trunk_matches_unfused_w8a8"),
    ("test_llm_glue.py", "test_qwen2_glue_nonsquare_oproj_fallback"),
    ("test_qwen2_parity.py", "test_qwen2_rope_scaling_matches_hf"),
    ("test_qwen2_parity.py", "test_qwen2_prefill_decode_cache_parity"),
    ("test_checkpoint_roundtrip.py", "test_export_hf_bundle_loads_end_to_end"),
    ("test_checkpoint_roundtrip.py", "test_safetensors_roundtrip"),
    ("test_checkpoint_roundtrip.py", "test_repo_native_key_layout_loads"),
    ("test_constrained.py", "test_guided_generation_lands_on_a_choice"),
    ("test_anyres.py", "test_process_anyres_image_matches_reference"),
    ("test_lora_bank.py", "test_bank_matches_merged_weights"),
    ("test_cabstractor_parity.py", "test_cabstractor_init_matches_converted_structure"),
    ("test_pallas_kernels.py", "test_intern_vit_fused_path_matches_xla"),
    ("test_pallas_kernels.py", "test_intern_vit_glue_path_matches_xla_w8a8"),
    ("test_pallas_kernels.py", "test_anchored_softmax_matches_online"),
    ("test_prefix_cache.py", "test_soak_with_prefix_cache"),
    ("test_prefix_cache.py", "test_multiturn_vqa_reuses_image_pages"),
    ("test_prefix_cache.py", "test_cache_pages_evict_under_pressure"),
    ("test_qwen2_moe_parity.py", "test_moe_batch_engine"),
    ("test_qwen2_moe_parity.py", "test_moe_decode_cache_parity"),
    ("test_feature_cache.py", "test_engine_reuses_repeated_image"),
    ("test_packing.py", "test_packed_train_step_runs_sharded"),
    ("test_packing.py", "test_packed_loss_matches_unpacked"),
    ("test_pipeline_ulysses.py", "test_pipeline_qwen2_trunk"),
    ("test_vision_tokenizer.py", "test_finetune_step_on_extended_vocab"),
    ("test_paged_attention.py", "test_fp8_pool_both_kernels"),
    ("test_intern_vit_parity.py", "test_intern_vit_rectangular_input"),
    ("test_api_e2e.py", "test_chat_tools_forced"),
    ("test_api_e2e.py", "test_load_pretrained_model_lora"),
    ("test_pallas_kernels.py", "test_intern_vit_static_fc1_scales_match_dynamic"),
    ("test_pallas_kernels.py", "test_grouped_gqa_group7"),
    ("test_paged_engine.py", "test_randomized_workload_soak"),
    ("test_lora_bank.py", "test_bank_row0_is_base"),
    ("test_eval_harness.py", "test_mantis_end_to_end"),
    ("test_eval_harness.py", "test_mmbench_video_end_to_end"),
    ("test_lora.py", "test_merge_matches_adapter_forward"),
    ("test_qwen2_moe_parity.py", "test_moe_gmm_matches_dense"),
    ("test_llm_glue.py", "test_calibrate_swiglu_scales_and_static_path"),
    ("test_checkpoint_roundtrip.py", "test_orbax_train_checkpoint_resume"),
    ("test_anyres.py", "test_hf_image_processor_matches_reference"),
    ("test_json_schema.py", "test_cache_and_engine_integration"),
    ("test_trust_remote_code.py", "test_parity_runbook_reports_full_match"),
    ("test_trust_remote_code.py", "test_automodel_greedy_matches_jax_engine"),
    ("test_anyres.py", "test_select_best_resolution_matches_reference"),
    ("test_batch_engine.py", "test_batched_sampling_deterministic_and_mixed"),
    ("test_batch_engine.py", "test_late_join_does_not_disturb_running_request"),
    ("test_batch_engine.py", "test_sample_batch_per_row_params"),
    ("test_cabstractor_parity.py", "test_cabstractor_matches_reference"),
    ("test_chunked_prefill.py", "test_chunked_prefill_matches_oneshot"),
    ("test_chunked_prefill.py", "test_chunked_prefill_nonmultiple_cache"),
    ("test_feature_cache.py", "test_paged_engine_image_cache_key"),
    ("test_flash_bwd.py", "test_flash_grads_gqa"),
    ("test_flash_bwd.py", "test_flash_grads_nonmultiple_seq"),
    ("test_intern_vit_parity.py", "test_pos_embed_interpolation_matches_torch"),
    ("test_legacy_features.py", "test_beam1_equals_greedy"),
    ("test_legacy_features.py", "test_beam_search_improves_logprob"),
    ("test_legacy_features.py", "test_v1_assembly_end_to_end"),
    ("test_llm_glue.py", "test_glue_decode_step_unchanged"),
    ("test_lora.py", "test_adapter_save_load_roundtrip"),
    ("test_lora_bank.py", "test_bank_through_decode_cache"),
    ("test_lora_bank.py", "test_mixed_adapter_continuous_batch"),
    ("test_lora_bank.py", "test_mixed_batch_rows_independent"),
    ("test_omchat_e2e.py", "test_batch_generation_varied_lengths"),
    ("test_omchat_e2e.py", "test_greedy_decode_matches_reference"),
    ("test_packing.py", "test_segment_isolation"),
    ("test_paged_attention.py", "test_manual_dma_decode_matches_production"),
    ("test_paged_engine.py", "test_batched_short_prefill_path_taken"),
    ("test_paged_engine.py", "test_cancel_queued_request"),
    ("test_paged_engine.py", "test_fp8_page_pool"),
    ("test_paged_engine.py", "test_kv_write_variants_agree"),
    ("test_paged_engine.py", "test_pages_are_reused_across_waves"),
    ("test_pallas_kernels.py", "test_attn_proj_glue_quant_matches_chain"),
    ("test_pallas_kernels.py", "test_bntd_kv_format"),
    ("test_pallas_kernels.py", "test_dense_prequant_gelu_quant_contract"),
    ("test_pallas_kernels.py", "test_fc1_gelu_quant_pallas_matches_xla_chain"),
    ("test_pallas_kernels.py", "test_flash_decode_matches_xla"),
    ("test_pallas_kernels.py", "test_gqa_with_lengths_and_offset"),
    ("test_pallas_kernels.py", "test_grouped_gqa_multi_kv_tile_default_blocks"),
    ("test_pallas_kernels.py", "test_packed_qkv_norm_attention_matches_split_path"),
    ("test_pallas_kernels.py", "test_segment_ids_pallas_matches_xla"),
    ("test_pipeline_ulysses.py", "test_pipeline_train_optimizer_descends"),
    ("test_pipeline_ulysses.py", "test_pipeline_train_step_matches_sequential"),
    ("test_pipeline_ulysses.py", "test_ulysses_matches_full_attention"),
    ("test_prefix_cache.py", "test_concurrent_twins_are_correct"),
    ("test_prefix_cache.py", "test_different_image_no_false_hit"),
    ("test_prefix_cache.py", "test_prefix_hit_suffixes_batch_into_one_dispatch"),
    ("test_prefix_cache.py", "test_second_request_hits_and_output_matches"),
    ("test_quantization.py", "test_quantized_generation_argmax_stable"),
    ("test_quantization.py", "test_w8a8_generation_argmax_stable"),
    ("test_qwen2_moe_parity.py", "test_moe_engine_generate_matches_hf"),
    ("test_qwen2_moe_parity.py", "test_moe_logits_match_hf"),
    ("test_qwen2_moe_parity.py", "test_moe_paged_engine"),
    ("test_qwen2_parity.py", "test_tied_embeddings"),
    ("test_ring_attention.py", "test_cp_train_step_matches_single_device"),
    ("test_ring_attention.py", "test_ring_attention_gqa"),
    ("test_serve.py", "test_image_completion"),
    ("test_serve.py", "test_tool_calling_forced"),
    ("test_serve.py", "test_warmup_engines"),
    ("test_sharding.py", "test_tp_paged_engine_matches_single_device"),
    ("test_sharding.py", "test_vocab_parallel_ce_matches_dense"),
    ("test_speculative.py", "test_speculative_greedy_equivalence"),
    ("test_tower_dispatch.py", "test_tower_forward_through_dispatch"),
    ("test_tp_attention.py", "test_attention_tuple_impl_dispatch"),
    ("test_tp_attention.py", "test_tp_flash_matches_xla"),
    ("test_trust_remote_code.py", "test_parity_in_repo_twin"),
    ("test_video.py", "test_video_generation_e2e"),
    ("test_anyres.py", "test_resize_and_pad_matches_reference"),
    ("test_batch_engine.py", "test_cancel_frees_slot"),
    ("test_batch_engine.py", "test_fp8_shared_cache"),
    ("test_batch_engine.py", "test_generate_return_logprobs"),
    ("test_chat.py", "test_tokenizer_image_token_indexed_form"),
    ("test_chat.py", "test_tokenizer_image_token_matches_reference"),
    ("test_chunked_prefill.py", "test_chunked_prefill_batch_varied_lengths"),
    ("test_constrained.py", "test_api_chat_guided_choices"),
    ("test_feature_cache.py", "test_batch_engine_image_cache"),
    ("test_json_mode.py", "test_engine_generates_valid_json"),
    ("test_legacy_features.py", "test_clip_contrastive_loss"),
    ("test_legacy_features.py", "test_unpad_image_matches_reference"),
    ("test_legacy_features.py", "test_v1_image_newline_checkpoint_roundtrip"),
    ("test_llm_glue.py", "test_rmsnorm_quant_matches_unfused"),
    ("test_mm_projector.py", "test_save_load_roundtrip"),
    ("test_native_pipeline.py", "test_anyres_native_matches_python"),
    ("test_omchat_e2e.py", "test_ondevice_sampled_decode"),
    ("test_omchat_e2e.py", "test_text_only_generation"),
    ("test_paged_attention.py", "test_paged_prefill_matches_contiguous"),
    ("test_paged_engine.py", "test_cancel_releases_pages"),
    ("test_paged_engine.py", "test_decode_roll_keeps_documented_capacity"),
    ("test_paged_engine.py", "test_paged_xla_fallback_matches_contiguous"),
    ("test_pallas_kernels.py", "test_add_rmsnorm_quant_matches_unfused"),
    ("test_pallas_kernels.py", "test_causal_matches_xla"),
    ("test_pallas_kernels.py", "test_decode_group_not_multiple_of_8"),
    ("test_pallas_kernels.py", "test_noncausal_matches_xla"),
    ("test_pallas_kernels.py", "test_segment_ids_mismatched_block_padding"),
    ("test_pallas_kernels.py", "test_segment_ids_packing"),
    ("test_pallas_kernels.py", "test_segment_ids_pallas_matches_unpacked"),
    ("test_pipeline_ulysses.py", "test_pipeline_forward_matches_sequential"),
    ("test_prefix_cache.py", "test_decode_never_corrupts_shared_pages"),
    ("test_quantization.py", "test_fp8_kv_cache"),
    ("test_qwen2_parity.py", "test_qwen2_logits_match_hf"),
    ("test_ring_attention.py", "test_ring_attention_matches_dense"),
    ("test_serve.py", "test_bad_requests_get_400"),
    ("test_serve.py", "test_json_mode"),
    ("test_serve.py", "test_json_schema_structured_output"),
    ("test_serve.py", "test_logprobs"),
    ("test_serve.py", "test_metrics_endpoint"),
    ("test_serve.py", "test_stop_strings"),
    ("test_serve.py", "test_streaming_text_completions_with_usage"),
    ("test_serve.py", "test_text_completions_endpoint"),
    ("test_serve.py", "test_tool_calling_auto_and_history"),
    ("test_serve.py", "test_tool_calling_stream_buffered"),
    ("test_speculative.py", "test_speculative_saves_steps_on_repetitive_output"),
    ("test_trust_remote_code.py", "test_automodel_text_only_matches"),
    ("test_trust_remote_code.py", "test_bundle_has_code_and_auto_map"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = item.nodeid.split("::")[0].rsplit("/", 1)[-1]
        func = item.nodeid.split("::")[-1].split("[")[0]
        if (fname, func) in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def reference_path():
    """Path to the read-only reference checkout; adds it to sys.path on use."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return REFERENCE_ROOT


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


from omchat_tpu.utils.testing import MockTokenizer  # noqa: E402  (shared with dev/ harnesses)


@pytest.fixture(scope="session")
def mock_tokenizer():
    return MockTokenizer()
