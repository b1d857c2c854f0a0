"""Multimodal fine-tuning driver.

The reference never shipped its training entry point (SURVEY.md §4: zero
tests, dead training utilities only); this is the working loop: LLaVA-style
JSONL data (``{"image": ..., "conversations": [{"from": "human"/"gpt",
"value": ...}]}``), anyres tiling, ChatML targets with −100 masking on
prompt/image rows, sharded AdamW step with remat, orbax checkpoints with
auto-resume, JSONL metrics.

``--data`` points at the JSONL file (loss on the final assistant turn, prior
turns become ChatML history); ``--synthetic N`` instead runs N steps on
generated data (smoke/throughput mode, no dataset or tokenizer needed).
"""

import argparse
import os
import sys

# runnable from a checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from omchat_tpu.checkpoint.save import TrainCheckpointer
from omchat_tpu.config import OmChatConfig
from omchat_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from omchat_tpu.models.omchat import plan_multimodal_merge
from omchat_tpu.parallel.mesh import create_mesh
from omchat_tpu.parallel.sharding import omchat_param_specs, shard_params
from omchat_tpu.training.schedules import warmup_cosine_schedule
from omchat_tpu.training.train_step import (
    init_train_state,
    make_sharded_train_step,
)
from omchat_tpu.utils.logging import MetricLogger, build_logger
from omchat_tpu.utils.metrics_writer import JsonlMetricsWriter


def _pack_batch(cfg, batch_ids, batch_label_spans, pixels):
    """ids + (answer_start, answer_end) spans → device batch dict."""
    plan = plan_multimodal_merge(batch_ids, cfg.image_seq_len, bucket=128)
    labels = np.full_like(plan.token_ids, IGNORE_INDEX)
    for i, (a0, a1) in enumerate(batch_label_spans):
        labels[i, a0:a1] = plan.token_ids[i, a0:a1]
    labels[plan.is_image] = IGNORE_INDEX
    out = {
        "token_ids": jnp.asarray(plan.token_ids),
        "is_image": jnp.asarray(plan.is_image),
        "image_index": jnp.asarray(plan.image_index),
        "positions": jnp.asarray(plan.positions),
        "labels": jnp.asarray(labels),
    }
    if pixels is not None:
        out["pixel_values"] = jnp.asarray(pixels)
    return out


def synthetic_batch(cfg: OmChatConfig, batch: int, rng: np.random.Generator):
    n_text = 48
    ids = [5, 6, IMAGE_TOKEN_INDEX] + rng.integers(10, cfg.text.vocab_size, n_text).tolist()
    merged_len = 2 + cfg.image_seq_len + n_text  # sentinel expands to image_seq_len rows
    spans = [(merged_len - 16, merged_len)] * batch  # loss on the tail tokens
    pixels = rng.standard_normal((batch, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    return _pack_batch(cfg, [ids] * batch, spans, pixels)


def jsonl_batches(path, image_root, tokenizer, cfg, batch_size, epochs=1000000):
    """LLaVA-style SFT data → batches.  Loss on the final assistant turn
    (earlier turns enter as ChatML history)."""
    from PIL import Image

    from omchat_tpu.processing.chat import image_prompt, make_context
    from omchat_tpu.processing.image_processor import process_anyres_image

    eos = 151645
    records = [json.loads(l) for l in open(path) if l.strip()]
    for _ in range(epochs):
        batch_ids, spans, tiles = [], [], []
        for rec in records:
            convs = rec["conversations"]
            turns = [(convs[i]["value"], convs[i + 1]["value"]) for i in range(0, len(convs) - 1, 2)]
            history, (q, answer) = turns[:-1], turns[-1]

            sample_tiles = None
            if rec.get("image"):
                img = Image.open(os.path.join(image_root, rec["image"])).convert("RGB")
                sample_tiles = process_anyres_image(img, cfg.image_grid_pinpoints, cfg.vision.image_size)
                q = image_prompt(q, sample_tiles.shape[0])
            else:
                q = q.replace("<image>", "").strip()
            history = [(hq.replace("<image>", "").strip(), ha) for hq, ha in history]

            _, context = make_context(tokenizer, q, history, "You are a helpful assistant.")
            target = tokenizer.encode(answer) + [eos]
            ids = context + target
            n_img = sum(1 for t in ids if t == IMAGE_TOKEN_INDEX)
            merged_len = len(ids) + n_img * (cfg.image_seq_len - 1)
            spans.append((merged_len - len(target), merged_len))
            batch_ids.append(ids)
            if sample_tiles is not None:
                tiles.append(sample_tiles)

            if len(batch_ids) == batch_size:
                pixels = np.concatenate(tiles, axis=0) if tiles else None
                yield _pack_batch(cfg, batch_ids, spans, pixels)
                batch_ids, spans, tiles = [], [], []


def pack_rows(rows, seq_len):
    """[[(ids, target_len), ...] per row] → padded packed batch arrays.

    Positions restart at 0 per segment (RoPE), segment_ids isolate attention
    (the varlen flash kernel / XLA mask via qwen2_forward(segment_ids=...)),
    labels cover each sample's target span only; pad rows carry segment -1
    and IGNORE labels.  The loss shift is boundary-safe for free: position
    (segment_end - 1)'s shifted label is the NEXT sample's first context
    token, which is always IGNORE (targets never start a sample)."""
    b = len(rows)
    tok = np.zeros((b, seq_len), np.int32)
    pos = np.zeros((b, seq_len), np.int32)
    seg = np.full((b, seq_len), -1, np.int32)
    lab = np.full((b, seq_len), IGNORE_INDEX, np.int32)
    for i, row in enumerate(rows):
        off = 0
        for s_idx, (ids, tlen) in enumerate(row):
            n = len(ids)
            tok[i, off : off + n] = ids
            pos[i, off : off + n] = np.arange(n)
            seg[i, off : off + n] = s_idx
            lab[i, off + n - tlen : off + n] = ids[n - tlen :]
            off += n
    return {
        "token_ids": jnp.asarray(tok),
        "is_image": jnp.zeros((b, seq_len), bool),
        "image_index": jnp.zeros((b, seq_len), np.int32),
        "positions": jnp.asarray(pos),
        "labels": jnp.asarray(lab),
        "segment_ids": jnp.asarray(seg),
    }


def jsonl_packed_batches(path, tokenizer, cfg, batch_size, seq_len, epochs=1000000, logger=None):
    """Text-only SFT with sequence packing: samples are concatenated into
    fixed [batch, seq_len] rows (greedy first-fit in file order) so short
    conversations don't burn the step on padding — the packed step does
    real-token work proportional to fill rate, not to the longest sample.

    Packing interleaves documents, so it is text-only by design (image
    features are spliced per request); datasets with images should train
    unpacked (jsonl_batches).  Samples longer than seq_len are skipped
    (counted, reported once)."""
    from omchat_tpu.processing.chat import make_context

    eos = 151645
    records = [json.loads(l) for l in open(path) if l.strip()]
    samples, skipped = [], 0
    for rec in records:
        if rec.get("image"):
            raise ValueError(
                "--pack supports text-only datasets; train image data unpacked (drop --pack)"
            )
        convs = rec["conversations"]
        turns = [(convs[i]["value"], convs[i + 1]["value"]) for i in range(0, len(convs) - 1, 2)]
        history, (q, answer) = turns[:-1], turns[-1]
        _, context = make_context(
            tokenizer, q.replace("<image>", "").strip(),
            [(hq.replace("<image>", "").strip(), ha) for hq, ha in history],
            "You are a helpful assistant.",
        )
        target = tokenizer.encode(answer) + [eos]
        ids = context + target
        if len(ids) > seq_len:
            skipped += 1
            continue
        samples.append((ids, len(target)))
    if not samples:
        raise ValueError(f"no sample fits --pack {seq_len}")
    if skipped and logger is not None:
        logger.warning("packing: skipped %d/%d samples longer than %d tokens",
                       skipped, len(records), seq_len)
    batch_rows, row, row_len = [], [], 0
    for _ in range(epochs):
        for ids, tlen in samples:
            if row_len + len(ids) > seq_len:
                batch_rows.append(row)
                row, row_len = [], 0
                if len(batch_rows) == batch_size:
                    yield pack_rows(batch_rows, seq_len)
                    batch_rows = []
            row.append((ids, tlen))
            row_len += len(ids)
        # the epoch's open row carries into the next pass (no samples lost)


def _train_lora(args, cfg, params, total, logger):
    """LoRA / QLoRA branch: rank-sized adapter training over the frozen base,
    periodic orbax checkpoints with auto-resume, final adapter export
    (loadable via ``load_pretrained_model(lora_path=...)`` / ``--lora``)."""
    import optax

    from omchat_tpu.checkpoint.save import TrainCheckpointer, save_lora_adapter
    from omchat_tpu.training.lora import init_lora, lora_train_step
    from omchat_tpu.training.train_step import default_train_attn_impl

    if args.qlora:
        from omchat_tpu.ops.linear import quantize_tree

        lm = dict(params["language_model"])
        lm["layers"] = quantize_tree(lm["layers"])
        params = {**params, "language_model": lm}

    targets = tuple(t.strip() for t in args.lora_targets.split(",") if t.strip())
    lora = init_lora(
        jax.random.PRNGKey(0), params, rank=args.lora_rank, alpha=args.lora_alpha, targets=targets
    )
    schedule = warmup_cosine_schedule(args.lr, total_steps=total, warmup_steps=args.warmup)
    optimizer = optax.adamw(schedule, b1=0.9, b2=0.95)
    if args.grad_clip > 0:
        optimizer = optax.chain(optax.clip_by_global_norm(args.grad_clip), optimizer)
    if args.grad_accum > 1:
        optimizer = optax.MultiSteps(optimizer, every_k_schedule=args.grad_accum)
    # the scalar "scale" (= alpha/rank) is a hyperparameter, not a weight
    optimizer = optax.masked(optimizer, {**jax.tree.map(lambda _: True, lora), "scale": False})
    opt_state = optimizer.init(lora)

    attn = default_train_attn_impl()

    @jax.jit
    def step_fn(lora_, opt_state_, params_, batch):
        return lora_train_step(lora_, opt_state_, params_, cfg, batch, optimizer, attn_impl=attn)

    ckpt = TrainCheckpointer(os.path.join(args.output_dir, "ckpt"))
    state, resumed = ckpt.restore({"lora": lora, "opt": opt_state})
    lora, opt_state = state["lora"], state["opt"]
    start_step = resumed + 1 if resumed is not None else 0
    if resumed is not None:
        logger.info(f"auto-resumed LoRA training from step {resumed}")

    metrics = JsonlMetricsWriter(os.path.join(args.output_dir, "metrics.jsonl"))
    meter = MetricLogger()
    rng = np.random.default_rng(0)
    if args.data:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.model_path, use_fast=True)
        data_iter = jsonl_batches(args.data, args.image_root, tokenizer, cfg, args.batch_size)
    else:
        data_iter = None

    for step in range(start_step, total):
        batch = next(data_iter) if data_iter is not None else synthetic_batch(cfg, args.batch_size, rng)
        t0 = time.time()
        lora, opt_state, loss = step_fn(lora, opt_state, params, batch)
        loss_f = float(loss)
        meter.update(loss=loss_f, step_time=time.time() - t0)
        metrics.update(step, loss=loss_f, lr=float(schedule(step)))
        if step % 10 == 0:
            logger.info(f"step {step}: {meter}")
        if step > 0 and step % 50 == 0:
            ckpt.save(step, {"lora": lora, "opt": opt_state})
    adapter_dir = os.path.join(args.output_dir, "adapter")
    save_lora_adapter(adapter_dir, lora, base_model=args.model_path)
    logger.info(f"adapter saved to {adapter_dir}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", default=None, help="checkpoint to fine-tune (None = tiny random)")
    parser.add_argument("--data", default=None, help="LLaVA-style JSONL dataset")
    parser.add_argument("--image-root", default="", help="image directory for --data")
    parser.add_argument("--synthetic", type=int, default=0, help="run N synthetic steps (smoke mode)")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--warmup", type=int, default=10)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--tp", type=int, default=1)
    parser.add_argument("--cp", type=int, default=1,
                        help="context parallelism: shard the sequence axis over a 'context' "
                        "mesh axis with ring attention (long-context training; requires "
                        "merged seq len %% cp == 0; incompatible with --tp/--sequence-parallel)")
    parser.add_argument("--ulysses", type=int, default=1, metavar="P",
                        help="Ulysses sequence parallelism: shard the sequence axis over a "
                        "'context' mesh axis; attention re-shards head-wise via all-to-all "
                        "so each device runs full-sequence attention on H/P heads "
                        "(requires merged seq len %% P == 0 and attention heads %% P == 0; "
                        "incompatible with --tp/--cp/--sequence-parallel)")
    parser.add_argument("--pp", type=int, default=1,
                        help="GPipe pipeline parallelism: split the decoder trunk into N "
                        "contiguous layer stages (params one stage per device over a "
                        "'stage' mesh) and stream microbatches through them with ppermute "
                        "handoffs; backward is AD's transpose of the fill-drain schedule. "
                        "For models beyond TP reach; requires layers %% pp == 0; "
                        "incompatible with --tp/--fsdp/--cp/--sequence-parallel/--lora-rank")
    parser.add_argument("--pp-microbatches", type=int, default=0, metavar="M",
                        help="microbatches per --pp step (default: batch size, i.e. "
                        "one-row microbatches for the smallest pipeline bubble; "
                        "must divide --batch-size)")
    parser.add_argument("--fsdp", action="store_true")
    parser.add_argument("--sequence-parallel", action="store_true", help="Megatron SP: shard activation sequence axis over the model axis")
    parser.add_argument("--grad-clip", type=float, default=1.0,
                        help="global-norm gradient clipping (HF Trainer max_grad_norm default); 0 disables")
    parser.add_argument("--grad-accum", type=int, default=1,
                        help="micro-batches per optimizer update (optax.MultiSteps)")
    parser.add_argument("--pack", type=int, default=0, metavar="SEQ_LEN",
                        help="text-only sequence packing: concatenate samples into fixed "
                        "[batch, SEQ_LEN] rows with segment-isolated attention so short "
                        "conversations don't train on padding (fwd+bwd run the varlen "
                        "Pallas flash kernels on TPU; cross-document tiles are skipped)")
    parser.add_argument("--lora-rank", type=int, default=0,
                        help="train rank-r LoRA adapters over a frozen base instead of full fine-tuning (0 = off)")
    parser.add_argument("--lora-alpha", type=float, default=None,
                        help="LoRA scale numerator (default: rank, i.e. scale 1.0)")
    parser.add_argument("--lora-targets", default="q_proj,k_proj,v_proj,o_proj",
                        help="comma-separated linears to adapt (add gate_proj,up_proj,down_proj for MLP)")
    parser.add_argument("--qlora", action="store_true",
                        help="hold the frozen base in int8 (QLoRA); adapters stay bf16")
    parser.add_argument("--tune-mm-mlp-adapter", action="store_true",
                        help="stage-1 pretrain: train ONLY the multimodal projector "
                        "(tower + LLM frozen) and save a projector-only "
                        "mm_projector.safetensors at the end (the reference's "
                        "pretrain_mm_mlp_adapter artifact)")
    parser.add_argument("--pretrain-mm-mlp-adapter", default=None, metavar="PATH",
                        help="load projector weights from a stage-1 checkpoint "
                        "(mm_projector.safetensors or the reference's mm_projector.bin) "
                        "before training — the stage-2 warm start")
    parser.add_argument("--output-dir", default="./train_out")
    args = parser.parse_args()

    import optax

    logger = build_logger("omchat.train", "train.log", log_dir=args.output_dir)

    if args.model_path:
        from omchat_tpu.checkpoint.loader import load_omchat_checkpoint

        cfg, params = load_omchat_checkpoint(args.model_path, jnp.bfloat16)
    else:
        from omchat_tpu.models import intern_vit, projector as projector_model, qwen2 as qwen2_model

        cfg = OmChatConfig.tiny()
        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        params = {
            "vision_tower": intern_vit.init_params(k1, cfg.vision),
            "projector": projector_model.init_params(k2, cfg.projector, cfg.vision.hidden_size, cfg.text.hidden_size),
            "language_model": qwen2_model.init_params(k3, cfg.text),
        }

    if args.pretrain_mm_mlp_adapter:
        from omchat_tpu.checkpoint.loader import load_mm_projector

        loaded = load_mm_projector(args.pretrain_mm_mlp_adapter, jnp.bfloat16)
        if cfg.projector.mlp_smoe and "experts" not in loaded:
            # the reference loads the SAME stage-1 adapter into every expert
            # (omchat_llama.py:79-82); the fresh router keeps routing learnable
            from omchat_tpu.models.smoe import replicate_expert_params

            loaded = {
                "router": params["projector"]["router"],
                "experts": replicate_expert_params(loaded, cfg.projector.num_experts),
            }
        params["projector"] = loaded
        logger.info(f"projector warm-started from {args.pretrain_mm_mlp_adapter}")

    total = args.synthetic or args.steps
    if args.warmup >= total:
        parser.error(f"--warmup {args.warmup} must be < total steps {total}")

    if args.lora_rank > 0:
        if (args.tp != 1 or args.fsdp or args.sequence_parallel or args.pp > 1
                or args.cp > 1 or args.ulysses > 1):
            parser.error("--lora-rank trains single-device adapters; drop --tp/--fsdp/--cp/--pp/--ulysses/--sequence-parallel")
        if not args.data and not args.synthetic:
            parser.error("pass --data (JSONL dataset) or --synthetic N (smoke mode)")
        _train_lora(args, cfg, params, total, logger)
        return
    if args.qlora:
        parser.error("--qlora requires --lora-rank")

    if args.pp > 1:
        if args.tp != 1 or args.sequence_parallel or args.fsdp or args.cp > 1 or args.ulysses > 1:
            parser.error("--pp is incompatible with --tp/--fsdp/--cp/--ulysses/--sequence-parallel")
        if args.tune_mm_mlp_adapter:
            parser.error("--pp does not support --tune-mm-mlp-adapter (stage-1 trains only the projector; PP splits the trunk)")
        if cfg.text.num_hidden_layers % args.pp != 0:
            parser.error(f"--pp {args.pp} must divide the decoder layer count {cfg.text.num_hidden_layers}")
        if args.pp > len(jax.devices()):
            parser.error(f"--pp {args.pp} needs {args.pp} devices; {len(jax.devices())} available")
        pp_micro = args.pp_microbatches or args.batch_size
        if args.batch_size % pp_micro != 0:
            parser.error(f"--pp-microbatches {pp_micro} must divide --batch-size {args.batch_size}")
        mesh = Mesh(np.asarray(jax.devices()[: args.pp]), axis_names=("stage",))
        specs = None
    elif args.cp > 1 or args.ulysses > 1:
        if args.tp != 1 or args.sequence_parallel or (args.cp > 1 and args.ulysses > 1):
            parser.error("--cp/--ulysses are incompatible with --tp/--sequence-parallel and each other")
        if args.ulysses > 1 and cfg.text.num_attention_heads % args.ulysses != 0:
            parser.error(
                f"--ulysses {args.ulysses} must divide the attention head count "
                f"{cfg.text.num_attention_heads}"
            )
        from omchat_tpu.parallel.mesh import create_cp_mesh
        from omchat_tpu.parallel.sharding import specs_without_axis

        mesh = create_cp_mesh(cp=max(args.cp, args.ulysses))
        specs = specs_without_axis(
            omchat_param_specs(cfg, params, fsdp=args.fsdp), "model"
        )
    else:
        mesh = create_mesh(tp=args.tp)
        specs = omchat_param_specs(cfg, params, fsdp=args.fsdp)
    if args.pp == 1:
        dp = mesh.shape["data"]
        if args.batch_size % dp != 0:
            parser.error(f"--batch-size {args.batch_size} must be divisible by the data-parallel degree {dp} (= devices/tp)")
    schedule = warmup_cosine_schedule(args.lr, total_steps=total, warmup_steps=args.warmup)
    optimizer = optax.adamw(schedule, b1=0.9, b2=0.95)
    if args.grad_clip > 0:
        optimizer = optax.chain(optax.clip_by_global_norm(args.grad_clip), optimizer)
    if args.tune_mm_mlp_adapter:
        # stage-1 pretrain (reference tune_mm_mlp_adapter semantics): only
        # the projector updates; frozen leaves get set_to_zero
        labels = {
            k: jax.tree.map(lambda _, grp=k: "train" if grp == "projector" else "freeze", v)
            for k, v in params.items()
        }
        optimizer = optax.multi_transform(
            {"train": optimizer, "freeze": optax.set_to_zero()}, labels
        )
    if args.grad_accum > 1:
        optimizer = optax.MultiSteps(optimizer, every_k_schedule=args.grad_accum)
    if args.pp > 1:
        from omchat_tpu.training.train_step import (
            make_pp_train_step,
            pp_param_specs,
            stage_params,
        )

        step_fn, batch_shardings, to_sharding = make_pp_train_step(
            cfg, mesh, optimizer, microbatches=pp_micro
        )
        params = stage_params(params, args.pp)
        params = jax.tree.map(
            lambda a, s: jax.device_put(a, s), params, to_sharding(pp_param_specs(params))
        )
        logger.info(
            f"GPipe pipeline: {args.pp} stages x {cfg.text.num_hidden_layers // args.pp} layers, "
            f"{pp_micro} microbatches/step"
        )
    else:
        step_fn, batch_shardings, _ = make_sharded_train_step(
            cfg, mesh, specs, optimizer, sequence_parallel=args.sequence_parallel,
            context_parallel=args.cp > 1, ulysses=args.ulysses > 1,
        )
        params = shard_params(params, mesh, specs)
    state = init_train_state(params, optimizer)

    if not args.data and not args.synthetic:
        parser.error("pass --data (JSONL dataset) or --synthetic N (smoke mode)")
    if args.pack and not args.data:
        parser.error("--pack packs a JSONL dataset; pass --data")

    ckpt = TrainCheckpointer(os.path.join(args.output_dir, "ckpt"))
    # --pp checkpoints hold the STAGED [S, L/S, ...] trunk layout: resumable
    # only at the same degree, and not exportable without unstage_params
    # (flatten_to_hf_state rejects staged trees).  Record the degree so a
    # mismatched resume fails with instructions, not an orbax shape error.
    meta_path = os.path.join(args.output_dir, "ckpt", "TRAIN_META.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            saved_pp = json.load(f).get("pp", 1)
        if saved_pp != args.pp:
            parser.error(
                f"checkpoints in {args.output_dir}/ckpt were written with --pp {saved_pp} "
                f"(staged [S, L/S, ...] param layout); resume with --pp {saved_pp} "
                "or start a fresh --output-dir"
            )
    else:
        with open(meta_path, "w") as f:
            json.dump({"pp": args.pp}, f)
    state, resumed = ckpt.restore(state)
    # a checkpoint at step N holds state *after* executing step N → resume at N+1
    start_step = resumed + 1 if resumed is not None else 0
    if resumed is not None:
        logger.info(f"auto-resumed from step {resumed}")

    metrics = JsonlMetricsWriter(os.path.join(args.output_dir, "metrics.jsonl"))
    meter = MetricLogger()
    rng = np.random.default_rng(0)

    if args.data:
        import queue
        import threading

        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.model_path, use_fast=True)
        if args.pack:
            raw_iter = jsonl_packed_batches(
                args.data, tokenizer, cfg, args.batch_size, args.pack, logger=logger
            )
        else:
            raw_iter = jsonl_batches(args.data, args.image_root, tokenizer, cfg, args.batch_size)
        # background host preprocessing (tokenize/tile/pack) overlaps device steps
        q: "queue.Queue" = queue.Queue(maxsize=2)

        feeder_error: list = []

        def _feeder():
            # Always enqueue the None sentinel — on exhaustion OR failure —
            # so the training loop's q.get() can never block forever; the
            # exception is recorded for the main thread to re-raise.
            try:
                for b in raw_iter:
                    q.put(b)
            except BaseException as e:  # noqa: BLE001 — propagated below
                feeder_error.append(e)
            finally:
                q.put(None)

        threading.Thread(target=_feeder, daemon=True, name="data-prefetch").start()

        def _drain():
            while True:
                b = q.get()
                if b is None:
                    if feeder_error:
                        raise RuntimeError("data prefetch thread failed") from feeder_error[0]
                    return
                yield b

        data_iter = _drain()
    else:
        data_iter = None

    # loss readback is delayed one step so step N+1 dispatches while N runs
    pending = None
    for step in range(start_step, total):
        batch = next(data_iter) if data_iter is not None else synthetic_batch(cfg, args.batch_size, rng)
        batch_shardings_step = {k: v for k, v in batch_shardings.items() if k in batch}
        batch = jax.tree.map(lambda a, s: jax.device_put(a, s), batch, batch_shardings_step)
        t0 = time.time()
        state, loss = step_fn(state, cfg, batch)
        if pending is not None:
            p_step, p_loss, p_time = pending
            loss_f = float(p_loss)
            meter.update(loss=loss_f, step_time=p_time)
            metrics.update(p_step, loss=loss_f, lr=float(schedule(p_step)))
            if p_step % 10 == 0:
                logger.info(f"step {p_step}: {meter}")
        pending = (step, loss, time.time() - t0)
        if step > 0 and step % 50 == 0:
            ckpt.save(step, state)
    if pending is not None:
        p_step, p_loss, _ = pending
        metrics.update(p_step, loss=float(p_loss), lr=float(schedule(p_step)))
    if ckpt.latest_step() != total - 1 and total > start_step:
        ckpt.save(total - 1, state)
    if args.tune_mm_mlp_adapter:
        from omchat_tpu.checkpoint.save import save_mm_projector

        path = save_mm_projector(args.output_dir, jax.device_get(state.params["projector"]))
        logger.info(f"projector-only checkpoint saved to {path}")
    logger.info("done")


if __name__ == "__main__":
    main()
