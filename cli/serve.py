"""Minimal OpenAI-compatible HTTP serving front-end.

The reference stripped its gradio controller/worker serve stack, leaving only
heartbeat constants (reference constants.py:1-2; SURVEY.md §5 "Failure
detection").  This is the working replacement: a dependency-free HTTP server
exposing ``/v1/chat/completions`` (text + base64 image content parts, OpenAI
tool calling via runtime/tool_calls.py) and ``/health``, running the engine
single-threaded behind a lock (TPU programs are serialized anyway).

    python cli/serve.py --model-path … --port 8000 [--int8]

Request example:
    {"messages": [{"role": "user", "content": [
        {"type": "text", "text": "What is this?"},
        {"type": "image_url", "image_url": {"url": "data:image/png;base64,..."}}
    ]}], "max_tokens": 256}
"""

import argparse
import os
import sys

# runnable from a checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import base64
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from PIL import Image

from omchat_tpu.api import load_pretrained_model
from omchat_tpu.config import GenerationConfig
from omchat_tpu.utils.logging import build_logger


class BadRequest(ValueError):
    """Client error: malformed body or invalid field values — mapped to an
    HTTP 400 with an OpenAI-style ``invalid_request_error`` envelope (the
    generic handler turns everything else into a 500)."""


def _error_body(message, err_type):
    return {"error": {"message": str(message), "type": err_type}}


def _read_json_body(handler):
    length = int(handler.headers.get("Content-Length", 0))
    raw = handler.rfile.read(length)
    try:
        req = json.loads(raw)
    except json.JSONDecodeError as e:
        raise BadRequest(f"invalid JSON body: {e}") from e
    if not isinstance(req, dict):
        raise BadRequest("request body must be a JSON object")
    return req


def _parse_stops(req):
    """OpenAI ``stop``: a string or list of up to 4 strings."""
    stop = req.get("stop") or []
    if isinstance(stop, str):
        stop = [stop]
    return [s for s in stop if s][:4]


def _cut_at_stop(text, stops):
    """Trim ``text`` at the earliest stop-string occurrence.
    Returns (trimmed_text, hit)."""
    pos = min((text.find(s) for s in stops if s in text), default=-1)
    return (text[:pos], True) if pos >= 0 else (text, False)


def _parse_gen(req, default_max):
    """(GenerationConfig, logit_bias | None) from an OpenAI-style body.
    logit_bias keys are token ids, values clamped to ±100 per the API."""
    from omchat_tpu.config import GenerationConfig

    try:
        gen = GenerationConfig(
            max_new_tokens=int(req.get("max_tokens", default_max)),
            do_sample=float(req.get("temperature", 0.0)) > 0.0,
            temperature=float(req.get("temperature", 1.0)) or 1.0,
            top_p=float(req.get("top_p", 1.0)),
            presence_penalty=float(req.get("presence_penalty", 0.0)),
            frequency_penalty=float(req.get("frequency_penalty", 0.0)),
        )
        lb = req.get("logit_bias") or None
        if lb:
            lb = {int(k): max(-100.0, min(100.0, float(v))) for k, v in lb.items()}
    except (TypeError, ValueError) as e:
        raise BadRequest(f"invalid sampling parameter: {e}") from e
    if gen.max_new_tokens < 1:
        raise BadRequest("max_tokens must be >= 1")
    return gen, lb


def _parse_messages(messages):
    """Extract (question, history, images, system, image_key) from
    OpenAI-style messages.  ``image_key`` hashes the request's compressed
    image payloads in order — the encoded-image LRU's identity
    (runtime/feature_cache.py), ~1000x cheaper than hashing decoded tiles."""
    import hashlib

    img_hash = hashlib.blake2b(digest_size=16)
    images = []
    history = []
    question = ""
    system = "You are a helpful assistant."
    pending_user = None
    if not isinstance(messages, list):
        raise BadRequest("messages must be a list")
    for msg in messages:
        if not isinstance(msg, dict):
            raise BadRequest("each message must be an object with role/content")
        role = msg.get("role")
        content = msg.get("content", "")
        text_parts = []
        if isinstance(content, list):
            for part in content:
                if part.get("type") == "text":
                    text_parts.append(part.get("text", ""))
                elif part.get("type") == "image_url":
                    url = part.get("image_url", {}).get("url", "")
                    if url.startswith("data:"):
                        try:
                            raw = base64.b64decode(url.split(",", 1)[1])
                            img = Image.open(io.BytesIO(raw)).convert("RGB")
                        except Exception as e:  # noqa: BLE001
                            raise BadRequest(f"could not decode image_url data: {e}") from e
                        img_hash.update(raw)
                        images.append(img)
            text = "\n".join(text_parts)
        else:
            text = str(content)
        if role == "system":
            system = text
        elif role == "user":
            if pending_user is not None:
                history.append((pending_user, ""))
            pending_user = text
        elif role == "assistant":
            if msg.get("tool_calls"):
                from omchat_tpu.runtime.tool_calls import render_assistant_tool_calls

                text = render_assistant_tool_calls(text or None, msg["tool_calls"])
            if pending_user is not None:
                history.append((pending_user, text))
                pending_user = None
        elif role == "tool":
            # tool results replay inside the next user turn (Qwen convention)
            from omchat_tpu.runtime.tool_calls import render_tool_result

            rendered = render_tool_result(text)
            pending_user = rendered if pending_user is None else pending_user + "\n" + rendered
    question = pending_user or ""
    image_key = f"req-imgs-{img_hash.hexdigest()}" if images else None
    return question, history, images or None, system, image_key


def make_handler(model, logger, batch_engine=None, speculative=False):
    """batch_engine: optional BatchEngine — requests join the continuous batch
    and poll for completion instead of serializing behind the lock."""
    lock = threading.Lock()
    metrics = {
        "requests_total": 0,
        "requests_failed_total": 0,
        "prompt_tokens_total": 0,
        "completion_tokens_total": 0,
        "request_latency_ms_sum": 0.0,
    }
    metrics_lock = threading.Lock()

    def count(prompt_tokens=0, completion_tokens=0, latency_ms=0.0, failed=False):
        with metrics_lock:
            metrics["requests_total"] += 1
            metrics["requests_failed_total"] += int(failed)
            metrics["prompt_tokens_total"] += prompt_tokens
            metrics["completion_tokens_total"] += completion_tokens
            metrics["request_latency_ms_sum"] += latency_ms

    def run_completions(
        input_ids, images, gen, stops, n, *, want_logprobs=False, n_top=0,
        seed=None, allowed_fn=None, image_key=None, use_engine=False,
        logit_bias=None,
    ):
        """Run n completions for one prompt and return
        ``[(token_ids, prompt_len, logprobs | None)]`` — shared by the chat
        and text-completions endpoints.

        Plain requests (sampled included) ride the continuous batch: the
        decode step takes per-slot generation params, and n > 1 choices
        become n concurrent members of the shared batch.  logprobs / seeded /
        constrained requests run the single-request engine (the batch decode
        step returns tokens only and samples from an engine-global rng);
        they serialize on the lock."""
        completions = []
        if batch_engine is not None and not use_engine:
            # paged engine: logprobs ride the continuous batch natively (the
            # decode dispatch returns chosen + top-K when any member asks)
            native_lp = want_logprobs and hasattr(batch_engine, "request_logprobs")
            lp_kwargs = (
                {"logprobs": True, "top_logprobs": n_top} if native_lp else {}
            )
            with lock:
                rids = [
                    batch_engine.submit(
                        list(input_ids),
                        images,
                        max_new_tokens=gen.max_new_tokens,
                        eos_token_id=gen.eos_token_id,
                        generation=gen,
                        image_cache_key=image_key,
                        **lp_kwargs,
                    )
                    for _ in range(n)
                ]
            deadline = time.time() + 60 + 0.5 * gen.max_new_tokens
            from omchat_tpu.runtime.generate import KeywordStopper

            stopper = KeywordStopper(stops, model.tokenizer) if stops else None
            seen = {rid: 0 for rid in rids}
            while not all(batch_engine.finished(rid) for rid in rids):
                if getattr(batch_engine, "dead", False) or time.time() > deadline:
                    raise RuntimeError("batch scheduler unavailable or request timed out")
                if stopper is not None:
                    for rid in rids:
                        if batch_engine.finished(rid):
                            continue
                        tokens, _ = batch_engine.snapshot(rid)
                        if len(tokens) > seen[rid]:
                            seen[rid] = len(tokens)
                            if stopper.should_stop(tokens):
                                batch_engine.cancel(rid)
                time.sleep(0.005)
            for rid in rids:
                lp = None
                if native_lp:
                    lps, tops = batch_engine.request_logprobs(rid)
                    lp = (lps, tops if n_top else None)
                token_ids, prompt_len = batch_engine.pop_result(rid)
                completions.append((token_ids, prompt_len, lp))
        elif speculative and not gen.do_sample and not use_engine and n == 1:
            from omchat_tpu.runtime.speculative import generate_speculative

            with lock:
                token_ids, _ = generate_speculative(model.engine, list(input_ids), images, gen)
            completions.append((token_ids, len(input_ids), None))
        else:
            import jax

            for i in range(n):
                key = jax.random.PRNGKey(int(seed) + i) if seed is not None else None
                with lock:
                    out = model.engine.generate(
                        [list(input_ids)], images, gen,
                        stop_keywords=stops, tokenizer=model.tokenizer,
                        return_logprobs=want_logprobs, top_logprobs=n_top,
                        rng_key=key, allowed_tokens_fn=allowed_fn,
                        logit_bias=logit_bias,
                    )
                completions.append((
                    out.token_ids[0], int(out.prompt_len[0]),
                    (out.logprobs[0], out.top_logprobs[0] if n_top else None)
                    if want_logprobs else None,
                ))
        return completions

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            logger.info("%s " + fmt, self.client_address[0], *args)

        def _json(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {"status": "ok"})
            elif self.path == "/metrics":
                self._metrics()
            elif self.path == "/v1/models":
                # OpenAI clients list models before chatting; serve the one
                # loaded checkpoint under the id requests should pass back
                self._json(200, {
                    "object": "list",
                    "data": [{"id": "omchat-tpu", "object": "model",
                              "created": 0, "owned_by": "omchat-tpu"}],
                })
            else:
                self._json(404, {"error": "not found"})

        def _metrics(self):
            """Prometheus text exposition: request counters plus live
            scheduler gauges (slot occupancy, admission queue, page pool,
            prefix-cache hit rate)."""
            with metrics_lock:
                rows = dict(metrics)
            if batch_engine is not None:
                rows.update({f"engine_{k}": v for k, v in batch_engine.stats().items()})
                rows["engine_dead"] = int(getattr(batch_engine, "dead", False))
            body = "".join(
                f"# TYPE omchat_{k} {'counter' if k in metrics else 'gauge'}\n"
                f"omchat_{k} {v}\n"
                for k, v in rows.items()
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        # -- SSE streaming ------------------------------------------------

        def _sse_start(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()

        def _sse_chunk(self, delta, finish_reason=None, mode="chat", usage=None):
            """One SSE event; ``mode="chat"`` emits chat.completion.chunk
            deltas, ``mode="text"`` emits legacy text_completion chunks
            (``delta`` is then the text piece, or None for the usage/finish
            event)."""
            if mode == "text":
                choices = [] if delta is None and finish_reason is None else [
                    {"index": 0, "text": delta or "", "finish_reason": finish_reason}
                ]
                payload = {"object": "text_completion", "model": "omchat-tpu", "choices": choices}
            else:
                choices = [] if usage is not None else [
                    {"index": 0, "delta": delta, "finish_reason": finish_reason}
                ]
                payload = {"object": "chat.completion.chunk", "model": "omchat-tpu", "choices": choices}
            if usage is not None:
                payload["usage"] = usage
            self.wfile.write(f"data: {json.dumps(payload)}\n\n".encode())
            self.wfile.flush()

        def _stream_completion(self, inputs, gen, stops=(), image_key=None,
                               mode="chat", include_usage=False):
            """OpenAI-style SSE: role chunk, content deltas, finish, [DONE]
            (``mode="text"``: legacy /v1/completions chunk shape, no role
            event).  ``include_usage`` (stream_options) appends a final
            usage-only chunk before [DONE].  Incremental text uses a bounded
            decode window (full-prefix re-decode per token is O(n²)).

            With continuous batching, the request joins the shared batch and
            this handler POLLS its growing token list — the global lock is
            held only for submit, so a streaming client never serializes the
            other requests.  Without a batch engine the single-request engine
            necessarily holds the lock for the whole generation."""
            t_start = time.time()
            self._sse_start()
            if mode == "chat":
                self._sse_chunk({"role": "assistant"})
            tok = model.tokenizer
            emitted = []
            stop_hit = []

            def send_piece(piece):
                if mode == "text":
                    self._sse_chunk(piece, mode="text")
                else:
                    self._sse_chunk({"content": piece})

            def emit(token_id: int):
                emitted.append(token_id)
                tail = emitted[-24:]
                text = tok.decode(tail, skip_special_tokens=True)
                prev = tok.decode(tail[:-1], skip_special_tokens=True)
                piece = text[len(prev):]
                if stops:
                    cut, hit = _cut_at_stop(text, stops)
                    if hit:
                        # emit only the chars of this piece that precede the
                        # stop string (the stop itself is never streamed)
                        keep = len(piece) - (len(text) - len(cut))
                        if keep > 0:
                            send_piece(piece[:keep])
                        stop_hit.append(True)
                        return
                if piece:
                    send_piece(piece)

            if batch_engine is not None:
                # streaming=True engages the adaptive roll (paged engine):
                # rolls shrink to --streaming-roll while this request decodes
                stream_kw = (
                    {"streaming": True}
                    if hasattr(batch_engine, "streaming_roll") else {}
                )
                with lock:
                    rid = batch_engine.submit(
                        inputs["input_ids"][0].tolist(),
                        inputs.get("images"),
                        max_new_tokens=gen.max_new_tokens,
                        eos_token_id=gen.eos_token_id,
                        generation=gen,
                        image_cache_key=image_key,
                        **stream_kw,
                    )
                deadline = time.time() + 60 + 0.5 * gen.max_new_tokens
                sent = 0
                finish = None
                while True:
                    tokens, done = batch_engine.snapshot(rid)
                    for t in tokens[sent:]:
                        emit(t)
                        if stop_hit:
                            break
                    sent = len(tokens)
                    if stop_hit:
                        batch_engine.cancel(rid)
                        finish = "stop"
                        break
                    if done:
                        break
                    if getattr(batch_engine, "dead", False):
                        finish = "error"
                        break
                    if time.time() > deadline:
                        finish = "timeout"
                        break
                    time.sleep(0.005)
                batch_engine.pop_result(rid)
                n_new = len(emitted)
            else:
                finish = None
                with lock:
                    out = model.engine.generate(
                        [inputs["input_ids"][0].tolist()],
                        inputs.get("images"),
                        gen,
                        stream_callback=emit,
                        stop_keywords=stops,
                        tokenizer=tok,
                    )
                n_new = len(out.token_ids[0])
            if finish is None:
                finish = "stop" if (stop_hit or n_new < gen.max_new_tokens) else "length"
            self._sse_chunk({} if mode == "chat" else "", finish_reason=finish, mode=mode)
            if include_usage:
                n_prompt = len(inputs["input_ids"][0])
                self._sse_chunk(None, mode=mode, usage={
                    "prompt_tokens": n_prompt,
                    "completion_tokens": len(emitted),
                    "total_tokens": n_prompt + len(emitted),
                })
            # count BEFORE the final write: a client seeing the completed
            # response must also see it in /metrics (no read-after-write race)
            count(
                prompt_tokens=len(inputs["input_ids"][0]),
                completion_tokens=len(emitted),
                latency_ms=(time.time() - t_start) * 1000,
                failed=finish == "error",
            )
            self.wfile.write(b"data: [DONE]\n\n")
            self.wfile.flush()

        def _text_completions(self):
            """OpenAI legacy ``/v1/completions``: raw text in, raw
            continuation out — no chat template, the prompt is tokenized
            verbatim (completion-style eval harnesses and older SDKs).
            Supports max_tokens/temperature/top_p/stop/n/seed/echo."""
            try:
                req = _read_json_body(self)
                prompt = req.get("prompt", "")
                if isinstance(prompt, list):
                    if len(prompt) != 1:
                        raise BadRequest("prompt must be a string or a 1-element list")
                    prompt = prompt[0]
                if not isinstance(prompt, str):
                    raise BadRequest("prompt must be a string")
                gen, logit_bias = _parse_gen(req, default_max=16)
                stops = _parse_stops(req)
                n = max(1, min(int(req.get("n", 1) or 1), 8))
                seed = req.get("seed")
                t0 = time.time()
                input_ids = model.tokenizer.encode(str(prompt))
                if req.get("stream"):
                    import numpy as _np

                    so = req.get("stream_options") or {}
                    self._stream_completion(
                        {"input_ids": _np.asarray([list(input_ids)], _np.int64)}, gen, stops,
                        mode="text", include_usage=bool(so.get("include_usage")),
                    )
                    return
                use_engine = (
                    seed is not None
                    or logit_bias is not None
                    or gen.presence_penalty != 0.0
                    or gen.frequency_penalty != 0.0
                )
                completions = run_completions(
                    input_ids, None, gen, stops, n,
                    seed=seed, use_engine=use_engine, logit_bias=logit_bias,
                )
                choices = []
                total_new = 0
                for idx, (token_ids, _plen, _lps) in enumerate(completions):
                    text = model.tokenizer.decode(token_ids, skip_special_tokens=True)
                    total_new += len(token_ids)
                    stop_cut = False
                    if stops:
                        text, stop_cut = _cut_at_stop(text, stops)
                    if req.get("echo"):
                        text = str(prompt) + text
                    choices.append({
                        "index": idx,
                        "text": text,
                        "logprobs": None,
                        "finish_reason": "stop"
                        if (stop_cut or len(token_ids) < gen.max_new_tokens)
                        else "length",
                    })
                count(len(input_ids), total_new, (time.time() - t0) * 1000)
                self._json(200, {
                    "object": "text_completion",
                    "model": "omchat-tpu",
                    "choices": choices,
                    "usage": {
                        "prompt_tokens": len(input_ids),
                        "completion_tokens": total_new,
                        "total_tokens": len(input_ids) + total_new,
                        "latency_ms": round((time.time() - t0) * 1000, 1),
                    },
                })
            except BadRequest as e:
                count(failed=True)
                self._json(400, _error_body(e, "invalid_request_error"))
            except Exception as e:  # noqa: BLE001
                logger.exception("completions request failed")
                count(failed=True)
                self._json(500, _error_body(e, "internal_error"))

        def do_POST(self):
            if self.path == "/v1/completions":
                self._text_completions()
                return
            if self.path not in ("/v1/chat/completions", "/chat"):
                self._json(404, {"error": "not found"})
                return
            try:
                req = _read_json_body(self)
                question, history, images, system, image_key = _parse_messages(req.get("messages", []))
                gen, logit_bias = _parse_gen(req, default_max=1024)
                stops = _parse_stops(req)
                # OpenAI tool calling (runtime/tool_calls.py): definitions
                # render into the system prompt; "required"/named choices
                # constrain decoding to a valid call via the schema mask
                tool_fns, tool_mode, forced_name = None, "none", None
                if req.get("tools") is not None:
                    from omchat_tpu.runtime.tool_calls import (
                        parse_tool_choice,
                        render_tools_system,
                        validate_tools,
                    )

                    try:
                        tool_fns = validate_tools(req["tools"])
                        tool_mode, forced_name = parse_tool_choice(req.get("tool_choice"), tool_fns)
                    except ValueError as e:
                        raise BadRequest(str(e)) from e
                    if tool_mode != "none":
                        system = render_tools_system(system, tool_fns)
                t0 = time.time()
                inputs = model.processor(question, images=images, history=history, system=system)
                if req.get("stream") and tool_mode == "none":
                    # SSE path runs the single-request engine (per-token host
                    # callbacks); concurrent requests still ride the batch.
                    so = req.get("stream_options") or {}
                    self._stream_completion(
                        inputs, gen, stops, image_key=image_key,
                        include_usage=bool(so.get("include_usage")),
                    )
                    return
                # logprobs requests run the single-request engine (the batch
                # decode step returns tokens only); they serialize on the lock
                want_logprobs = bool(req.get("logprobs"))
                n_top = max(0, min(int(req.get("top_logprobs", 0) or 0), 5)) if want_logprobs else 0
                seed = req.get("seed")
                n = max(1, min(int(req.get("n", 1) or 1), 8))
                guided = req.get("guided_choice")
                allowed_fn = None
                if guided:
                    from omchat_tpu.runtime.constrained import choice_mask_fn

                    allowed_fn = choice_mask_fn(model.tokenizer, [str(c) for c in guided])
                rf = req.get("response_format") or {}
                if allowed_fn is None and isinstance(rf, dict) and rf.get("type") == "json_object":
                    # OpenAI JSON mode: mask every step to valid-JSON prefixes
                    # (runtime/json_mode.py); first request pays the one-time
                    # vocab table build (~1-2 s), memoized per tokenizer
                    from omchat_tpu.runtime.json_mode import get_json_mode

                    allowed_fn = get_json_mode(model.tokenizer).mask_fn()
                # structured outputs: OpenAI response_format json_schema
                # ({"json_schema": {"name":..., "schema": {...}}}) or the
                # vLLM-style top-level "guided_json" (the schema itself)
                schema = None
                if isinstance(rf, dict) and rf.get("type") == "json_schema":
                    js = rf.get("json_schema") or {}
                    schema = js.get("schema") if isinstance(js, dict) else None
                if schema is None:
                    schema = req.get("guided_json")
                if allowed_fn is None and schema:
                    from omchat_tpu.runtime.json_schema import get_json_schema_mode

                    allowed_fn = get_json_schema_mode(model.tokenizer, schema).mask_fn()
                if tool_mode == "forced":
                    # constrain the completion to a {"name", "arguments"} call
                    if allowed_fn is not None:
                        raise BadRequest(
                            "tool_choice 'required' cannot be combined with "
                            "response_format / guided constraints"
                        )
                    from omchat_tpu.runtime.json_schema import get_json_schema_mode
                    from omchat_tpu.runtime.tool_calls import forced_call_schema

                    tc_schema = forced_call_schema(tool_fns, forced_name)
                    try:
                        allowed_fn = get_json_schema_mode(model.tokenizer, tc_schema).mask_fn()
                    except ValueError:
                        # parameter schema outside the mask subset even after
                        # sanitizing — fall back to name-only constraint
                        tc_schema = forced_call_schema(
                            [{"name": f["name"]} for f in tool_fns], forced_name
                        )
                        allowed_fn = get_json_schema_mode(model.tokenizer, tc_schema).mask_fn()
                # seed/guided_choice/json_mode run the single-request engine
                # (constrained steps need per-token host callbacks, and the
                # batch engine samples from an engine-global rng); they
                # serialize on the lock.  logprobs stay in the continuous
                # batch on the paged engine (native chosen+top-K), and only
                # fall back on the slot engine.
                use_engine = (
                    (want_logprobs and not hasattr(batch_engine, "request_logprobs"))
                    or seed is not None
                    or allowed_fn is not None
                    or logit_bias is not None
                    or gen.presence_penalty != 0.0
                    or gen.frequency_penalty != 0.0
                )
                completions = run_completions(
                    inputs["input_ids"][0].tolist(), inputs.get("images"), gen, stops, n,
                    want_logprobs=want_logprobs, n_top=n_top, seed=seed,
                    allowed_fn=allowed_fn, image_key=image_key, use_engine=use_engine,
                    logit_bias=logit_bias,
                )
                choices = []
                total_new = 0
                prompt_len = completions[0][1]
                for idx, (token_ids, _plen, lps) in enumerate(completions):
                    text = model.tokenizer.decode(token_ids, skip_special_tokens=True)
                    n_new = len(token_ids)
                    total_new += n_new
                    stop_cut = False
                    if stops:
                        text, stop_cut = _cut_at_stop(text, stops)
                    message = {"role": "assistant", "content": text}
                    finish = "stop" if (stop_cut or n_new < gen.max_new_tokens) else "length"
                    if tool_mode == "forced":
                        from omchat_tpu.runtime.tool_calls import wire_tool_calls

                        try:
                            obj = json.loads(text)
                            calls = [{
                                "name": obj["name"],
                                "arguments": json.dumps(obj.get("arguments", {}), ensure_ascii=False),
                            }]
                            message = {"role": "assistant", "content": None,
                                       "tool_calls": wire_tool_calls(calls)}
                            finish = "tool_calls"
                        except (json.JSONDecodeError, KeyError, TypeError):
                            pass  # hit max_tokens mid-object: return the raw text
                    elif tool_mode == "auto":
                        from omchat_tpu.runtime.tool_calls import parse_tool_calls, wire_tool_calls

                        content, calls = parse_tool_calls(text)
                        if calls:
                            message = {"role": "assistant", "content": content,
                                       "tool_calls": wire_tool_calls(calls)}
                            finish = "tool_calls"
                    logprobs_obj = None
                    if lps is not None:
                        chosen, top = lps
                        entries = []
                        for pos, (t, lp) in enumerate(zip(token_ids, chosen)):
                            e = {
                                "token": model.tokenizer.decode([t], skip_special_tokens=True),
                                "logprob": lp,
                            }
                            if top is not None:
                                e["top_logprobs"] = [
                                    {
                                        "token": model.tokenizer.decode([tid], skip_special_tokens=True),
                                        "logprob": tlp,
                                    }
                                    for tid, tlp in top[pos]
                                ]
                            entries.append(e)
                        logprobs_obj = {"content": entries}
                    choices.append(
                        {
                            "index": idx,
                            "message": message,
                            "logprobs": logprobs_obj,
                            "finish_reason": finish,
                        }
                    )
                if req.get("stream"):
                    # tools + stream: the call must be parsed/validated whole,
                    # so buffer and emit one delta carrying the full message
                    self._sse_start()
                    ch = choices[0]
                    self._sse_chunk({"role": "assistant"})
                    delta = {k: v for k, v in ch["message"].items()
                             if k != "role" and v is not None}
                    if "tool_calls" in delta:
                        delta["tool_calls"] = [
                            {"index": i, **tc} for i, tc in enumerate(delta["tool_calls"])
                        ]
                    if delta:
                        self._sse_chunk(delta)
                    self._sse_chunk({}, finish_reason=ch["finish_reason"])
                    so = req.get("stream_options") or {}
                    if so.get("include_usage"):
                        self._sse_chunk(None, usage={
                            "prompt_tokens": prompt_len,
                            "completion_tokens": total_new,
                            "total_tokens": prompt_len + total_new,
                        })
                    count(prompt_len, total_new, (time.time() - t0) * 1000)
                    self.wfile.write(b"data: [DONE]\n\n")
                    self.wfile.flush()
                    return
                count(prompt_len, total_new, (time.time() - t0) * 1000)
                self._json(
                    200,
                    {
                        "object": "chat.completion",
                        "model": "omchat-tpu",
                        "choices": choices,
                        "usage": {
                            "prompt_tokens": prompt_len,
                            "completion_tokens": total_new,
                            "total_tokens": prompt_len + total_new,
                            "latency_ms": round((time.time() - t0) * 1000, 1),
                        },
                    },
                )
            except BadRequest as e:
                count(failed=True)
                self._json(400, _error_body(e, "invalid_request_error"))
            except Exception as e:  # noqa: BLE001
                logger.exception("request failed")
                count(failed=True)
                self._json(500, _error_body(e, "internal_error"))

    return Handler


def warmup_engines(model, batch_engine, logger, timeout_s=600.0):
    """Pre-compile the programs the first requests would otherwise pay for
    (20-200 s per program over a tunneled TPU): the decode step/roll, the
    batched-shorts prefill at the two smallest buckets, and — with a batch
    engine — concurrent requests so the B>1 batch shapes exist.  Text-only:
    image programs compile per tile-count on first use (their shapes depend
    on the client's images).  eos_token_id=-1 never matches a real token, so
    every warmup request runs its full max_new_tokens."""
    t0 = time.time()
    if batch_engine is not None and hasattr(batch_engine, "precompile"):
        # paged engine: compile the (batch, width) shorts-prefill menu and the
        # decode roll's live-width buckets up front — steady traffic otherwise
        # pays each first compile as a multi-second latency outlier
        batch_engine.precompile()
    if batch_engine is not None:
        prompts = [[9] * 17, [9] * 9, [9] * 9]
        rids = [batch_engine.submit(list(p), None, max_new_tokens=4, eos_token_id=-1)
                for p in prompts]
        deadline = time.time() + timeout_s
        while not all(batch_engine.finished(r) for r in rids):
            if time.time() > deadline or getattr(batch_engine, "dead", False):
                logger.warning("warmup did not finish; continuing")
                break
            time.sleep(0.01)
        for r in rids:
            if batch_engine.finished(r):
                batch_engine.pop_result(r)
    else:
        model.engine.generate([[9] * 9], None, GenerationConfig(max_new_tokens=4, eos_token_id=-1))
    logger.info(f"warmup done in {time.time() - t0:.1f}s")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--int8", action="store_true")
    parser.add_argument("--w8a8", action="store_true", help="w8a8 serving mode: int8 activations+weights on the MXU for ViT encode and prefill (implies --int8; calibrates static fc1 scales at load)")
    parser.add_argument("--continuous-batching", action="store_true", help="BatchEngine scheduler (concurrent requests share decode steps)")
    parser.add_argument("--max-slots", type=int, default=4)
    parser.add_argument("--max-len", type=int, default=8192)
    parser.add_argument("--tp", type=int, default=1, help="tensor-parallel degree (Megatron shardings over the device mesh)")
    parser.add_argument("--paged", action="store_true", help="paged KV pool instead of contiguous slots (ragged-length memory efficiency)")
    parser.add_argument("--num-pages", type=int, default=1024)
    parser.add_argument("--page-size", type=int, default=128)
    parser.add_argument("--decode-roll", type=int, default=1,
                        help="paged engine: decode steps per dispatch (throughput mode; >1 amortizes host round trips, adds up to roll-1 tokens of admission latency)")
    parser.add_argument("--streaming-roll", type=int, default=None, metavar="N",
                        help="paged engine: adaptive roll — shrink the decode roll to N while "
                        "any SSE stream is attached so clients see tokens every N steps "
                        "instead of every decode-roll (e.g. --decode-roll 16 "
                        "--streaming-roll 4); batch traffic keeps the full roll")
    parser.add_argument("--prefill-chunk", type=int, default=1024,
                        help="paged engine: prompts longer than this stream through fixed-shape paged chunks, decode rolls interleaved between chunks")
    parser.add_argument("--prefix-cache", action="store_true",
                        help="paged engine: automatic prefix caching - requests sharing a token prefix (system prompts) reuse its KV pages instead of re-prefilling")
    parser.add_argument("--image-cache", type=int, default=8, metavar="N",
                        help="encoded-image LRU entries (0 disables): repeated images (multi-turn VQA, shared assets) skip the ViT encode; keyed by the compressed payload bytes")
    parser.add_argument("--kv-cache-dtype", choices=["bf16", "fp8"], default="bf16",
                        help="paged engine: page-pool storage dtype; fp8 (e4m3) halves KV HBM and page DMA bytes, kernels dequantize on load")
    parser.add_argument("--decode-kernel", choices=["auto", "manual"], default="auto",
                        help="paged engine: 'manual' streams KV pages through an in-kernel async-copy ring instead of the auto-pipelined per-page grid (TPU only)")
    parser.add_argument("--speculative", action="store_true",
                        help="prompt-lookup speculative decoding: with --paged, greedy slots of "
                        "the continuous batch advance up to draft-len+1 tokens per batched "
                        "verify dispatch (identical tokens; sampled/logprobs ticks fall back "
                        "to the roll); without a batch engine, the single-request path")
    parser.add_argument("--draft-len", type=int, default=4,
                        help="speculative draft length per verify dispatch (paged engine)")
    parser.add_argument("--pipeline-rolls", action="store_true",
                        help="paged engine: dispatch the next decode roll from device-side "
                        "tokens before reading the previous one back (hides the per-roll "
                        "host gap; +1 roll admission latency when traffic resumes)")
    parser.add_argument("--lora", type=str, default=None,
                        help="LoRA adapter directory to merge into the base weights at load")
    parser.add_argument("--no-warmup", dest="warmup", action="store_false",
                        help="skip startup pre-compilation (first requests then pay the 20-200s per-program TPU compiles)")
    args = parser.parse_args()
    if args.paged and not args.continuous_batching:
        args.continuous_batching = True  # --paged implies the batch scheduler

    logger = build_logger("omchat.serve", "serve.log")
    model = load_pretrained_model(args.model_path, quantize_int8=args.int8, w8a8=args.w8a8, tp=args.tp,
                                  lora_path=args.lora)

    batch_engine = None
    if args.continuous_batching:
        if args.paged:
            import jax.numpy as jnp

            from omchat_tpu.runtime.paged_engine import PagedBatchEngine

            batch_engine = PagedBatchEngine(
                model.config,
                model.engine.params,
                max_slots=args.max_slots,
                num_pages=args.num_pages,
                page_size=args.page_size,
                max_len=args.max_len,
                attn_impl=model.engine.attn_impl,
                mesh=model.engine.mesh,
                decode_roll=args.decode_roll,
                streaming_roll=args.streaming_roll,
                prefill_chunk=args.prefill_chunk,
                prefix_cache=args.prefix_cache,
                cache_dtype=jnp.float8_e4m3fn if args.kv_cache_dtype == "fp8" else None,
                decode_kernel=args.decode_kernel,
                image_cache_size=args.image_cache,
                speculative=args.speculative,
                draft_len=args.draft_len,
                pipeline_rolls=args.pipeline_rolls,
            )
        else:
            from omchat_tpu.runtime.batch_engine import BatchEngine

            import jax.numpy as jnp

            batch_engine = BatchEngine(
                model.config,
                model.engine.params,
                max_slots=args.max_slots,
                max_len=args.max_len,
                attn_impl=model.engine.attn_impl,
                mesh=model.engine.mesh,
                cache_dtype=jnp.float8_e4m3fn if args.kv_cache_dtype == "fp8" else None,
                image_cache_size=args.image_cache,
            )

        def scheduler():
            while True:
                try:
                    if batch_engine.has_work():
                        batch_engine.step()
                    else:
                        time.sleep(0.002)
                except Exception:
                    logger.exception("batch scheduler died; failing in-flight requests")
                    batch_engine.dead = True
                    return

        threading.Thread(target=scheduler, daemon=True, name="batch-scheduler").start()
        logger.info(f"continuous batching: {args.max_slots} slots, max_len {args.max_len}")

    if args.warmup:
        warmup_engines(model, batch_engine, logger)

    server = ThreadingHTTPServer(
        (args.host, args.port),
        make_handler(model, logger, batch_engine, speculative=args.speculative),
    )
    logger.info(f"serving on {args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
