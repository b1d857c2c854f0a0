"""HTTP serving front-end: /v1/chat/completions round trip with a tiny model."""

import base64
import io
import json
import sys
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, "cli")


def _tiny_model():
    import jax.numpy as jnp

    from omchat_tpu.api import OmChatModel
    from omchat_tpu.config import OmChatConfig
    from omchat_tpu.processing.image_processor import OmChatImageProcessor
    from omchat_tpu.processing.processor import OmChatProcessor
    from omchat_tpu.runtime.generate import OmChatEngine
    from tests.conftest import MockTokenizer
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    tokenizer = MockTokenizer()
    engine = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=8)
    ip = OmChatImageProcessor(crop_size=56, shortest_edge=56, image_grid_pinpoints=cfg.image_grid_pinpoints)
    return OmChatModel(tokenizer, engine, ip, OmChatProcessor(tokenizer, ip), cfg)


@pytest.fixture(scope="module")
def server_port():
    from serve import make_handler
    from omchat_tpu.utils.logging import build_logger

    model = _tiny_model()
    logger = build_logger("test.serve", "test_serve.log", log_dir="/tmp")
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(model, logger))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield server.server_address[1]
    server.shutdown()


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/chat/completions",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read())


def test_health(server_port):
    with urllib.request.urlopen(f"http://127.0.0.1:{server_port}/health", timeout=30) as resp:
        assert json.loads(resp.read())["status"] == "ok"


def test_text_completion(server_port):
    out = _post(
        server_port,
        {"messages": [{"role": "user", "content": "hello"}], "max_tokens": 4},
    )
    assert out["choices"][0]["message"]["role"] == "assistant"
    assert out["usage"]["completion_tokens"] <= 4


def test_streaming_completion(server_port):
    """SSE path: role chunk first, content deltas, finish_reason, [DONE]."""
    req = urllib.request.Request(
        f"http://127.0.0.1:{server_port}/v1/chat/completions",
        data=json.dumps(
            {"messages": [{"role": "user", "content": "hi"}], "max_tokens": 4, "stream": True}
        ).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.headers["Content-Type"] == "text/event-stream"
        lines = [l for l in resp.read().decode().split("\n") if l.startswith("data: ")]
    assert lines[-1] == "data: [DONE]"
    chunks = [json.loads(l[len("data: "):]) for l in lines[:-1]]
    assert chunks[0]["choices"][0]["delta"] == {"role": "assistant"}
    assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")
    assert all(c["object"] == "chat.completion.chunk" for c in chunks)


def test_image_completion(server_port, rng):
    img = Image.fromarray(rng.integers(0, 255, (80, 60, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    out = _post(
        server_port,
        {
            "messages": [
                {
                    "role": "user",
                    "content": [
                        {"type": "text", "text": "what is this?"},
                        {"type": "image_url", "image_url": {"url": f"data:image/png;base64,{b64}"}},
                    ],
                }
            ],
            "max_tokens": 4,
        },
    )
    assert out["usage"]["prompt_tokens"] > 16  # image tokens got spliced


def test_stop_strings(server_port):
    """OpenAI ``stop``: generation is cut before the stop string and
    finish_reason is "stop" (greedy => deterministic across the two calls)."""
    base = _post(
        server_port,
        {"messages": [{"role": "user", "content": "hello"}], "max_tokens": 8},
    )
    text = base["choices"][0]["message"]["content"]
    if len(text) < 3:
        pytest.skip("tiny model emitted undecodable text")
    stop = text[1:3]
    out = _post(
        server_port,
        {"messages": [{"role": "user", "content": "hello"}], "max_tokens": 8, "stop": stop},
    )
    cut = out["choices"][0]["message"]["content"]
    assert stop not in cut
    assert cut == text[: text.find(stop)]
    assert out["choices"][0]["finish_reason"] == "stop"


def test_stop_helpers():
    """_parse_stops normalizes the OpenAI field; _cut_at_stop trims at the
    EARLIEST occurrence across stop strings."""
    from serve import _cut_at_stop, _parse_stops

    assert _parse_stops({"stop": "\n"}) == ["\n"]
    assert _parse_stops({"stop": ["a", "", "b", "c", "d", "e"]}) == ["a", "b", "c", "d"]
    assert _parse_stops({}) == []
    assert _cut_at_stop("hello world", ["wor"]) == ("hello ", True)
    assert _cut_at_stop("a.b,c", [",", "."]) == ("a", True)
    assert _cut_at_stop("plain", ["zzz"]) == ("plain", False)


def test_metrics_endpoint(server_port):
    """/metrics: Prometheus text format with request counters."""
    _post(server_port, {"messages": [{"role": "user", "content": "m"}], "max_tokens": 2})
    with urllib.request.urlopen(f"http://127.0.0.1:{server_port}/metrics", timeout=30) as resp:
        assert resp.headers["Content-Type"].startswith("text/plain")
        body = resp.read().decode()
    lines = dict(
        l.split(" ", 1) for l in body.splitlines() if l and not l.startswith("#")
    )
    assert int(lines["omchat_requests_total"]) >= 1
    assert int(lines["omchat_completion_tokens_total"]) >= 2
    assert "# TYPE omchat_requests_total counter" in body


def test_logprobs(server_port):
    """OpenAI ``logprobs``: per-token chosen logprobs, all <= 0, aligned with
    the completion length."""
    out = _post(
        server_port,
        {"messages": [{"role": "user", "content": "hello"}], "max_tokens": 4, "logprobs": True},
    )
    lp = out["choices"][0]["logprobs"]
    assert lp is not None and "content" in lp
    assert len(lp["content"]) == out["usage"]["completion_tokens"]
    assert all(e["logprob"] <= 0.0 for e in lp["content"])


def test_n_choices_and_seed(server_port):
    """``n`` returns that many choices; ``seed`` makes sampling reproducible."""
    out = _post(
        server_port,
        {"messages": [{"role": "user", "content": "hi"}], "max_tokens": 3, "n": 2},
    )
    assert [c["index"] for c in out["choices"]] == [0, 1]
    assert out["usage"]["completion_tokens"] <= 6
    a = _post(
        server_port,
        {"messages": [{"role": "user", "content": "hi"}], "max_tokens": 4,
         "temperature": 0.9, "seed": 7},
    )
    b = _post(
        server_port,
        {"messages": [{"role": "user", "content": "hi"}], "max_tokens": 4,
         "temperature": 0.9, "seed": 7},
    )
    assert a["choices"][0]["message"]["content"] == b["choices"][0]["message"]["content"]


def test_top_logprobs(server_port):
    """``top_logprobs``: k alternatives per position, sorted descending, and
    the chosen (greedy) token's logprob equals the top-1 alternative's."""
    out = _post(
        server_port,
        {"messages": [{"role": "user", "content": "hello"}], "max_tokens": 3,
         "logprobs": True, "top_logprobs": 3},
    )
    content = out["choices"][0]["logprobs"]["content"]
    assert len(content) == out["usage"]["completion_tokens"]
    for e in content:
        tops = e["top_logprobs"]
        assert len(tops) == 3
        assert tops == sorted(tops, key=lambda x: -x["logprob"])
        assert abs(e["logprob"] - tops[0]["logprob"]) < 1e-5  # greedy == top-1


def test_json_mode(server_port):
    """response_format json_object: the reply is a valid JSON object (the
    byte-level mock tokenizer makes every byte a token, so the mask drives
    the random tiny model through the automaton end to end)."""
    out = _post(
        server_port,
        {
            "messages": [{"role": "user", "content": "give me json"}],
            "max_tokens": 48,
            "response_format": {"type": "json_object"},
        },
    )
    text = out["choices"][0]["message"]["content"]
    from omchat_tpu.runtime.json_mode import START, advance

    cfg = advance(START, text)
    assert cfg is not None, text  # always a valid JSON prefix
    if out["choices"][0]["finish_reason"] == "stop" or cfg[0] == "end":
        json.loads(text)


def test_text_completions_endpoint(server_port):
    """OpenAI legacy /v1/completions: verbatim prompt tokenization (no chat
    template), text choices, echo, stop strings."""
    req = urllib.request.Request(
        f"http://127.0.0.1:{server_port}/v1/completions",
        data=json.dumps({"prompt": "abcd", "max_tokens": 4}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        out = json.loads(resp.read())
    assert out["object"] == "text_completion"
    assert out["usage"]["prompt_tokens"] == 4  # byte tokenizer: no template
    assert out["choices"][0]["finish_reason"] in ("stop", "length")

    req = urllib.request.Request(
        f"http://127.0.0.1:{server_port}/v1/completions",
        data=json.dumps({"prompt": "xy", "max_tokens": 2, "echo": True, "n": 2}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        out = json.loads(resp.read())
    assert len(out["choices"]) == 2
    assert all(c["text"].startswith("xy") for c in out["choices"])


def test_json_schema_structured_output(server_port):
    """response_format json_schema / guided_json: the reply conforms to the
    schema when the object completes (byte-level mock tokenizer)."""
    schema = {
        "type": "object",
        "properties": {"ok": {"type": "boolean"}, "n": {"type": "integer"}},
        "required": ["ok"],
    }
    for body in (
        {"response_format": {"type": "json_schema",
                             "json_schema": {"name": "t", "schema": schema}}},
        {"guided_json": schema},
    ):
        out = _post(
            server_port,
            {"messages": [{"role": "user", "content": "go"}], "max_tokens": 48, **body},
        )
        text = out["choices"][0]["message"]["content"]
        from omchat_tpu.runtime.json_schema import JsonSchemaMode
        from tests.conftest import MockTokenizer
        m = JsonSchemaMode(MockTokenizer(), schema)
        assert m.advance(m.START, text) is not None, text
        if out["choices"][0]["finish_reason"] == "stop":
            obj = json.loads(text)
            assert isinstance(obj.get("ok"), bool)


def test_logit_bias_and_penalties(server_port):
    """logit_bias pins the next token; a huge frequency_penalty forbids
    immediate repetition (engine path)."""
    out = _post(
        server_port,
        {
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 3,
            "logit_bias": {"65": 100},  # byte tokenizer: 65 = 'A'
        },
    )
    assert out["choices"][0]["message"]["content"] == "AAA"

    out = _post(
        server_port,
        {
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 6,
            "logit_bias": {"65": 100},
            "frequency_penalty": 1000.0,
        },
    )
    text = out["choices"][0]["message"]["content"]
    assert text[0] == "A" and "AA" not in text  # penalty kills the repeat


def test_streaming_text_completions_with_usage(server_port):
    """/v1/completions streaming: text_completion chunks, usage chunk when
    stream_options.include_usage, then [DONE]."""
    req = urllib.request.Request(
        f"http://127.0.0.1:{server_port}/v1/completions",
        data=json.dumps({
            "prompt": "ab", "max_tokens": 4, "stream": True,
            "stream_options": {"include_usage": True},
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.headers["Content-Type"] == "text/event-stream"
        lines = [l for l in resp.read().decode().split("\n") if l.startswith("data: ")]
    assert lines[-1] == "data: [DONE]"
    chunks = [json.loads(l[len("data: "):]) for l in lines[:-1]]
    assert all(c["object"] == "text_completion" for c in chunks)
    assert chunks[-1]["usage"]["prompt_tokens"] == 2
    assert chunks[-1]["usage"]["completion_tokens"] <= 4
    assert chunks[-1]["choices"] == []
    assert chunks[-2]["choices"][0]["finish_reason"] in ("stop", "length")


def test_bad_requests_get_400(server_port):
    """Malformed bodies and invalid field values return an OpenAI-style 400
    invalid_request_error, not a 500."""
    import urllib.error

    def post_raw(path, data):
        req = urllib.request.Request(
            f"http://127.0.0.1:{server_port}{path}",
            data=data,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=60) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    cases = [
        ("/v1/chat/completions", b"{not json"),
        ("/v1/chat/completions", b"[1, 2]"),
        ("/v1/chat/completions", json.dumps({"messages": "hi"}).encode()),
        ("/v1/chat/completions", json.dumps(
            {"messages": [{"role": "user", "content": "x"}], "max_tokens": "lots"}).encode()),
        ("/v1/chat/completions", json.dumps(
            {"messages": [{"role": "user", "content": "x"}], "max_tokens": 0}).encode()),
        ("/v1/chat/completions", json.dumps(
            {"messages": [{"role": "user", "content": [
                {"type": "image_url", "image_url": {"url": "data:image/png;base64,!!!"}}]}]}).encode()),
        ("/v1/completions", b"{not json"),
        ("/v1/completions", json.dumps({"prompt": ["a", "b"]}).encode()),
        ("/v1/completions", json.dumps({"prompt": 7}).encode()),
    ]
    for path, body in cases:
        code, out = post_raw(path, body)
        assert code == 400, (path, body, code, out)
        assert out["error"]["type"] == "invalid_request_error", out


def test_warmup_engines():
    """Startup warmup: runs to completion on both the single-request engine
    and a batch engine (scheduler thread driving step()), drains its own
    requests, and leaves the engines serviceable."""
    import threading as _threading

    from serve import warmup_engines
    from omchat_tpu.runtime.batch_engine import BatchEngine
    from omchat_tpu.utils.logging import build_logger
    from tests.test_sharding import _tiny_params
    from omchat_tpu.config import OmChatConfig

    logger = build_logger("test.warmup", "test_warmup.log", log_dir="/tmp")
    model = _tiny_model()
    warmup_engines(model, None, logger)  # engine path: just must not raise

    cfg = OmChatConfig.tiny()
    be = BatchEngine(cfg, _tiny_params(cfg), max_slots=2, max_len=64, chunk_size=16, attn_impl="xla")
    stop = _threading.Event()

    def drive():
        while not stop.is_set():
            if be.has_work():
                be.step()
            else:
                stop.wait(0.002)

    t = _threading.Thread(target=drive, daemon=True)
    t.start()
    try:
        warmup_engines(model, be, logger, timeout_s=120.0)
    finally:
        stop.set()
        t.join(timeout=10)
    assert not be.requests  # warmup drained everything it submitted


def test_streaming_chat_usage_chunk(server_port):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server_port}/v1/chat/completions",
        data=json.dumps({
            "messages": [{"role": "user", "content": "hi"}], "max_tokens": 3,
            "stream": True, "stream_options": {"include_usage": True},
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        lines = [l for l in resp.read().decode().split("\n") if l.startswith("data: ")]
    chunks = [json.loads(l[len("data: "):]) for l in lines[:-1]]
    assert "usage" in chunks[-1] and chunks[-1]["choices"] == []
    assert chunks[-1]["usage"]["completion_tokens"] <= 3


def test_tool_calling_forced(server_port):
    """tool_choice 'required'/named: decoding is schema-constrained so the
    reply is a guaranteed well-formed call naming a declared tool."""
    tools = [
        {"type": "function", "function": {
            "name": "get_weather",
            "parameters": {"type": "object",
                           "properties": {"city": {"type": "string"}},
                           "required": ["city"]}}},
        {"type": "function", "function": {
            "name": "search",
            "parameters": {"type": "object",
                           "properties": {"q": {"type": "string"}},
                           "required": ["q"]}}},
    ]
    out = _post(server_port, {
        "messages": [{"role": "user", "content": "weather in paris?"}],
        "tools": tools,
        "tool_choice": {"type": "function", "function": {"name": "get_weather"}},
        "max_tokens": 64,
    })
    ch = out["choices"][0]
    if ch["finish_reason"] == "tool_calls":  # object completed within budget
        assert ch["message"]["content"] is None
        (tc,) = ch["message"]["tool_calls"]
        assert tc["type"] == "function" and tc["id"].startswith("call_")
        assert tc["function"]["name"] == "get_weather"
        args = json.loads(tc["function"]["arguments"])
        assert isinstance(args, dict)
    else:  # truncated mid-object: raw text returned, still a valid prefix
        assert ch["finish_reason"] == "length"
        assert ch["message"]["content"].startswith("{")

    # 'required' over both tools: name must be one of the declared set
    out2 = _post(server_port, {
        "messages": [{"role": "user", "content": "go"}],
        "tools": tools, "tool_choice": "required", "max_tokens": 64,
    })
    ch2 = out2["choices"][0]
    if ch2["finish_reason"] == "tool_calls":
        assert ch2["message"]["tool_calls"][0]["function"]["name"] in ("get_weather", "search")


def test_tool_calling_auto_and_history(server_port):
    """'auto' leaves decoding unconstrained (plain text => no tool_calls);
    assistant tool_calls + role:'tool' history turns render without error."""
    tools = [{"type": "function", "function": {"name": "f", "parameters": {"type": "object"}}}]
    out = _post(server_port, {
        "messages": [
            {"role": "user", "content": "hi"},
            {"role": "assistant", "content": None, "tool_calls": [
                {"id": "call_0", "type": "function",
                 "function": {"name": "f", "arguments": "{}"}}]},
            {"role": "tool", "tool_call_id": "call_0", "content": "42"},
        ],
        "tools": tools,
        "max_tokens": 4,
    })
    ch = out["choices"][0]
    assert ch["message"]["role"] == "assistant"
    assert "tool_calls" not in ch["message"]  # random model emits no tags
    assert out["usage"]["prompt_tokens"] > 0


def test_tool_calling_stream_buffered(server_port):
    """stream + tools emits one buffered delta (role, full message, finish)."""
    tools = [{"type": "function", "function": {
        "name": "t", "parameters": {"type": "object",
                                    "properties": {"x": {"type": "integer"}}}}}]
    req = urllib.request.Request(
        f"http://127.0.0.1:{server_port}/v1/chat/completions",
        data=json.dumps({
            "messages": [{"role": "user", "content": "go"}],
            "tools": tools, "tool_choice": "required",
            "max_tokens": 48, "stream": True,
            "stream_options": {"include_usage": True},
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.headers["Content-Type"].startswith("text/event-stream")
        events = [json.loads(line[6:]) for line in resp.read().decode().splitlines()
                  if line.startswith("data: ") and line != "data: [DONE]"]
    finishes = [c.get("finish_reason") for e in events for c in e.get("choices", [])]
    assert any(f in ("tool_calls", "length") for f in finishes)
    assert any("usage" in e for e in events)
    for e in events:
        for c in e.get("choices", []):
            for tc in (c["delta"].get("tool_calls") or []):
                assert tc["index"] == 0 and tc["function"]["name"] == "t"


def test_tool_calling_bad_requests(server_port):
    """Malformed tools / tool_choice map to OpenAI-style 400s."""
    import urllib.error

    for body in (
        {"tools": []},
        {"tools": [{"type": "function"}]},
        {"tools": [{"type": "function", "function": {"name": "a"}}],
         "tool_choice": {"type": "function", "function": {"name": "b"}}},
        {"tools": [{"type": "function", "function": {"name": "a"}}],
         "tool_choice": "required",
         "response_format": {"type": "json_object"}},
    ):
        try:
            _post(server_port, {"messages": [{"role": "user", "content": "x"}],
                                "max_tokens": 4, **body})
            assert False, f"expected 400 for {body}"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert json.loads(e.read())["error"]["type"] == "invalid_request_error"
