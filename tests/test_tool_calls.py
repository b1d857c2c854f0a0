"""OpenAI tool calling (runtime/tool_calls.py): request validation, prompt
rendering, <tool_call> parsing, schema sanitizing, and the forced-call schema
compiling under the guided-decoding mask."""

import json

import pytest

from omchat_tpu.runtime.json_schema import compile_schema
from omchat_tpu.runtime.tool_calls import (
    forced_call_schema,
    parse_tool_calls,
    parse_tool_choice,
    render_assistant_tool_calls,
    render_tool_result,
    render_tools_system,
    sanitize_schema,
    validate_tools,
    wire_tool_calls,
)

WEATHER = {
    "type": "function",
    "function": {
        "name": "get_weather",
        "description": "Get current weather",
        "parameters": {
            "type": "object",
            "properties": {
                "city": {"type": "string"},
                "unit": {"enum": ["celsius", "fahrenheit"]},
            },
            "required": ["city"],
        },
    },
}
SEARCH = {
    "type": "function",
    "function": {"name": "search", "parameters": {"type": "object",
                 "properties": {"q": {"type": "string"}}, "required": ["q"]}},
}


def test_validate_tools():
    fns = validate_tools([WEATHER, SEARCH])
    assert [f["name"] for f in fns] == ["get_weather", "search"]
    with pytest.raises(ValueError):
        validate_tools([])
    with pytest.raises(ValueError):
        validate_tools([{"type": "function"}])  # no function
    with pytest.raises(ValueError):
        validate_tools([WEATHER, WEATHER])  # duplicate names
    with pytest.raises(ValueError):
        validate_tools([{"type": "retrieval"}])


def test_parse_tool_choice():
    fns = validate_tools([WEATHER, SEARCH])
    assert parse_tool_choice(None, fns) == ("auto", None)
    assert parse_tool_choice("auto", fns) == ("auto", None)
    assert parse_tool_choice("none", fns) == ("none", None)
    assert parse_tool_choice("required", fns) == ("forced", None)
    mode, name = parse_tool_choice(
        {"type": "function", "function": {"name": "search"}}, fns)
    assert (mode, name) == ("forced", "search")
    with pytest.raises(ValueError):
        parse_tool_choice({"type": "function", "function": {"name": "nope"}}, fns)
    with pytest.raises(ValueError):
        parse_tool_choice(42, fns)


def test_render_tools_system_contains_schemas():
    fns = validate_tools([WEATHER])
    out = render_tools_system("You are helpful.", fns)
    assert out.startswith("You are helpful.")
    assert "<tools>" in out and "</tools>" in out
    assert '"get_weather"' in out and "<tool_call>" in out


def test_parse_tool_calls_roundtrip():
    text = ('Let me check.\n<tool_call>\n{"name": "get_weather", '
            '"arguments": {"city": "Paris"}}\n</tool_call>')
    content, calls = parse_tool_calls(text)
    assert content == "Let me check."
    assert calls == [{"name": "get_weather", "arguments": '{"city": "Paris"}'}]
    # two calls, no content
    text2 = ('<tool_call>{"name": "a", "arguments": {}}</tool_call>'
             '<tool_call>{"name": "b", "arguments": {"x": 1}}</tool_call>')
    content2, calls2 = parse_tool_calls(text2)
    assert content2 is None and [c["name"] for c in calls2] == ["a", "b"]
    # mangled block stays in content, is not a call
    content3, calls3 = parse_tool_calls("<tool_call>{broken</tool_call>")
    assert calls3 == [] and content3 is not None
    # plain text untouched
    assert parse_tool_calls("hello") == ("hello", [])


def test_render_history_turns():
    replay = render_assistant_tool_calls(
        "thinking", wire_tool_calls([{"name": "search", "arguments": '{"q": "x"}'}]))
    assert replay.startswith("thinking")
    content, calls = parse_tool_calls(replay)
    assert content == "thinking" and calls[0]["name"] == "search"
    assert json.loads(calls[0]["arguments"]) == {"q": "x"}
    assert render_tool_result("42").startswith("<tool_response>")


def test_sanitize_schema_drops_unsupported():
    dirty = {
        "type": "object",
        "properties": {
            "a": {"type": "string", "format": "date-time", "minLength": 3},
            "b": {"oneOf": [{"type": "string"}, {"type": "integer"}]},
            "c": {"type": "array", "items": {"type": "number"}, "minItems": 1},
            "d": {"type": "integer", "minimum": 0},
        },
        "required": ["a", "b"],
        "additionalProperties": False,
        "$defs": {"x": {}},
    }
    clean = sanitize_schema(dirty)
    # every subtree must now compile under the mask
    compile_schema(clean)
    assert clean["properties"]["a"] == {"type": "string"}
    assert clean["properties"]["b"] == {}  # oneOf degrades to any
    assert clean["properties"]["c"] == {"type": "array", "items": {"type": "number"}, "minItems": 1}
    assert clean["properties"]["d"] == {"type": "integer"}
    assert clean["required"] == ["a", "b"]


def test_forced_call_schema_compiles():
    fns = validate_tools([WEATHER, SEARCH])
    # named: arguments constrained to the tool's parameters
    s = forced_call_schema(fns, "get_weather")
    compile_schema(s)
    assert s["properties"]["name"] == {"const": "get_weather"}
    assert "city" in s["properties"]["arguments"]["properties"]
    # required over several tools: name pinned to the set, args free-form
    s2 = forced_call_schema(fns, None)
    compile_schema(s2)
    assert s2["properties"]["name"] == {"enum": ["get_weather", "search"]}
    assert s2["properties"]["arguments"] == {"type": "object"}
    # single tool: same as named
    s3 = forced_call_schema(validate_tools([SEARCH]), None)
    compile_schema(s3)
    assert s3["properties"]["name"] == {"const": "search"}
