"""Schema-guided decoding (runtime/json_schema.py): masked walks always
produce schema-valid JSON, required keys/enums/integer-ness/array bounds
enforced at the token level."""

import json

import jsonschema
import numpy as np
import pytest

from omchat_tpu.runtime.json_schema import JsonSchemaMode, compile_schema, get_json_schema_mode
from tests.test_json_mode import PIECES, FakeTok

SCHEMA_PERSON = {
    "type": "object",
    "properties": {
        "name": {"type": "string"},
        "age": {"type": "integer"},
        "score": {"type": "number"},
        "tags": {"type": "array", "items": {"type": "string"}, "minItems": 1, "maxItems": 3},
        "mood": {"enum": ["happy", "sad", 42, None, True]},
        "active": {"type": "boolean"},
    },
    "required": ["name", "age"],
}

# pieces that can spell the person schema (plus plenty of irrelevant ones)
SCHEMA_PIECES = PIECES + [
    "na", "me", "age", "sc", "ore", "tags", "mood", "active",
    "happy", "sad", "ha", "ppy", '{"name', '"age":', ' ', "  ",
]


@pytest.fixture(scope="module")
def tok():
    return FakeTok(SCHEMA_PIECES)


def _walk_random(mode, tok, rng, max_steps=120):
    fn = mode.mask_fn()
    path, text = [], ""
    for _ in range(max_steps):
        ids = fn(path)
        if ids is None:
            break
        tid = int(rng.choice(ids))
        path.append(tid)
        text += mode.token_text[tid]
        assert mode.advance(mode.START, text) is not None, text
    return text, fn(path) is None


def test_person_schema_walks_validate(tok):
    rng = np.random.default_rng(1)
    mode = JsonSchemaMode(tok, SCHEMA_PERSON)
    completed = 0
    for _ in range(150):
        text, done = _walk_random(mode, tok, rng)
        if done and mode.advance(mode.START, text)[0] == "end":
            obj = json.loads(text)
            jsonschema.validate(obj, SCHEMA_PERSON)
            assert "name" in obj and "age" in obj
            assert isinstance(obj["age"], int)
            completed += 1
    assert completed > 30, completed


def test_nested_and_array_bounds(tok):
    schema = {
        "type": "object",
        "properties": {
            "a": {
                "type": "array",
                "items": {"type": "object", "properties": {"b": {"type": "integer"}},
                          "required": ["b"]},
                "minItems": 1,
                "maxItems": 2,
            }
        },
        "required": ["a"],
    }
    rng = np.random.default_rng(2)
    mode = JsonSchemaMode(tok, schema)
    completed = 0
    for _ in range(100):
        text, done = _walk_random(mode, tok, rng)
        if done and mode.advance(mode.START, text)[0] == "end":
            obj = json.loads(text)
            jsonschema.validate(obj, schema)
            assert 1 <= len(obj["a"]) <= 2
            completed += 1
    assert completed > 20, completed


def test_enum_root_and_integer_root(tok):
    rng = np.random.default_rng(3)
    enum_mode = JsonSchemaMode(tok, {"enum": ["happy", 42, None]})
    seen = set()
    for _ in range(40):
        text, done = _walk_random(enum_mode, tok, rng)
        assert done
        seen.add(text)
        assert json.loads(text) in ("happy", 42, None)
    assert len(seen) >= 2

    int_mode = JsonSchemaMode(tok, {"type": "integer"})
    for _ in range(20):
        text, done = _walk_random(int_mode, tok, rng)
        assert done
        v = json.loads(text)
        assert isinstance(v, int) and not isinstance(v, bool), text


def test_union_type(tok):
    rng = np.random.default_rng(4)
    mode = JsonSchemaMode(tok, {"type": ["string", "null"]})
    kinds = set()
    for _ in range(40):
        text, done = _walk_random(mode, tok, rng)
        if done:
            v = json.loads(text)
            assert v is None or isinstance(v, str)
            kinds.add(type(v).__name__)
    assert len(kinds) >= 2


def test_required_keys_block_early_close(tok):
    mode = JsonSchemaMode(tok, SCHEMA_PERSON)
    cfg = mode.advance(mode.START, '{"name": "x"')
    assert cfg is not None
    # '}' must be masked out: "age" still missing
    ids = mode.allowed_ids(cfg)
    texts = {mode.token_text[int(t)] for t in ids}
    assert not any(t.lstrip(" \n\t\r").startswith("}") for t in texts), texts
    # after age, '}' becomes reachable
    cfg2 = mode.advance(mode.START, '{"name": "x", "age": 3')
    ids2 = mode.allowed_ids(cfg2)
    texts2 = {mode.token_text[int(t)] for t in ids2}
    assert any("}" in t for t in texts2)


def test_duplicate_key_rejected(tok):
    mode = JsonSchemaMode(tok, SCHEMA_PERSON)
    assert mode.advance(mode.START, '{"name": "x", "name') is None
    assert mode.advance(mode.START, '{"bogus') is None
    assert mode.advance(mode.START, '{"age": 1.5') is None  # integer only
    assert mode.advance(mode.START, '{"mood": "angry"') is None
    assert mode.advance(mode.START, '{"mood": "happy"') is not None
    assert mode.advance(mode.START, '{"mood": 42') is not None
    assert mode.advance(mode.START, '{"tags": []') is None  # minItems 1


def test_compile_rejects_unsupported():
    with pytest.raises(ValueError):
        compile_schema({"type": "object", "patternProperties": {}})
    with pytest.raises(ValueError):
        compile_schema({"type": "object", "properties": {"a": {}}, "required": ["b"]})
    with pytest.raises(ValueError):
        compile_schema({"type": "weird"})
    with pytest.raises(ValueError):
        compile_schema({"enum": []})


def test_unconstrained_object_keys(tok):
    """No properties -> any keys, any values (generic JSON object)."""
    rng = np.random.default_rng(5)
    mode = JsonSchemaMode(tok, {"type": "object"})
    assert mode.advance(mode.START, '{"anything at all": [1, {"x": null}]}')[0] == "end"
    completed = 0
    for _ in range(60):
        text, done = _walk_random(mode, tok, rng)
        if done and mode.advance(mode.START, text)[0] == "end":
            json.loads(text)
            completed += 1
    assert completed > 10


def test_cache_and_engine_integration(rng):
    from tests.test_sharding import _tiny_params

    from omchat_tpu.config import GenerationConfig, OmChatConfig
    from omchat_tpu.runtime.generate import OmChatEngine

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    vocab = params["language_model"]["embed_tokens"].shape[0]
    pieces = [SCHEMA_PIECES[i % len(SCHEMA_PIECES)] for i in range(vocab - 1)]
    tok = FakeTok(pieces)
    schema = {"type": "object", "properties": {"name": {"type": "string"}},
              "required": ["name"]}
    assert get_json_schema_mode(tok, schema) is get_json_schema_mode(tok, dict(schema))
    mode = get_json_schema_mode(tok, schema)
    engine = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=16)
    out = engine.generate(
        [[5, 6, 7]],
        None,
        GenerationConfig(max_new_tokens=64, eos_token_id=-1),
        allowed_tokens_fn=mode.mask_fn(),
    )
    text = tok.decode(out.token_ids[0])
    end = mode.advance(mode.START, text)
    assert end is not None, text
    if end[0] == "end":
        obj = json.loads(text)
        jsonschema.validate(obj, schema)
