"""JSON-constrained decoding (runtime/json_mode.py): the automaton accepts
exactly valid-JSON prefixes, and masked generation always emits parseable
JSON objects (greedy and sampled), stopping when the object closes."""

import json

import numpy as np
import pytest

from omchat_tpu.runtime.json_mode import START, JsonMode, advance, get_json_mode


def ok(text):
    return advance(START, text) is not None


def complete(text):
    cfg = advance(START, text)
    return cfg is not None and cfg[0] == "end"


def test_automaton_accepts_valid_objects():
    assert complete('{}')
    assert complete('{"a": 1}')
    assert complete('{ "a" : [1, 2.5, -3e+2, true, false, null] }')
    assert complete('{"a": {"b": [{"c": "d"}]}, "e": ""}')
    assert complete('{"s": "q\\"uote \\\\ \\n \\u00e9"}')
    assert complete('{"n": 0.5, "m": -0.125e-2}')
    assert ok('{"a": 1')  # valid prefix, not complete
    assert not complete('{"a": 1')


def test_automaton_rejects_invalid():
    assert not ok('[')  # root must be an object (json_object mode)
    assert not ok('x')
    assert not ok('{,')
    assert not ok('{"a" 1')
    assert not ok('{"a": 01}')  # leading zero
    assert not ok('{"a": 1.}')  # needs frac digit... 1. then } -> dot state
    assert not ok('{"a": +1}')
    assert not ok('{"a": tru0')
    assert not ok('{"a": "\x01"')  # raw control char in string
    assert not ok('{"a": "\\x"')  # bad escape
    assert not ok('{"a": 1}}')
    assert not ok('{"a": 1,}')  # trailing comma: ',' then '}' is key position
    assert not ok('{} x')


def test_number_self_termination():
    assert complete('{"a": 12,"b": 3}')
    assert complete('{"a": [1,2]}')
    assert complete('{"a": 1e4}')
    assert not ok('{"a": 1e}')
    assert not ok('{"a": --1}')


class FakeTok:
    """Minimal tokenizer: one string per id; id 0 is a special (eos)."""

    def __init__(self, pieces):
        self.pieces = [""] + list(pieces)
        self.all_special_ids = [0]

    def __len__(self):
        return len(self.pieces)

    def decode(self, ids, **kw):
        return "".join(self.pieces[i] for i in ids)


PIECES = [
    "{", "}", "[", "]", ":", ",", '"', " ", "\n",
    '{"', '":', '"}', '", "', '"]', '"}',
    "a", "b", "name", "hello world", "x\\y", 'q"r', "\\n", "\\u00e9",
    "0", "1", "9", "42", "-", ".", "e", "E", "+", "3.14",
    "true", "false", "null", "tr", "ue",
    "{\"name\": ", "\x01bad",
]


@pytest.fixture(scope="module")
def jm():
    return JsonMode(FakeTok(PIECES))


def test_masked_walk_always_valid_json(jm):
    """Property: following any allowed token from any reachable state keeps
    the text a valid prefix; termination yields parseable JSON."""
    rng = np.random.default_rng(0)
    completed = 0
    for trial in range(200):
        fn = jm.mask_fn()
        path, text = [], ""
        for step in range(80):
            ids = fn(path)
            if ids is None:
                break
            tid = int(rng.choice(ids))
            path.append(tid)
            text += jm.token_text[tid]
            assert advance(START, text) is not None, (text, trial)
        ids = fn(path)
        if ids is None and advance(START, text)[0] == "end":
            json.loads(text)
            completed += 1
    assert completed > 50  # plenty of walks actually close the object


def test_mask_excludes_specials_and_illegal(jm):
    fn = jm.mask_fn()
    ids = set(int(i) for i in fn([]))
    assert 0 not in ids  # special
    bad = PIECES.index("\x01bad") + 1
    assert bad not in ids
    # root: every allowed token must start the object
    for tid in ids:
        assert jm.token_text[tid].lstrip(" \n\t\r").startswith("{") or set(
            jm.token_text[tid]
        ) <= set(" \n\t\r")


def test_multi_close_token_respects_stack(jm):
    """'"]' closes string-then-array: legal under an array, not an object."""
    close_arr = PIECES.index('"]') + 1
    in_arr = advance(START, '{"k": ["v') is not None and advance(START, '{"k": ["v')
    in_obj = advance(START, '{"k": "v')
    assert close_arr in set(int(i) for i in jm.allowed_ids(in_arr))
    assert close_arr not in set(int(i) for i in jm.allowed_ids(in_obj))


def test_engine_generates_valid_json(rng):
    """Tiny random model + mask: greedy output is valid JSON or a valid
    prefix; the run stops by itself when the object completes."""
    from tests.test_sharding import _tiny_params

    from omchat_tpu.config import GenerationConfig, OmChatConfig
    from omchat_tpu.runtime.generate import OmChatEngine

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    vocab = params["language_model"]["embed_tokens"].shape[0]
    # fake tokenizer covering the tiny model's whole vocab: cycle the pieces
    pieces = [PIECES[i % len(PIECES)] for i in range(vocab - 1)]
    tok = FakeTok(pieces)
    jm2 = JsonMode(tok)
    engine = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=16)
    out = engine.generate(
        [[5, 6, 7]],
        None,
        GenerationConfig(max_new_tokens=48, eos_token_id=-1),
        allowed_tokens_fn=jm2.mask_fn(),
    )
    text = tok.decode(out.token_ids[0])
    assert advance(START, text) is not None, text
    if advance(START, text)[0] == "end":
        json.loads(text)


def test_get_json_mode_caches():
    t = FakeTok(PIECES)
    assert get_json_mode(t) is get_json_mode(t)


def test_tables_cache_not_fooled_by_id_reuse():
    """get_tables keyed by bare id(tokenizer) went stale when a collected
    tokenizer's address was reused by a new instance — the new tokenizer
    received tables built for a DIFFERENT vocab (corrupted schema masks).
    Churn tokenizers so CPython reuses addresses and pin that every lookup
    returns tables matching the asking tokenizer's own vocab."""
    from omchat_tpu.runtime.json_mode import get_tables

    for i in range(50):
        pieces = PIECES[: 10 + (i % 7)]
        tok = FakeTok(pieces)
        tables = get_tables(tok)
        # specials map to None; every other entry must match THIS tokenizer
        assert len(tables.token_text) == len(tok.pieces), f"stale tables at iter {i}"
        assert list(tables.token_text)[1:] == tok.pieces[1:], f"stale tables at iter {i}"
        # second lookup on the live object must hit the same tables
        assert get_tables(tok) is tables
        del tok  # free the address for reuse by the next iteration
