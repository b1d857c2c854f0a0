"""Constrained decoding overhead at the 13B geometry: unconstrained greedy
vs JSON-schema-masked greedy on the single-request engine path.

The mask is host-built per step (numpy [V] bias + upload), so this prices
exactly what a guided request costs over an unguided one: automaton walk +
bias materialization + the extra host->device transfer per step.  The
152k-piece synthetic tokenizer approximates a real BPE vocab's partition
sizes (structural/quote-bearing/plain) so VocabTables build time and walk
costs are realistic.

    python dev/bench_guided.py
"""

import json
import string
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench
from omchat_tpu.config import GenerationConfig, OmChatConfig
from omchat_tpu.runtime.generate import OmChatEngine

NEW_TOKENS = 64


class SynthTok:
    """152k-piece tokenizer shaped like a byte-level BPE vocab: single chars
    (incl. JSON structure), common subwords, quote/backslash-bearing pieces
    in realistic proportion (~3% of a real Qwen2 vocab)."""

    def __init__(self, v=152064, seed=0):
        rng = np.random.default_rng(seed)
        letters = string.ascii_letters + "  ''éü-_"
        pieces = [chr(b) for b in range(32, 127)] + ["\n", "\t", "\r"]
        structish = list('{}[]:,"\\') + ["{\"", "\":", "\", \"", "\"}", "\"]", "true", "false", "null"]
        pieces += structish
        while len(pieces) < v - 4000:
            n = int(rng.integers(2, 9))
            pieces.append("".join(letters[i] for i in rng.integers(0, len(letters), n)))
        while len(pieces) < v:  # quote/backslash-bearing tail
            n = int(rng.integers(1, 5))
            w = "".join(letters[i] for i in rng.integers(0, len(letters), n))
            pieces.append(('"' + w) if len(pieces) % 2 else (w + '\\"'))
        self.pieces = pieces[:v]
        self.all_special_ids = [v - 1]

    def __len__(self):
        return len(self.pieces)

    def decode(self, ids, **kw):
        return "".join(self.pieces[int(i)] for i in ids)


SCHEMA = {
    "type": "object",
    "properties": {
        "name": {"type": "string"},
        "age": {"type": "integer"},
        "tags": {"type": "array", "items": {"type": "string"}, "maxItems": 3},
    },
    "required": ["name", "age"],
}


def main():
    rng = np.random.default_rng(0)
    cfg = OmChatConfig.omchat_v2_13b().with_w8a8()
    params = bench._synth_params(cfg, rng)
    bench._sync(params["language_model"]["norm"]["scale"])
    engine = OmChatEngine(cfg, params)
    ids = [int(t) for t in rng.integers(2000, 20000, 128)]
    gen = GenerationConfig(max_new_tokens=NEW_TOKENS, eos_token_id=-1)

    engine.generate([ids], None, gen)  # compile
    t0 = time.perf_counter()
    out = engine.generate([ids], None, gen)
    base_s = time.perf_counter() - t0
    base_tps = len(out.token_ids[0]) / base_s
    bench._log(f"unconstrained: {base_tps:.1f} tok/s")

    tok = SynthTok()
    t0 = time.perf_counter()
    from omchat_tpu.runtime.json_schema import get_json_schema_mode

    mode = get_json_schema_mode(tok, SCHEMA)
    build_s = time.perf_counter() - t0
    bench._log(f"vocab tables + schema compile: {build_s:.2f}s")

    engine.generate([ids], None, gen, allowed_tokens_fn=mode.mask_fn())  # compile+memo warm
    t0 = time.perf_counter()
    out = engine.generate([ids], None, gen, allowed_tokens_fn=mode.mask_fn())
    guided_s = time.perf_counter() - t0
    n = max(1, len(out.token_ids[0]))
    guided_tps = n / guided_s
    text = tok.decode(out.token_ids[0])

    print(
        json.dumps(
            {
                "metric": "guided_decode_tokens_per_sec",
                "value": round(guided_tps, 2),
                "unit": "tokens/s",
                "extra": {
                    "unconstrained_tokens_per_sec": round(base_tps, 2),
                    "overhead_ms_per_token": round(guided_s * 1000 / n - base_s * 1000 / NEW_TOKENS, 2),
                    "table_build_s": round(build_s, 2),
                    "tokens_generated": n,
                    "valid_prefix": mode.advance(mode.START, text) is not None,
                    "vocab": len(tok),
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
