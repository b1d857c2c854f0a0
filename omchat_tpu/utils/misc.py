"""Misc utilities mirroring the reference's omchat/utils.py surface."""

from __future__ import annotations

import os


def get_model_name_from_path(model_path: str) -> str:
    """Reference mm_utils.py:233-239: last path component, with checkpoint-N
    subdirs prefixed by their parent."""
    model_path = model_path.strip("/")
    parts = model_path.split("/")
    if parts[-1].startswith("checkpoint-"):
        return parts[-2] + "_" + parts[-1]
    return parts[-1]


def violates_moderation(text: str) -> bool:
    """Reference omchat/utils.py:102-125: OpenAI moderation check.

    Offline / keyless environments return False (allow), matching the
    reference's behavior on request failure."""
    api_key = os.environ.get("OPENAI_API_KEY")
    if not api_key:
        return False
    try:
        import json
        import urllib.request

        req = urllib.request.Request(
            "https://api.openai.com/v1/moderations",
            data=json.dumps({"input": text.replace("\n", "")}).encode(),
            headers={"Content-Type": "application/json", "Authorization": f"Bearer {api_key}"},
        )
        with urllib.request.urlopen(req, timeout=5) as resp:
            flagged = json.loads(resp.read())["results"][0]["flagged"]
        return bool(flagged)
    except Exception:
        return False


def enable_compilation_cache(directory: str = "~/.cache/omchat_tpu_xla") -> None:
    """Persist compiled XLA programs across processes — first-call latency for
    the big prefill/decode programs drops from tens of seconds to ~0 on
    subsequent runs."""
    import jax

    path = os.path.expanduser(directory)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
