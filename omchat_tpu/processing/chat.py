"""ChatML prompt construction and image-sentinel tokenization.

Bit-parity contract with the reference:

- :func:`tokenizer_image_token` — split on ``<image>`` (or indexed ``<image_N>``)
  and interleave ``-200`` sentinels (/root/reference/omchat/mm_utils.py:197-230).
- :func:`make_context` — ChatML assembly with hardcoded ``<|im_start|>``/``<|im_end|>``
  ids 151644/151645 and a 6144-token history budget filled newest-first
  (/root/reference/omchat/make_context.py:66-148).
- :func:`get_context` — the single-image prompt template
  ``"<image>\\npatch:<image>×(n−1)\\n{question}"`` (make_context.py:14-43); the
  reference's text-only branch crashes on an undefined name (make_context.py:37),
  fixed here.

Works with any tokenizer exposing ``encode(str) -> List[int]`` (HF tokenizers do).
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

from omchat_tpu.constants import (
    DEFAULT_IMAGE_TOKEN,
    IM_END_TOKEN_ID,
    IM_START_TOKEN_ID,
    IMAGE_TOKEN_INDEX,
    MAX_WINDOW_SIZE,
)

_INDEXED_IMAGE_RE = re.compile(r"<image_(\d+)>")


def _encode(tokenizer, text: str) -> List[int]:
    ids = tokenizer.encode(text)
    # Some tokenizers return objects with .ids
    return list(ids.ids) if hasattr(ids, "ids") else list(ids)


def tokenizer_image_token(
    prompt: str,
    tokenizer,
    image_token_index: int = IMAGE_TOKEN_INDEX,
) -> List[int]:
    """Tokenize ``prompt`` splicing ``image_token_index`` at each ``<image>``.

    Handles the indexed ``<image_N>`` form too (reference mm_utils.py:198-209:
    every indexed tag also maps to the single ``-200`` sentinel).
    """
    if "<image_0>" in prompt:
        prompt_chunks = re.split(r"<image_[0-9]+>", prompt)
        image_tags = _INDEXED_IMAGE_RE.findall(prompt)
        input_ids: List[int] = []
        for i, chunk in enumerate(prompt_chunks):
            input_ids.extend(_encode(tokenizer, chunk))
            if i < len(image_tags):
                input_ids.append(IMAGE_TOKEN_INDEX)
        return input_ids

    prompt_chunks = [_encode(tokenizer, chunk) for chunk in prompt.split(DEFAULT_IMAGE_TOKEN)]

    def insert_separator(X, sep):
        return [ele for sublist in zip(X, [sep] * len(X)) for ele in sublist][:-1]

    input_ids = []
    offset = 0
    bos = getattr(tokenizer, "bos_token_id", None)
    if len(prompt_chunks) > 0 and len(prompt_chunks[0]) > 0 and bos is not None and prompt_chunks[0][0] == bos:
        offset = 1
        input_ids.append(prompt_chunks[0][0])

    for x in insert_separator(prompt_chunks, [image_token_index] * (offset + 1)):
        input_ids.extend(x[offset:])
    return input_ids


def make_context(
    tokenizer,
    query: str,
    history: Optional[List[Tuple[str, str]]] = None,
    system: str = "",
    max_window_size: int = MAX_WINDOW_SIZE,
    chat_format: str = "chatml",
) -> Tuple[str, List[int]]:
    """Build the ChatML prompt → ``(raw_text, context_tokens)``.

    Token-stream parity with reference make_context.py:66-148, including the
    newest-first history fill under the ``max_window_size`` budget and the
    hardcoded im_start/im_end ids.
    """
    if history is None:
        history = []

    if chat_format == "raw":
        return query, _encode(tokenizer, query)
    if chat_format != "chatml":
        raise NotImplementedError(f"Unknown chat format {chat_format!r}")

    im_start, im_end = "<|im_start|>", "<|im_end|>"
    im_start_tokens = [IM_START_TOKEN_ID]
    im_end_tokens = [IM_END_TOKEN_ID]
    nl_tokens = _encode(tokenizer, "\n")

    def _tokenize_str(role: str, content: str) -> Tuple[str, List[int]]:
        if DEFAULT_IMAGE_TOKEN in content:
            body = tokenizer_image_token(content, tokenizer, IMAGE_TOKEN_INDEX)
        else:
            body = _encode(tokenizer, content)
        return f"{role}\n{content}", _encode(tokenizer, role) + nl_tokens + body

    system_text, system_tokens_part = _tokenize_str("system", system)
    system_tokens = im_start_tokens + system_tokens_part + im_end_tokens

    raw_text = ""
    context_tokens: List[int] = []

    for turn_query, turn_response in reversed(history):
        query_text, query_tokens_part = _tokenize_str("user", turn_query)
        query_tokens = im_start_tokens + query_tokens_part + im_end_tokens
        response_text, response_tokens_part = _tokenize_str("assistant", turn_response)
        response_tokens = im_start_tokens + response_tokens_part + im_end_tokens

        next_context_tokens = nl_tokens + query_tokens + nl_tokens + response_tokens
        prev_chat = f"\n{im_start}{query_text}{im_end}\n{im_start}{response_text}{im_end}"

        current_context_size = len(system_tokens) + len(next_context_tokens) + len(context_tokens)
        if current_context_size < max_window_size:
            context_tokens = next_context_tokens + context_tokens
            raw_text = prev_chat + raw_text
        else:
            break

    context_tokens = system_tokens + context_tokens
    raw_text = f"{im_start}{system_text}{im_end}" + raw_text
    context_tokens += (
        nl_tokens
        + im_start_tokens
        + _tokenize_str("user", query)[1]
        + im_end_tokens
        + nl_tokens
        + im_start_tokens
        + _encode(tokenizer, "assistant")
        + nl_tokens
    )
    raw_text += f"\n{im_start}user\n{query}{im_end}\n{im_start}assistant\n"

    return raw_text, context_tokens


def image_prompt(text: str, num_patches: int) -> str:
    """The single-image prompt body: ``<image>`` + (n−1) ``patch:<image>`` lines.

    Reference: make_context.py:30, processing_omchat.py:230-235.
    """
    return (
        DEFAULT_IMAGE_TOKEN
        + "\n"
        + "\n".join(["patch:" + DEFAULT_IMAGE_TOKEN] * (num_patches - 1))
        + "\n"
        + text.replace(DEFAULT_IMAGE_TOKEN, "").strip()
    )


def interleave_image_prompt(text: str, num_patches_list: Sequence[int]) -> str:
    """Multi-image interleave: per-image tile expansion at each ``<image>``.

    Reference: processing_omchat.py:237-244.
    """
    texts = text.split(DEFAULT_IMAGE_TOKEN)
    final = texts[0]
    for i, n in enumerate(num_patches_list):
        final += DEFAULT_IMAGE_TOKEN + "\n" + "\n".join(["patch:" + DEFAULT_IMAGE_TOKEN] * (n - 1))
        if i + 1 < len(texts):
            final += texts[i + 1]
    return final.strip()


def get_context(
    text: str,
    tokenizer,
    initial_prompt: str = "You are a helpful assistant.",
    image=None,
    grid_pinpoints=None,
    tile_size: int = 448,
):
    """Single-shot context builder → ``(raw_text, context_tokens, image_tiles)``.

    Behavioral equivalent of reference make_context.py:14-43 (with its text-only
    NameError fixed).  ``image_tiles`` is a float32 ``[N, 3, tile, tile]`` numpy
    array or None.
    """
    from omchat_tpu.constants import DEFAULT_GRID_PINPOINTS
    from omchat_tpu.processing.image_processor import process_anyres_image

    if image is not None:
        tiles = process_anyres_image(
            image, grid_pinpoints if grid_pinpoints is not None else DEFAULT_GRID_PINPOINTS, tile_size
        )
        n = tiles.shape[0]
        inp, context_tokens = make_context(tokenizer, image_prompt(text, n), None, initial_prompt)
        return inp, context_tokens, tiles

    inp, context_tokens = make_context(
        tokenizer, text.replace(DEFAULT_IMAGE_TOKEN, "").strip(), None, initial_prompt
    )
    return inp, context_tokens, None
