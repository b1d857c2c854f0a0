"""Tracing / profiling utilities.

The reference has none in live code (SURVEY.md §5); this supplies the
TPU-native observability layer: ``jax.profiler`` trace annotations around the
encode/prefill/decode stages and TTFT / tokens-per-second counters.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace_span(name: str, spans: Optional[Dict[str, float]] = None):
    """jax.profiler annotation; pass ``spans`` to also record the wall-clock
    duration (seconds) under ``name``."""
    with jax.profiler.TraceAnnotation(name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if spans is not None:
                spans[name] = spans.get(name, 0.0) + time.perf_counter() - t0


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a device profile (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class DecodeStats:
    """TTFT + decode-rate counters for one generation call."""

    start: float = field(default_factory=time.perf_counter)
    first_token_at: Optional[float] = None
    tokens: int = 0
    end: Optional[float] = None

    def on_token(self):
        now = time.perf_counter()
        if self.first_token_at is None:
            self.first_token_at = now
        self.tokens += 1
        self.end = now

    @property
    def ttft_ms(self) -> Optional[float]:
        if self.first_token_at is None:
            return None
        return (self.first_token_at - self.start) * 1000

    @property
    def tokens_per_sec(self) -> Optional[float]:
        if self.end is None or self.first_token_at is None or self.tokens < 2:
            return None
        return (self.tokens - 1) / (self.end - self.first_token_at)

    def summary(self) -> Dict:
        return {
            "ttft_ms": round(self.ttft_ms, 2) if self.ttft_ms is not None else None,
            "decode_tokens_per_sec": round(self.tokens_per_sec, 2) if self.tokens_per_sec else None,
            "tokens": self.tokens,
        }
