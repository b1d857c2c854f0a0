"""Training metrics sinks.

Stand-in for the reference's TensorboardLogger / Aim / wandb remnants
(multimodal_encoder/utils.py:189-210, omchat/utils.py:131-137 — the Aim
tracker URL is intentionally NOT carried forward, SURVEY.md §5): a
dependency-free JSONL writer plus an optional TensorBoard sink when a writer
implementation is importable."""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class JsonlMetricsWriter:
    """Append-only JSONL: one {step, ts, **metrics} object per line."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a", buffering=1)

    def update(self, step: int, **metrics):
        rec = {"step": int(step), "ts": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        self._f.close()


class TensorboardWriter:
    """Thin optional TB sink (tensorboardX or torch.utils.tensorboard)."""

    def __init__(self, log_dir: str):
        self._w = None
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            self._w = SummaryWriter(log_dir)
        except ImportError:
            try:
                from torch.utils.tensorboard import SummaryWriter  # type: ignore

                self._w = SummaryWriter(log_dir)
            except Exception:
                self._w = None

    @property
    def available(self) -> bool:
        return self._w is not None

    def update(self, step: int, **metrics):
        if self._w is None:
            return
        for k, v in metrics.items():
            self._w.add_scalar(k, float(v), int(step))

    def close(self):
        if self._w is not None:
            self._w.close()
