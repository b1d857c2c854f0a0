"""Import-only shim: reference honeybee.py imports RegStage at module top.

The real timm RegStage is NOT reproduced here; tests that need a CAbstractor
oracle must skip (no timm in this environment)."""


class RegStage:  # pragma: no cover - import-time placeholder
    def __init__(self, *a, **k):
        raise NotImplementedError("timm shim: RegStage is import-only")
