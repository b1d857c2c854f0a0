"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so pjit/shard_map shardings and
collectives can be exercised without a TPU pod (the TPU-native substitute for
distributed tests — SURVEY.md §4).  Env vars must be set before jax imports.
"""

import os
import sys

# The ambient environment presets JAX_PLATFORMS=axon (the tunneled TPU); tests
# must run on CPU with virtual devices, so force-override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = "/root/reference"

sys.path.insert(0, REPO_ROOT)
# Test-only shims (e.g. a minimal `timm` so the reference torch model can be
# imported as a golden-parity oracle).
sys.path.insert(0, os.path.join(REPO_ROOT, "tests", "_shims"))

import jax

# The container's sitecustomize.py registers the axon TPU plugin and sets
# jax.config.jax_platforms="axon,cpu" in-process, which overrides the env var —
# override it back before any backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

@pytest.fixture(scope="session")
def reference_path():
    """Path to the read-only reference checkout; adds it to sys.path on use."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return REFERENCE_ROOT


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


class MockTokenizer:
    """Deterministic byte-level tokenizer implementing the subset of the HF
    tokenizer API the prompt code touches: ``encode``, ``__call__().input_ids``,
    ``decode``, ``bos_token_id``.  Ids are byte values (0-255), far below the
    hardcoded ChatML ids, so sentinel/special-id placement is unambiguous."""

    bos_token_id = None
    eos_token_id = 151645

    def encode(self, text):
        return list(text.encode("utf-8"))

    def __call__(self, text):
        class _Out:
            def __init__(self, ids):
                self.input_ids = ids

        return _Out(self.encode(text))

    all_special_ids = ()

    def __len__(self):
        return 256

    def decode(self, ids, **kw):
        return bytes(int(i) for i in ids if 0 <= int(i) < 256).decode("utf-8", errors="replace")

    def batch_decode(self, seqs, **kw):
        return [self.decode(s) for s in seqs]


@pytest.fixture(scope="session")
def mock_tokenizer():
    return MockTokenizer()
