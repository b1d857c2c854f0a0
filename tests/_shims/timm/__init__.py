# Test-only shim: minimal `timm` surface so the reference torch model files
# (which import `timm.models.layers.DropPath` at module top) can be imported
# as golden-parity oracles.  Inference-mode DropPath is an identity.
