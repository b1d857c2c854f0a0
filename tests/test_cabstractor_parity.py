"""CAbstractor parity: JAX vs the reference honeybee module (fp32 CPU).

The reference honeybee.py builds its conv stages through timm's RegStage;
timm is not installable offline, so tests/_shims/timm/models/regnet.py
reimplements the timm==0.9.11 RegStage/Bottleneck configuration honeybee
uses.  The oracle therefore pins our JAX CAbstractor to the reference's
*module graph* (pos-emb → RegStage → pool → RegStage → MLP readout) with
timm-faithful block semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omchat_tpu.config import ProjectorConfig
from omchat_tpu.models.cabstractor import (
    cabstractor_forward,
    convert_honeybee_state_dict,
    init_params,
)


@pytest.fixture(scope="module")
def ref_cabstractor(reference_path):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_honeybee", f"{reference_path}/omchat/model/multimodal_projector/honeybee.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.CAbstractor


@pytest.mark.parametrize("n_query,L", [(16, 64), (4, 64)])
def test_cabstractor_matches_reference(ref_cabstractor, rng, n_query, L):
    import torch

    torch.manual_seed(0)
    enc_hidden, out_hidden, hidden, depth = 48, 40, 32, 3
    ref = ref_cabstractor(
        num_input_tokens=L,
        encoder_hidden_size=enc_hidden,
        output_hidden_size=out_hidden,
        hidden_size=hidden,
        depth=depth,
        mlp_depth=2,
        num_queries=n_query,
    ).eval().float()
    # non-trivial norms/biases so parity is structural, not identity-trivial
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(torch.randn_like(p) * 0.02)

    x = rng.standard_normal((2, L, enc_hidden)).astype(np.float32)
    with torch.no_grad():
        # honeybee.py:137 does `x += self.pos_emb` IN PLACE, mutating the
        # caller's tensor — copy so the JAX input stays pristine.
        want = ref(torch.from_numpy(x.copy())).numpy()

    cfg = ProjectorConfig(projector_type="cabstract", n_query=n_query, depth=depth, mlp_depth=2)
    params = convert_honeybee_state_dict(ref.state_dict(), cfg)
    got = np.asarray(cabstractor_forward(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_cabstractor_init_matches_converted_structure(rng, reference_path):
    """init_params produces the same pytree structure the converter emits."""
    cfg = ProjectorConfig(projector_type="cabstract", n_query=16, depth=2, mlp_depth=2)
    params = init_params(jax.random.PRNGKey(0), cfg, mm_hidden=48, out_hidden=40,
                         hidden=32, num_input_tokens=64)
    out = cabstractor_forward(params, cfg, jnp.asarray(rng.standard_normal((1, 64, 48)).astype(np.float32)))
    assert out.shape == (1, 16, 40)
    assert np.isfinite(np.asarray(out)).all()
