"""MLSD parity vs the reference torch model (random folded weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_shim import install_shims, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree or torch unavailable"
)


@pytest.mark.slow  # mid-weight parity: fast-lane budget (VERDICT r4 #7)
def test_mlsd_parity():
    install_shims()
    import torch
    from annotator.mlsd.models.mbv2_mlsd_large import MobileV2_MLSD_Large

    from ctrlora_tpu.annotators.mlsd import MobileV2MLSDLarge, convert_mlsd

    torch.manual_seed(0)
    ref = MobileV2_MLSD_Large().eval()
    # randomize BN running stats so folding is non-trivial
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    tree = jax.tree_util.tree_map(jnp.asarray, convert_mlsd(sd))

    x = np.random.default_rng(0).standard_normal((1, 4, 64, 64), np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = MobileV2MLSDLarge().apply(tree, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        want.transpose(0, 2, 3, 1), np.asarray(got), atol=5e-4, rtol=2e-3
    )


@pytest.mark.slow
def test_mlsd_detector_contract(rng):
    from ctrlora_tpu.annotators.mlsd import MLSDdetector

    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8).astype(np.uint8)
    out = MLSDdetector()(img, 0.1, 0.1)
    assert out.shape == (64, 64) and out.dtype == np.uint8
