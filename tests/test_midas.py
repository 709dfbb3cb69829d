"""MiDaS DPT-Large parity vs the reference (timm backbone shimmed with a
structurally-faithful minimal ViT)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_shim import install_shims, reference_available

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not reference_available(), reason="reference tree or torch unavailable"
)]


def test_dpt_parity():
    install_shims()
    import torch
    from annotator.midas.midas.dpt_depth import DPTDepthModel

    from ctrlora_tpu.annotators.midas import convert_dpt, dpt_forward

    torch.manual_seed(0)
    ref = DPTDepthModel(backbone="vitl16_384", non_negative=True).eval()
    # tame random weights so the 24-layer stack doesn't explode numerically
    with torch.no_grad():
        for p in ref.parameters():
            p.mul_(0.2)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray, convert_dpt(sd))

    x = np.random.default_rng(0).standard_normal((1, 3, 384, 384), np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()  # [1, 384, 384]
    got = dpt_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert got.shape == (1, 384, 384)
    np.testing.assert_allclose(
        want, np.asarray(got),
        atol=1e-3 * max(1.0, np.abs(want).max()), rtol=3e-3,
    )


def test_dpt_parity_nonsquare_resized_posembed():
    install_shims()
    import torch
    from annotator.midas.midas.dpt_depth import DPTDepthModel

    from ctrlora_tpu.annotators.midas import convert_dpt, dpt_forward

    torch.manual_seed(1)
    ref = DPTDepthModel(backbone="vitl16_384", non_negative=True).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.mul_(0.2)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray, convert_dpt(sd))
    x = np.random.default_rng(1).standard_normal((1, 3, 256, 320), np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = dpt_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        want, np.asarray(got),
        atol=2e-3 * max(1.0, np.abs(want).max()), rtol=5e-3,
    )


def test_midas_detector_contract(rng):
    from ctrlora_tpu.annotators.midas import MidasDetector

    img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8).astype(np.uint8)
    det = MidasDetector()  # random weights
    depth, normal = det(img)
    assert depth.shape == (64, 96) and depth.dtype == np.uint8
    assert normal.shape == (64, 96, 3) and normal.dtype == np.uint8
