"""Lineart annotator parity vs the reference torch generators."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_shim import install_shims, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree or torch unavailable"
)

from ctrlora_tpu.annotators.lineart import (  # noqa: E402
    AnimeUNet, LineartGenerator, convert_anime_unet, convert_lineart,
)


def test_lineart_generator_parity():
    install_shims()
    import torch
    from annotator.lineart import Generator

    torch.manual_seed(0)
    ref = Generator(3, 1, 3).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    tree = jax.tree_util.tree_map(jnp.asarray, convert_lineart(sd))

    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64), np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = LineartGenerator(n_blocks=3).apply(
        tree, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        want.transpose(0, 2, 3, 1), np.asarray(got), atol=3e-5, rtol=1e-3
    )


@pytest.mark.slow  # mid-weight parity: fast-lane budget (VERDICT r4 #7)
def test_anime_unet_parity():
    install_shims()
    import functools

    import torch
    import torch.nn as nn
    from annotator.lineart_anime import UnetGenerator

    torch.manual_seed(1)
    norm_layer = functools.partial(
        nn.InstanceNorm2d, affine=False, track_running_stats=False
    )
    ref = UnetGenerator(3, 1, 8, 64, norm_layer=norm_layer, use_dropout=False).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    tree = jax.tree_util.tree_map(jnp.asarray, convert_anime_unet(sd))

    x = np.random.default_rng(1).standard_normal((1, 3, 256, 256), np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = AnimeUNet().apply(tree, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        want.transpose(0, 2, 3, 1), np.asarray(got), atol=1e-4, rtol=1e-3
    )


@pytest.mark.slow
def test_lineart_detectors_contract(rng):
    from ctrlora_tpu.annotators import registry

    img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8).astype(np.uint8)
    out = registry.get("lineart")(img, coarse=False)
    assert out.shape == (96, 128) and out.dtype == np.uint8
    out = registry.get("lineart_anime")(img)
    assert out.shape == (96, 128) and out.dtype == np.uint8
    out = registry.get("lineart_anime_with_color_prompt")(
        img, rng=np.random.default_rng(0)
    )
    assert out.shape == (96, 128, 3) and out.dtype == np.uint8
