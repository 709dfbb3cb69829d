"""App-logic tests (gradio-free)."""

import numpy as np
import pytest

from ctrlora_tpu.apps.logic import (
    ADD_PROMPTS, DET_CHOICES, DET_PARAMS, NEG_PROMPTS, detect, reformat_prompt,
)


def test_prompt_presets_present():
    assert set(ADD_PROMPTS) == {"General-short", "General-long", "Realistic"}
    assert "General-human" in NEG_PROMPTS and "Painting" in NEG_PROMPTS
    assert len(DET_CHOICES) == 22


def test_reformat_prompt():
    assert reformat_prompt(" a ,  b,, c , ") == "a, b, c"
    assert reformat_prompt("") == ""


def test_detect_none_and_canny(rng):
    img = rng.integers(0, 255, (100, 140, 3), dtype=np.uint8).astype(np.uint8)
    out = detect("none", img, 512, 512)
    assert out.shape[0] % 64 == 0 and out.shape[1] % 64 == 0
    out = detect("canny", img, 256, 256)
    assert out.dtype == np.uint8 and out.ndim == 3
    out = detect("palette", img, 256, 256)
    assert out.shape == detect("none", img, 512, 256).shape


def test_detect_unknown_raises(rng):
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8).astype(np.uint8)
    with pytest.raises(KeyError):
        detect("not_a_detector", img)
