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


def test_process2_guess_mode_wiring(monkeypatch, rng):
    """The 2-LoRA path applies guess mode like the single-cond path
    (reference app:377-384): decayed 0.825**(taps-1-i) scales, uncond
    control dropped; strength feeds the scales in both modes."""
    from types import SimpleNamespace

    from ctrlora_tpu.apps.logic import AppState

    calls = {}

    class FakeModel:
        pipe = SimpleNamespace(n_control_taps=13)
        num_loras = 2

        def _sample_images(self, images, prompt, n_prompt, num_samples,
                           ddim_steps, scale, lora_weights, seed, eta=0.0,
                           guess_mode=False, control_scales=None):
            calls.update(guess_mode=guess_mode, control_scales=control_scales,
                         lora_weights=lora_weights)
            return [np.zeros((8, 8, 3), np.float32)]

    state = AppState()
    monkeypatch.setattr(state, "build_model", lambda *a, **k: FakeModel())
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8).astype(np.uint8)

    state.process2(img, img, "p", "n", 1, 2, 0.8, 7.5, 1, 0.0,
                   "sd", "cn", "l1", "l2", 1.0, 0.5, guess_mode=True)
    assert calls["guess_mode"] is True
    want = [0.8 * 0.825 ** float(12 - i) for i in range(13)]
    np.testing.assert_allclose(calls["control_scales"], want, rtol=1e-6)
    assert calls["lora_weights"] == (1.0, 0.5)

    state.process2(img, img, "p", "n", 1, 2, 0.8, 7.5, 1, 0.0,
                   "sd", "cn", "l1", "l2")
    assert calls["guess_mode"] is False
    np.testing.assert_allclose(calls["control_scales"], [0.8] * 13, rtol=1e-6)
