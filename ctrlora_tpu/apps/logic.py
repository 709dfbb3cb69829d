"""Gradio-free app logic (reference: app/gradio_ctrlora.py minus the UI).

Holds the preprocessor dispatch with per-detector default params, the lazy
model cache keyed on checkpoint paths, the prompt preset library, and the
single-/dual-condition process functions. The gradio files in app/ are thin
wrappers over these.
"""

from __future__ import annotations

import random
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ctrlora_tpu.annotators import registry
from ctrlora_tpu.annotators.util import HWC3, resize_image

DET_CHOICES = [
    "none", "canny", "hed", "seg", "depth", "normal", "openpose", "hedsketch",
    "grayscale", "blur", "pad", "bbox",
    "lineart", "lineart_coarse", "lineart_anime", "shuffle", "mlsd",
    "palette", "pixel", "illusion", "densepose", "lineart_anime_with_color_prompt",
]

ADD_PROMPTS = {
    "General-short": "masterpiece, best quality",
    "General-long": "masterpiece, best quality, high quality, award winning, award-winning",
    "Realistic": "RAW photo, 8K UHD, DSLR, film grain, highres, high resolution, high detail, extremely detailed, soft lighting, award winning photography",
}

NEG_PROMPTS = {
    "General-short": "worst quality, low quality, NSFW",
    "General-long": "worst quality, low quality, bad quality, normal quality, lowres, low resolution, JPEG artifacts, blurry, bad composition, cropped, mutilated, out of frame, duplicate, multiple views, multiple_views, tiling, ugly, morbid, distorted, disgusting, watermark, signature, NSFW",
    "General-human": "bad anatomy, wrong anatomy, bad proportions, gross proportions, deformed, deformed iris, deformed pupils, inaccurate eyes, cross-eye, cloned face, bad hands, mutation, mutated hands, mutation hands, mutated fingers, mutation fingers, fused fingers, too many fingers, extra fingers, extra digit, missing fingers, fewer digits, malformed limbs, inaccurate limb, extra limbs, missing limbs, floating limbs, disconnected limbs, extra arms, extra legs, missing arms, missing legs, error, bad legs, error legs, bad feet, long neck, disfigured, amputation, dehydrated, nude, thighs, cleavage",
    "Realistic": "semi-realistic, CGI, 3D, render, sketch, drawing, comic, cartoon, anime, vector art",
    "2.5D": "sketch, drawing, comic, cartoon, anime, vector art",
    "Painting": "photorealistic, CGI, 3D, render",
}

# per-detector default params (reference detect() dispatch,
# app/gradio_ctrlora.py:137-259)
DET_PARAMS = {
    "canny": dict(low_threshold=100, high_threshold=200),
    "blur": dict(ksize=51),
    "pad": dict(top_ratio=0.25, bottom_ratio=0.25, left_ratio=0.25, right_ratio=0.25),
    "jpeg": dict(jpeg_quality=10),
    "inpainting": dict(rand_h=40, rand_h_1=40, rand_w=40, rand_w_1=40),
    "outpainting": dict(rand_h=60, rand_w=60),
    "lineart": dict(coarse=False),
    "lineart_coarse": dict(coarse=True),
}

_DET_ALIAS = {"lineart_coarse": "lineart"}


def detect(det: str, input_image: np.ndarray, detect_resolution: int = 512,
           image_resolution: int = 512) -> np.ndarray:
    """Run a preprocessor and resize to the generation resolution
    (reference detect(), app/gradio_ctrlora.py:137-259)."""
    input_image = HWC3(np.asarray(input_image, np.uint8))
    if det == "none":
        return resize_image(input_image, image_resolution)
    name = _DET_ALIAS.get(det, det)
    detector = registry.get(name)
    params = DET_PARAMS.get(det, {})
    resized = resize_image(input_image, detect_resolution)
    out = detector(resized, **params)
    out = HWC3(np.asarray(out, np.uint8))
    return resize_image(out, image_resolution)


def reformat_prompt(prompt: str) -> str:
    return ", ".join([p.strip() for p in prompt.split(",") if p.strip()])


class AppState:
    """Lazy model cache keyed on (lora_num, ckpt tuple) (reference
    build_model, app/gradio_ctrlora.py:112-134)."""

    def __init__(self):
        self._model = None
        self._key = None

    def build_model(self, sd_ckpt: str, cn_ckpt: str, lora_ckpts: Sequence[str]):
        from ctrlora_tpu.api import CtrLoRA

        key = (len(lora_ckpts), sd_ckpt, cn_ckpt, tuple(lora_ckpts))
        if key != self._key:
            model = CtrLoRA(num_loras=len(lora_ckpts))
            model.create_model(sd_ckpt, cn_ckpt, lora_ckpts)
            self._model = model
            self._key = key
        return self._model

    def process(
        self, det: str, detected_image: np.ndarray, prompt: str, n_prompt: str,
        num_samples: int, ddim_steps: int, guess_mode: bool, strength: float,
        scale: float, seed: int, eta: float,
        sd_ckpt: str, cn_ckpt: str, lora_ckpt: str,
    ) -> List[np.ndarray]:
        import jax.numpy as jnp

        model = self.build_model(sd_ckpt, cn_ckpt, [lora_ckpt])
        if seed == -1:
            seed = random.randint(0, 65535)
        prompt, n_prompt = reformat_prompt(prompt), reformat_prompt(n_prompt)
        detected_image = HWC3(np.asarray(detected_image, np.uint8))
        # guess-mode scale decay (app:313): strength * 0.825**(12-i)
        taps = model.pipe.n_control_taps
        if guess_mode:
            scales = [strength * (0.825 ** float(taps - 1 - i)) for i in range(taps)]
        else:
            scales = [strength] * taps
        results = model._sample_images(
            [detected_image], prompt, n_prompt, num_samples, ddim_steps, scale,
            (1.0,), seed, eta=eta, guess_mode=guess_mode, control_scales=scales,
        )
        return [detected_image] + [np.asarray(r) for r in results]

    def process2(
        self, detected_image: np.ndarray, detected_image2: np.ndarray,
        prompt: str, n_prompt: str, num_samples: int, ddim_steps: int,
        strength: float, scale: float, seed: int, eta: float,
        sd_ckpt: str, cn_ckpt: str, lora_ckpt: str, lora2_ckpt: str,
        lora_weight: float = 1.0, lora2_weight: float = 1.0,
        guess_mode: bool = False,
    ) -> List[np.ndarray]:
        from ctrlora_tpu.api import center_crop_to_common

        model = self.build_model(sd_ckpt, cn_ckpt, [lora_ckpt, lora2_ckpt])
        if seed == -1:
            seed = random.randint(0, 65535)
        a = HWC3(np.asarray(detected_image, np.uint8))
        b = HWC3(np.asarray(detected_image2, np.uint8))
        a, b = center_crop_to_common(a, b)
        # guess mode applies the same decayed scales in the 2-LoRA path
        # (reference app:377-384: un_cond drops c_concat, scales decay)
        taps = model.pipe.n_control_taps
        if guess_mode:
            scales = [strength * (0.825 ** float(taps - 1 - i)) for i in range(taps)]
        else:
            scales = [strength] * taps
        results = model._sample_images(
            [a, b], reformat_prompt(prompt), reformat_prompt(n_prompt),
            num_samples, ddim_steps, scale, (lora_weight, lora2_weight), seed,
            eta=eta, guess_mode=guess_mode, control_scales=scales,
        )
        return [a, b] + [np.asarray(r) for r in results]
