#!/usr/bin/env python
"""Vanilla ControlNet demo UI (reference: app/gradio_controlnet.py) — the
image-hint ControlNet (cldm_v15 config) without LoRA."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ctrlora_tpu.utils.platform import ensure_platform_from_env

ensure_platform_from_env()

try:
    import gradio as gr
except ImportError as e:  # pragma: no cover
    raise SystemExit(
        "gradio is not installed; use the library directly (see README)."
    ) from e

import numpy as np

from ctrlora_tpu.annotators.util import HWC3
from ctrlora_tpu.apps.logic import DET_CHOICES, detect, reformat_prompt

CKPT_DIR = "./ckpts/controlnet"

_cache = {"key": None, "pipe": None, "params": None}


def _build(ckpt):
    import jax

    from ctrlora_tpu.configs import sd15_config
    from ctrlora_tpu.pipeline import CtrLoraPipeline
    from ctrlora_tpu.utils.loading import load_ctrlora

    if _cache["key"] != ckpt:
        pipe = CtrLoraPipeline(sd15_config())
        params = load_ctrlora(pipe, os.path.join(CKPT_DIR, ckpt), None)
        # a combined ControlNet ckpt carries control_model.* too
        from ctrlora_tpu.utils import ckpt_torch as bridge
        from ctrlora_tpu.utils.loading import load_basecn_into

        np_params = {
            "unet": bridge.tree_to_mutable(params.unet),
            "control": bridge.tree_to_mutable(params.control),
            "vae": bridge.tree_to_mutable(params.vae),
            "clip": bridge.tree_to_mutable(params.clip),
        }
        load_basecn_into(
            pipe, np_params, bridge.load_torch_state_dict(os.path.join(CKPT_DIR, ckpt)),
            skip="lora",
        )
        import jax.numpy as jnp

        from ctrlora_tpu.pipeline import Params

        params = Params(*(jax.tree_util.tree_map(jnp.asarray, np_params[k])
                          for k in ("unet", "control", "vae", "clip")))
        _cache.update(key=ckpt, pipe=pipe, params=params)
    return _cache["pipe"], _cache["params"]


def ui_process(det, image, prompt, n_prompt, num_samples, ddim_steps, strength,
               scale, seed, ckpt):
    import jax
    import jax.numpy as jnp

    from ctrlora_tpu.pipeline import Conditioning
    from ctrlora_tpu.sampling.ddim import DDIMConfig, ddim_sample
    from ctrlora_tpu.utils.tokenizer import default_tokenizer

    pipe, params = _build(ckpt)
    detected = detect(det, image)
    B = int(num_samples)
    hint = jnp.repeat(jnp.asarray(detected.astype(np.float32) / 255.0)[None], B, 0)
    tok = default_tokenizer()
    ctx = pipe.encode_text_tokens(params, jnp.asarray(np.repeat(tok([reformat_prompt(prompt)]), B, 0)))
    unc = pipe.encode_text_tokens(params, jnp.asarray(np.repeat(tok([reformat_prompt(n_prompt)]), B, 0)))
    H, W = detected.shape[:2]
    taps = pipe.n_control_taps
    z = ddim_sample(
        pipe, params, jax.random.PRNGKey(int(seed) if seed != -1 else 0),
        ctx, unc, [Conditioning(hint)], (B, H // 8, W // 8, 4),
        DDIMConfig(steps=int(ddim_steps), guidance_scale=float(scale)),
        control_scales=jnp.full((taps,), float(strength)),
    )
    img = pipe.decode_first_stage(params, z)
    out = np.asarray(jnp.clip(img * 127.5 + 127.5, 0, 255)).astype(np.uint8)
    return [detected] + [out[i] for i in range(B)]


def build_demo():
    with gr.Blocks() as demo:
        gr.Markdown("## Vanilla ControlNet (TPU)")
        with gr.Row():
            with gr.Column():
                ckpt = gr.Dropdown(
                    sorted(os.listdir(CKPT_DIR)) if os.path.isdir(CKPT_DIR) else [],
                    label="ControlNet checkpoint",
                )
                det = gr.Dropdown(DET_CHOICES, value="canny", label="Preprocessor")
                image = gr.Image(label="Input image")
            with gr.Column():
                prompt = gr.Textbox(label="Prompt")
                nprompt = gr.Textbox(label="Negative prompt")
                ns = gr.Slider(1, 8, value=1, step=1, label="Samples")
                steps = gr.Slider(1, 100, value=20, step=1, label="DDIM steps")
                strength = gr.Slider(0.0, 2.0, value=1.0, label="Control strength")
                scale = gr.Slider(0.1, 30.0, value=7.5, label="CFG scale")
                seed = gr.Slider(-1, 65535, value=-1, step=1, label="Seed")
                btn = gr.Button("Generate")
                gallery = gr.Gallery(label="Results")
        btn.click(
            ui_process,
            [det, image, prompt, nprompt, ns, steps, strength, scale, seed, ckpt],
            [gallery],
        )
    return demo


if __name__ == "__main__":
    build_demo().launch(server_name="0.0.0.0")
