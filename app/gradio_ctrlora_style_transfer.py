#!/usr/bin/env python
"""Style-transfer Gradio UI (reference: app/gradio_ctrlora_style_transfer.py)
— CtrLoRA + IP-Adapter: condition image + style image + prompt, with the
three ip_scale target modes and optional img2img start."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ctrlora_tpu.utils.platform import ensure_platform_from_env

ensure_platform_from_env()

try:
    import gradio as gr
except ImportError as e:  # pragma: no cover
    raise SystemExit(
        "gradio is not installed; use ctrlora_tpu.style.StyleCtrLoRA directly."
    ) from e

import numpy as np

from ctrlora_tpu.annotators.util import HWC3
from ctrlora_tpu.apps.logic import DET_CHOICES, detect, reformat_prompt
from ctrlora_tpu.style import StyleCtrLoRA

CKPT_SD15_DIR = "./ckpts/sd15"
CKPT_BASECN_DIR = "./ckpts/ctrlora-basecn"
CKPT_LORA_DIR = "./ckpts/ctrlora-loras"
CKPT_IP_DIR = "./ckpts/ip-adapter"

_model = {"obj": None, "key": None}

TARGETS = {
    "Load original IP-Adapter": "all",
    "Load only style blocks": "style_blocks",
    "Load style+layout block": "style_layout",
}


def build(sd_ckpt, cn_ckpt, lora_ckpt, ip_ckpt, ip_scale, target):
    key = (sd_ckpt, cn_ckpt, lora_ckpt, ip_ckpt, float(ip_scale), target)
    if _model["key"] != key:
        m = StyleCtrLoRA(num_loras=1)
        m.create_model(
            os.path.join(CKPT_SD15_DIR, sd_ckpt),
            os.path.join(CKPT_BASECN_DIR, cn_ckpt),
            [os.path.join(CKPT_LORA_DIR, lora_ckpt)],
        )
        m.load_ip_adapter(
            os.path.join(CKPT_IP_DIR, ip_ckpt), ip_scale=float(ip_scale),
            target=TARGETS[target],
            image_encoder_ckpt=os.path.join(CKPT_IP_DIR, "image_encoder.bin")
            if os.path.exists(os.path.join(CKPT_IP_DIR, "image_encoder.bin"))
            else None,
        )
        _model.update(obj=m, key=key)
    return _model["obj"]


def ui_process(det, cond_image, style_image, prompt, n_prompt, num_samples,
               ddim_steps, scale, seed, sd_ckpt, cn_ckpt, lora_ckpt, ip_ckpt,
               ip_scale, target, img2img, img2img_strength):
    m = build(sd_ckpt, cn_ckpt, lora_ckpt, ip_ckpt, ip_scale, target)
    detected = detect(det, cond_image)
    style = HWC3(np.asarray(style_image, np.uint8))
    tokens = m.embed_style(style)
    results = m.sample_with_style(
        [detected], tokens, reformat_prompt(prompt), reformat_prompt(n_prompt),
        int(num_samples), int(ddim_steps), float(scale), seed=int(seed),
        img2img_image=HWC3(np.asarray(img2img, np.uint8)) if img2img is not None else None,
        img2img_strength=float(img2img_strength),
    )
    return [detected, style] + [np.asarray(r) for r in results]


def _list(d):
    return sorted(os.listdir(d)) if os.path.isdir(d) else []


def build_demo():
    with gr.Blocks() as demo:
        gr.Markdown("## CtrLoRA style transfer (TPU)")
        with gr.Row():
            with gr.Column():
                sd = gr.Dropdown(_list(CKPT_SD15_DIR), label="SD checkpoint")
                cn = gr.Dropdown(_list(CKPT_BASECN_DIR), label="Base ControlNet")
                lora = gr.Dropdown(_list(CKPT_LORA_DIR), label="LoRA")
                ip = gr.Dropdown(_list(CKPT_IP_DIR), label="IP-Adapter ckpt")
                target = gr.Dropdown(list(TARGETS), value="Load original IP-Adapter", label="IP target")
                ip_scale = gr.Slider(0.0, 2.0, value=1.0, label="IP scale")
                det = gr.Dropdown(DET_CHOICES, value="canny", label="Preprocessor")
                cond = gr.Image(label="Condition image")
                style = gr.Image(label="Style image")
                img2img = gr.Image(label="img2img start (optional)")
                i2i_strength = gr.Slider(0.0, 1.0, value=0.8, label="img2img strength")
            with gr.Column():
                prompt = gr.Textbox(label="Prompt")
                nprompt = gr.Textbox(label="Negative prompt")
                ns = gr.Slider(1, 8, value=1, step=1, label="Samples")
                steps = gr.Slider(1, 100, value=20, step=1, label="DDIM steps")
                scale = gr.Slider(0.1, 30.0, value=7.5, label="CFG scale")
                seed = gr.Slider(-1, 65535, value=-1, step=1, label="Seed")
                btn = gr.Button("Generate")
                gallery = gr.Gallery(label="Results")
        btn.click(
            ui_process,
            [det, cond, style, prompt, nprompt, ns, steps, scale, seed,
             sd, cn, lora, ip, ip_scale, target, img2img, i2i_strength],
            [gallery],
        )
    return demo


if __name__ == "__main__":
    build_demo().launch(server_name="0.0.0.0")
