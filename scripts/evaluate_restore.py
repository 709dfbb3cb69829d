#!/usr/bin/env python
"""Restoration evaluation (reference: scripts/evaluate_restore.py):
compare samples directly against ground-truth images (inpainting /
outpainting style tasks) via MSE / LPIPS / PSNR / SSIM + CLIPScore of each
sample against its prompt (reference lines 66-85). LPIPS/CLIPScore print
when their pretrained checkpoints are provided.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ctrlora_tpu.utils.platform import ensure_platform_from_env

ensure_platform_from_env()

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sample_dir", required=True)
    p.add_argument("--bs", type=int, default=64)
    p.add_argument("--lpips_ckpt", default=None, help="VGG16+lin-head weights")
    p.add_argument("--clip_ckpt", default=None, help="HF CLIPModel state dict")
    args = p.parse_args()

    from ctrlora_tpu.annotators.util import HWC3, resize_image
    from ctrlora_tpu.data.datasets import imread_rgb
    from ctrlora_tpu.evaluation import MetricAccumulator, load_eval_models

    sample_dir = os.path.join(args.sample_dir, "sample")
    img_dir = os.path.join(args.sample_dir, "img")
    names = sorted(os.listdir(sample_dir))
    print("Dataset size:", len(names))

    prompts = {}
    prompt_file = os.path.join(args.sample_dir, "prompt.txt")
    if os.path.exists(prompt_file):
        with open(prompt_file) as f:
            prompts = {str(i): line.rstrip("\n") for i, line in enumerate(f)}

    lpips_params, scorer = load_eval_models(args.lpips_ckpt, args.clip_ckpt)
    acc = MetricAccumulator(lpips_params=lpips_params, clip_scorer=scorer)
    batch_s, batch_g, batch_u8, batch_p = [], [], [], []

    def flush():
        samples = np.stack(batch_u8) if scorer is not None and batch_p else None
        acc.update(
            np.stack(batch_s), np.stack(batch_g),
            sample=samples, prompts=batch_p or None,
        )
        batch_s.clear(), batch_g.clear(), batch_u8.clear(), batch_p.clear()

    for name in names:
        raw = imread_rgb(os.path.join(sample_dir, name))
        s = raw.astype(np.float32) / 255.0
        g = imread_rgb(os.path.join(img_dir, name))
        g = resize_image(HWC3(g), 512).astype(np.float32) / 255.0
        if s.shape != g.shape:
            s = resize_image(HWC3(raw), 512).astype(np.float32) / 255.0
        batch_s.append(s)
        batch_g.append(g)
        stem = os.path.splitext(name)[0]
        if scorer is not None and stem in prompts:
            batch_u8.append(raw)
            batch_p.append(prompts[stem])
        if len(batch_s) >= args.bs:
            flush()
    if batch_s:
        flush()

    for k, v in acc.compute().items():
        print(f"{k.upper()}: {v:.4f}")


if __name__ == "__main__":
    main()
