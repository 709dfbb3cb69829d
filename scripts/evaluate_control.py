#!/usr/bin/env python
"""Controllability evaluation (reference: scripts/evaluate_control.py):
re-detect the condition from each sample and compare with the ground-truth
condition map via MSE / LPIPS / PSNR / SSIM, plus CLIPScore of each sample
against its prompt (reference lines 65-69).

  python scripts/evaluate_control.py --sample_dir out --detector canny \
      [--lpips_ckpt vgg_lpips.pth] [--clip_ckpt clip-vit-large-patch14.ckpt]

LPIPS and CLIPScore need pretrained weights (zero-egress hosts can't fetch
them), so they print only when the checkpoints are provided.
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
    p.add_argument("--detector", required=True)
    p.add_argument("--bs", type=int, default=64)
    p.add_argument("--lpips_ckpt", default=None, help="VGG16+lin-head weights")
    p.add_argument("--clip_ckpt", default=None, help="HF CLIPModel state dict")
    args = p.parse_args()

    from functools import partial

    from ctrlora_tpu.annotators import registry
    from ctrlora_tpu.annotators.util import HWC3, resize_image
    from ctrlora_tpu.data.datasets import imread_rgb
    from ctrlora_tpu.evaluation import MetricAccumulator, load_eval_models

    det = registry.get(args.detector)
    if args.detector == "canny":
        det = partial(det, low_threshold=100, high_threshold=200)

    sample_dir = os.path.join(args.sample_dir, "sample")
    control_dir = os.path.join(args.sample_dir, "control")
    names = sorted(os.listdir(sample_dir))
    print("Dataset size:", len(names))

    prompts = {}
    prompt_file = os.path.join(args.sample_dir, "prompt.txt")
    if os.path.exists(prompt_file):
        with open(prompt_file) as f:
            prompts = {str(i): line.rstrip("\n") for i, line in enumerate(f)}

    lpips_params, scorer = load_eval_models(args.lpips_ckpt, args.clip_ckpt)
    acc = MetricAccumulator(lpips_params=lpips_params, clip_scorer=scorer)
    batch_c, batch_g, batch_s, batch_p = [], [], [], []

    def flush():
        samples = np.stack(batch_s) if scorer is not None and batch_p else None
        acc.update(
            np.stack(batch_c), np.stack(batch_g),
            sample=samples, prompts=batch_p or None,
        )
        batch_c.clear(), batch_g.clear(), batch_s.clear(), batch_p.clear()

    for name in names:
        sample = imread_rgb(os.path.join(sample_dir, name))
        gt = imread_rgb(os.path.join(control_dir, name))
        gt = resize_image(HWC3(gt), 512).astype(np.float32) / 255.0
        c = det(sample)
        c = resize_image(HWC3(np.asarray(c, np.uint8)), 512).astype(np.float32) / 255.0
        batch_c.append(c)
        batch_g.append(gt)
        stem = os.path.splitext(name)[0]
        if scorer is not None and stem in prompts:
            batch_s.append(sample)
            batch_p.append(prompts[stem])
        if len(batch_c) >= args.bs:
            flush()
    if batch_c:
        flush()

    for k, v in acc.compute().items():
        print(f"{k.upper()}: {v:.4f}")


if __name__ == "__main__":
    main()
