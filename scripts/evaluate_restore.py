#!/usr/bin/env python
"""Restoration evaluation (reference: scripts/evaluate_restore.py):
compare samples directly against ground-truth images (inpainting /
outpainting style tasks) via MSE / PSNR / SSIM.
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
    args = p.parse_args()

    from ctrlora_tpu.annotators.util import HWC3, resize_image
    from ctrlora_tpu.data.datasets import imread_rgb
    from ctrlora_tpu.evaluation import MetricAccumulator

    sample_dir = os.path.join(args.sample_dir, "sample")
    img_dir = os.path.join(args.sample_dir, "img")
    names = sorted(os.listdir(sample_dir))
    print("Dataset size:", len(names))

    acc = MetricAccumulator()
    batch_s, batch_g = [], []
    for name in names:
        s = imread_rgb(os.path.join(sample_dir, name)).astype(np.float32) / 255.0
        g = imread_rgb(os.path.join(img_dir, name))
        g = resize_image(HWC3(g), 512).astype(np.float32) / 255.0
        if s.shape != g.shape:
            s = resize_image(HWC3((s * 255).astype(np.uint8)), 512).astype(np.float32) / 255.0
        batch_s.append(s)
        batch_g.append(g)
        if len(batch_s) >= args.bs:
            acc.update(np.stack(batch_s), np.stack(batch_g))
            batch_s, batch_g = [], []
    if batch_s:
        acc.update(np.stack(batch_s), np.stack(batch_g))

    for k, v in acc.compute().items():
        print(f"{k.upper()}: {v:.4f}")


if __name__ == "__main__":
    main()
