#!/usr/bin/env python
"""Controllability evaluation (reference: scripts/evaluate_control.py):
re-detect the condition from each sample and compare with the ground-truth
condition map via MSE / PSNR / SSIM.

  python scripts/evaluate_control.py --sample_dir out --detector canny
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
    args = p.parse_args()

    from functools import partial

    from ctrlora_tpu.annotators import registry
    from ctrlora_tpu.annotators.util import HWC3, resize_image
    from ctrlora_tpu.data.datasets import imread_rgb
    from ctrlora_tpu.evaluation import MetricAccumulator

    det = registry.get(args.detector)
    if args.detector == "canny":
        det = partial(det, low_threshold=100, high_threshold=200)

    sample_dir = os.path.join(args.sample_dir, "sample")
    control_dir = os.path.join(args.sample_dir, "control")
    names = sorted(os.listdir(sample_dir))
    print("Dataset size:", len(names))

    acc = MetricAccumulator()
    batch_c, batch_g = [], []
    for name in names:
        sample = imread_rgb(os.path.join(sample_dir, name))
        gt = imread_rgb(os.path.join(control_dir, name))
        gt = resize_image(HWC3(gt), 512).astype(np.float32) / 255.0
        c = det(sample)
        c = resize_image(HWC3(np.asarray(c, np.uint8)), 512).astype(np.float32) / 255.0
        batch_c.append(c)
        batch_g.append(gt)
        if len(batch_c) >= args.bs:
            acc.update(np.stack(batch_c), np.stack(batch_g))
            batch_c, batch_g = [], []
    if batch_c:
        acc.update(np.stack(batch_c), np.stack(batch_g))

    for k, v in acc.compute().items():
        print(f"{k.upper()}: {v:.4f}")


if __name__ == "__main__":
    main()
