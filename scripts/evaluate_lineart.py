#!/usr/bin/env python
"""Lineart controllability eval (reference: scripts/evaluate_lineart.py):
re-detect lineart from samples, honoring the per-sample coarse flags from
evaluate_lineart_is_coarse.py, then MSE / PSNR / SSIM vs GT conditions."""

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
    p.add_argument("--is_coarse", default="./evaluate_lineart_is_coarse.txt")
    p.add_argument("--bs", type=int, default=64)
    args = p.parse_args()

    from ctrlora_tpu.annotators.lineart import LineartDetector
    from ctrlora_tpu.annotators.util import HWC3, resize_image
    from ctrlora_tpu.data.datasets import imread_rgb
    from ctrlora_tpu.evaluation import MetricAccumulator

    det = LineartDetector()
    sample_dir = os.path.join(args.sample_dir, "sample")
    ctl_dir = os.path.join(args.sample_dir, "control")
    names = sorted(os.listdir(sample_dir))
    if os.path.isfile(args.is_coarse):
        flags = [l.strip() == "True" for l in open(args.is_coarse)]
        assert len(flags) == len(names), "run evaluate_lineart_is_coarse.py first"
    else:
        flags = [False] * len(names)
    acc = MetricAccumulator()
    bc, bg = [], []
    for name, coarse in zip(names, flags):
        s = imread_rgb(os.path.join(sample_dir, name))
        g = resize_image(HWC3(imread_rgb(os.path.join(ctl_dir, name))), 512)
        c = resize_image(HWC3(det(s, coarse=coarse)), 512)
        bc.append(c.astype(np.float32) / 255.0)
        bg.append(g.astype(np.float32) / 255.0)
        if len(bc) >= args.bs:
            acc.update(np.stack(bc), np.stack(bg))
            bc, bg = [], []
    if bc:
        acc.update(np.stack(bc), np.stack(bg))
    for k, v in acc.compute().items():
        print(f"{k.upper()}: {v:.4f}")


if __name__ == "__main__":
    main()
