#!/usr/bin/env python
"""Per-sample coarse-mode detection for lineart eval (reference:
scripts/evaluate_lineart_is_coarse.py): re-detect each ground-truth image
with both fine and coarse lineart models and record which matches the GT
condition better."""

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
    p.add_argument("--out", default="./evaluate_lineart_is_coarse.txt")
    args = p.parse_args()

    from ctrlora_tpu.annotators.lineart import LineartDetector
    from ctrlora_tpu.annotators.util import HWC3, resize_image
    from ctrlora_tpu.data.datasets import imread_rgb

    det = LineartDetector()
    img_dir = os.path.join(args.sample_dir, "img")
    ctl_dir = os.path.join(args.sample_dir, "control")
    names = sorted(os.listdir(img_dir))
    is_coarse = []
    for name in names:
        im = imread_rgb(os.path.join(img_dir, name))
        gc = resize_image(HWC3(imread_rgb(os.path.join(ctl_dir, name))), 512)
        gc = gc.astype(np.float32) / 255.0
        diffs = {}
        for coarse in (False, True):
            c = resize_image(HWC3(det(im, coarse=coarse)), 512).astype(np.float32) / 255.0
            diffs[coarse] = float(np.mean((c - gc) ** 2))
        is_coarse.append(str(diffs[True] < diffs[False]))
    with open(args.out, "w") as f:
        f.write("\n".join(is_coarse))
    print(f"Wrote {len(is_coarse)} flags to {args.out}")


if __name__ == "__main__":
    main()
