#!/usr/bin/env python
"""Generate source/ condition images with any detector
(reference: scripts/tool_make_cond_images.py): per-file hash-seeded random
detector params, multiprocessing over the input directory.
"""

import argparse
import hashlib
import multiprocessing as mp
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ctrlora_tpu.utils.platform import ensure_platform_from_env

ensure_platform_from_env()

import numpy as np

CHOICES = [
    "canny", "hed", "seg", "depth", "normal", "openpose", "hedsketch",
    "bbox", "outpainting", "blur", "grayscale", "inpainting",
    "lineart", "lineart_anime", "shuffle", "mlsd",
    "jpeg", "palette", "pixel", "illusion", "densepose",
    "lineart_anime_with_color_prompt", "inpainting_brush",
]


def rng_by_hash(obj_id) -> np.random.Generator:
    """Per-file deterministic rng (reference: set_seed_by_hash, :38-42)."""
    h = hashlib.sha256(str(obj_id).encode())
    return np.random.default_rng(int(h.hexdigest(), 16) % 2**32)


def discrete_normal(rng, a, b):
    x = rng.standard_normal() * 0.5 + 0.5
    return int(x * (b - a)) + a


def random_params(detector: str, rng: np.random.Generator) -> dict:
    """Per-detector randomized params (reference: :49-100)."""
    if detector == "canny":
        return dict(low_threshold=100, high_threshold=200)
    if detector == "outpainting":
        return dict(rand_h=int(rng.integers(20, 80)), rand_w=int(rng.integers(20, 80)))
    if detector == "inpainting":
        return dict(
            rand_h=int(rng.integers(30, 60)), rand_h_1=int(rng.integers(30, 60)),
            rand_w=int(rng.integers(30, 60)), rand_w_1=int(rng.integers(30, 60)),
        )
    if detector == "blur":
        return dict(ksize=discrete_normal(rng, 24, 100) // 2 * 2 + 1)
    if detector == "jpeg":
        return dict(jpeg_quality=discrete_normal(rng, 1, 30))
    if detector == "pad":
        r = rng.uniform(0.1, 0.4, 4)
        return dict(top_ratio=r[0], bottom_ratio=r[1], left_ratio=r[2], right_ratio=r[3])
    if detector == "lineart":
        return dict(coarse=bool(rng.random() < 0.5))
    return {}


def process_file(task):
    fname, input_dir, output_dir, detector_name = task
    import cv2

    from ctrlora_tpu.annotators import registry
    from ctrlora_tpu.annotators.util import HWC3, resize_image

    rng = rng_by_hash(fname)
    img = cv2.imread(os.path.join(input_dir, fname))
    if img is None:
        return fname, False
    img = resize_image(HWC3(img[..., ::-1].copy()), 512)
    det = registry.get(detector_name)
    params = random_params(detector_name, rng)
    try:
        out = det(img, rng=rng, **params)
    except TypeError:
        out = det(img, **params)
    out = HWC3(np.asarray(out, np.uint8))
    cv2.imwrite(os.path.join(output_dir, os.path.splitext(fname)[0] + ".png"),
                out[..., ::-1])
    return fname, True


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--detector", choices=CHOICES, required=True)
    p.add_argument("--n_processes", type=int, default=1)
    args = p.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    files = sorted(os.listdir(args.input_dir))
    tasks = [(f, args.input_dir, args.output_dir, args.detector) for f in files]
    if args.n_processes <= 1:
        results = [process_file(t) for t in tasks]
    else:
        with mp.get_context("spawn").Pool(args.n_processes) as pool:
            results = list(pool.imap(process_file, tasks))
    ok = sum(1 for _, s in results if s)
    print(f"Done: {ok}/{len(files)} condition images -> {args.output_dir}")


if __name__ == "__main__":
    main()
