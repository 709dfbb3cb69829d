#!/usr/bin/env python
"""512 center-crop resize for dataset prep (reference:
scripts/tool_resize_images.py — COCO preparation)."""

import argparse
import multiprocessing as mp
import os


def process(task):
    f, source, target, save_format = task
    from PIL import Image

    try:
        img = Image.open(os.path.join(source, f))
        assert img.mode in ("L", "RGB", "RGBA")
        name, fmt = os.path.splitext(f)
        save_name = name + (fmt if save_format is None else f".{save_format}")
        portion = 512 / min(img.size)
        img = img.resize(
            (int(img.size[0] * portion), int(img.size[1] * portion)), Image.LANCZOS
        )
        img = img.crop(
            (img.size[0] // 2 - 256, img.size[1] // 2 - 256,
             img.size[0] // 2 + 256, img.size[1] // 2 + 256)
        )
        img.save(os.path.join(target, save_name), quality=95, icc_profile=None)
    except Exception:
        return


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--source", required=True)
    p.add_argument("--target", required=True)
    p.add_argument("--save_format", default=None)
    p.add_argument("--n_processes", type=int, default=4)
    args = p.parse_args()
    os.makedirs(args.target, exist_ok=True)
    files = os.listdir(args.source)
    tasks = [(f, args.source, args.target, args.save_format) for f in files]
    with mp.get_context("fork").Pool(args.n_processes) as pool:
        list(pool.imap(process, tasks))
    print("Done")


if __name__ == "__main__":
    main()
