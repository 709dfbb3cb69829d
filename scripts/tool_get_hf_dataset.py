#!/usr/bin/env python
"""Export a HuggingFace image/caption dataset to the CustomDataset layout
(reference: scripts/tool_get_densepose25k.py and
tool_get_laion_aesthetics_6.5p{169k,636k}.py — unified into one tool).

  # densepose25k (image + conditioning_image + caption)
  python scripts/tool_get_hf_dataset.py --hf_name jschoormans/densepose_1024 \
      --image_key file_name --cond_key conditioning_image --prompt_key caption \
      --save_dir data/densepose25k

  # laion aesthetics 6.5+ 169k (bytes + text, size-filtered)
  python scripts/tool_get_hf_dataset.py \
      --hf_name bhargavsdesai/laion_improved_aesthetics_6.5plus_with_images \
      --image_key image --prompt_key text --min_short_size 512 \
      --save_dir data/laion_aesthetics_6.5p

  # laion aesthetics 6.5+ 636k (size-filter a LOCAL image dir, no prompts —
  # reference tool_get_laion_aesthetics_6.5p636k.py)
  python scripts/tool_get_hf_dataset.py --ori_image_dir data/laion_raw \
      --min_short_size 512 --save_dir data/laion_aesthetics_6.5p636k

Flag-parity map vs the reference scripts (see PARITY.md §2.4):
--min_short_size/--min_image_ratio/--save_image_format/--max_workers carry
the reference semantics verbatim (jpeg quality 95, {i:012d} names, one JSON
line per kept sample with source/target/prompt keys).
"""

import argparse
import io
import json
import os
from concurrent.futures import ThreadPoolExecutor


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hf_name", default=None, help="HuggingFace dataset name")
    p.add_argument("--ori_image_dir", default=None,
                   help="size-filter a local image dir instead of an HF "
                        "dataset (636k-variant mode; no prompt.json)")
    p.add_argument("--split", default="train")
    p.add_argument("--save_dir", required=True)
    p.add_argument("--image_key", default="image")
    p.add_argument("--cond_key", default=None, help="optional condition-image column")
    p.add_argument("--prompt_key", default="text")
    p.add_argument("--min_short_size", type=int, default=0)
    p.add_argument("--min_image_ratio", type=float, default=0)
    p.add_argument("--save_image_format", default="jpg")
    p.add_argument("--max_workers", type=int, default=16)
    args = p.parse_args()

    from PIL import Image

    if bool(args.hf_name) == bool(args.ori_image_dir):
        p.error("exactly one of --hf_name / --ori_image_dir is required")

    def ok_size(img):
        w, h = img.size
        return (
            min(w, h) >= args.min_short_size
            and min(w / h, h / w) >= args.min_image_ratio
        )

    if args.ori_image_dir:
        # 636k-variant mode (reference tool_get_laion_aesthetics_6.5p636k.py):
        # copy size-passing local images into the filtered dir; no prompts
        out_dir = os.path.join(args.save_dir, "target")
        os.makedirs(out_dir, exist_ok=True)
        paths = sorted(
            os.path.join(args.ori_image_dir, f)
            for f in os.listdir(args.ori_image_dir)
        )

        def copy_one(i):
            try:
                with Image.open(paths[i]) as img:
                    if not ok_size(img):
                        return None
                    img.convert("RGB").save(
                        os.path.join(
                            out_dir, f"{i:012d}.{args.save_image_format}"
                        ),
                        quality=95,
                    )
                return 1
            except Exception:
                return None

        with ThreadPoolExecutor(max_workers=args.max_workers) as pool:
            kept = [r for r in pool.map(copy_one, range(len(paths))) if r]
        print(f"kept {len(kept)}/{len(paths)} images in {out_dir}")
        return

    import datasets

    ds = datasets.load_dataset(args.hf_name)[args.split]
    img_dir = os.path.join(args.save_dir, "target")
    os.makedirs(img_dir, exist_ok=True)
    cond_dir = os.path.join(args.save_dir, "source")
    if args.cond_key:
        os.makedirs(cond_dir, exist_ok=True)

    def to_pil(v):
        if isinstance(v, dict) and "bytes" in v:
            return Image.open(io.BytesIO(v["bytes"]))
        return v

    def work(i):
        try:
            img = to_pil(ds[i][args.image_key])
            if not ok_size(img):
                return None
            name = f"{i:012d}.{args.save_image_format}"
            img.convert("RGB").save(os.path.join(img_dir, name), quality=95)
            if args.cond_key:
                to_pil(ds[i][args.cond_key]).convert("RGB").save(
                    os.path.join(cond_dir, name), quality=95
                )
            return json.dumps(dict(
                source=f"source/{name}", target=f"target/{name}",
                prompt=ds[i][args.prompt_key],
            ))
        except Exception:
            return None

    with ThreadPoolExecutor(max_workers=args.max_workers) as pool:
        lines = [l for l in pool.map(work, range(len(ds))) if l]
    with open(os.path.join(args.save_dir, "prompt.json"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"exported {len(lines)} examples to {args.save_dir}")


if __name__ == "__main__":
    main()
