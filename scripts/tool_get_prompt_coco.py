#!/usr/bin/env python
"""Build a CustomDataset prompt.json from COCO caption annotations
(reference: scripts/tool_get_prompt_coco.py): one caption per image, with an
optional person-annotation filter."""

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann_file", required=True)
    p.add_argument("--save_path", required=True)
    p.add_argument("--ann_person_file", default=None, help="filter person images")
    args = p.parse_args()

    with open(args.ann_file) as f:
        data = json.load(f)

    image_ids = {a["image_id"] for a in data["annotations"]}
    if args.ann_person_file:
        with open(args.ann_person_file) as f:
            person = json.load(f)
        image_ids &= {a["image_id"] for a in person["annotations"]}

    captions = {}
    for a in data["annotations"]:
        filename = str(a["image_id"]).zfill(12) + ".jpg"
        if filename not in captions and a["image_id"] in image_ids:
            captions[filename] = a["caption"]

    with open(args.save_path, "w") as f:
        for filename, prompt in sorted(captions.items()):
            f.write(json.dumps(dict(
                source=f"source/{filename}", target=f"target/{filename}",
                prompt=prompt,
            )) + "\n")
    print(f"wrote {len(captions)} prompts to {args.save_path}")


if __name__ == "__main__":
    main()
