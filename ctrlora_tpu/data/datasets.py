"""Datasets: CustomDataset and MultiGen-20M.

Same on-disk formats as the reference (datasets/custom_dataset.py:9-80,
datasets/multigen20m.py:20-142) with two deliberate changes:

  * all randomness (crops, prompt dropout) flows from an explicit
    np.random.Generator — reproducible and identical across hosts given the
    same seed, instead of the reference's unseeded module-global random;
  * images load via cv2 when available, PIL otherwise.

Output contract per example:
  jpg  [H,W,3] float32 in [-1,1]   target image
  txt  str                         prompt ('' with prob drop_rate)
  hint [H,W,3] float32 in [0,1]    condition image
  task str (MultiGen only)         'control_<task>'
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False
    from PIL import Image


MULTIGEN_TASK_KEYS = {
    "hed": "control_hed",
    "canny": "control_canny",
    "seg": "control_seg",
    "segbase": "control_seg",
    "depth": "control_depth",
    "normal": "control_normal",
    "openpose": "control_openpose",
    "hedsketch": "control_hedsketch",
    "bbox": "control_bbox",
    "outpainting": "control_outpainting",
    "inpainting": "control_inpainting",
    "blur": "control_blur",
    "grayscale": "control_grayscale",
}


def imread_rgb(path: str) -> Optional[np.ndarray]:
    if _HAS_CV2:
        img = cv2.imread(path)
        if img is None:
            return None
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    try:  # pragma: no cover
        return np.asarray(Image.open(path).convert("RGB"))
    except Exception:
        return None


def _use_native() -> bool:
    """Opt-in fused C++ transforms (CTRLORA_NATIVE_DATA=1). Resize kernels
    are area/bilinear rather than the reference's LANCZOS4 upscale — visually
    indistinguishable for training data, so opt-in rather than default."""
    if not os.environ.get("CTRLORA_NATIVE_DATA"):
        return False
    from ctrlora_tpu.data import native

    return native.available(build=True)


def _resize(img: np.ndarray, size: int, up: bool) -> np.ndarray:
    if _HAS_CV2:
        interp = cv2.INTER_LANCZOS4 if up else cv2.INTER_AREA
        return cv2.resize(img, (size, size), interpolation=interp)
    from PIL import Image  # pragma: no cover

    return np.asarray(Image.fromarray(img).resize((size, size), Image.LANCZOS))


class CustomDataset:
    """root/{prompt.json, source/, target/} (reference docstring:
    datasets/custom_dataset.py:10-28)."""

    def __init__(self, root: str, drop_rate: float = 0.0, resolution: Optional[int] = None):
        self.root = os.path.expanduser(root)
        self.drop_rate = drop_rate
        self.resolution = resolution
        pj = os.path.join(self.root, "prompt.json")
        if not os.path.isfile(pj):
            raise FileNotFoundError(pj)
        source_files = set(os.listdir(os.path.join(self.root, "source")))
        target_files = set(os.listdir(os.path.join(self.root, "target")))
        self.data: List[dict] = []
        with open(pj) as f:
            for line in f:
                item = json.loads(line)
                if item["source"].removeprefix("source/") not in source_files:
                    continue
                if item["target"].removeprefix("target/") not in target_files:
                    continue
                self.data.append(item)

    def __len__(self) -> int:
        return len(self.data)

    def get(self, idx: int, rng: np.random.Generator) -> Dict:
        item = self.data[idx]
        source = imread_rgb(os.path.join(self.root, item["source"]))
        target = imread_rgb(os.path.join(self.root, item["target"]))
        prompt = item["prompt"]
        if rng.random() < self.drop_rate:
            prompt = ""
        if self.resolution is not None and _use_native():
            # fused C++ crop+resize+normalize (native/image_ops.cpp)
            from ctrlora_tpu.data import native

            r = self.resolution
            hint = native.resize_norm(
                source, (0, 0, *source.shape[:2]), (r, r), 1 / 255.0, 0.0
            )
            jpg = native.resize_norm(
                target, (0, 0, *target.shape[:2]), (r, r), 1 / 127.5, -1.0
            )
            if hint is not None and jpg is not None:
                return dict(jpg=jpg, txt=prompt, hint=hint)
        if self.resolution is not None:
            source = _resize(source, self.resolution, source.shape[0] < self.resolution)
            target = _resize(target, self.resolution, target.shape[0] < self.resolution)
        return dict(
            jpg=target.astype(np.float32) / 127.5 - 1.0,
            txt=prompt,
            hint=source.astype(np.float32) / 255.0,
        )


class MultiGen20M:
    """One task of MultiGen-20M: JSONL of {prompt, source, control_<task>}
    with paired random square crop + resize to 512 (reference:
    datasets/multigen20m.py:59-95)."""

    def __init__(
        self,
        path_json: str,
        path_meta: str,
        task: str,
        drop_rate: float = 0.3,
        random_cropping: bool = True,
        resolution: int = 512,
    ):
        if task not in MULTIGEN_TASK_KEYS:
            raise ValueError(f"unknown multigen task {task!r}")
        self.key = MULTIGEN_TASK_KEYS[task]
        self.task = task
        self.path_meta = path_meta
        self.drop_rate = drop_rate
        self.random_cropping = random_cropping
        self.resolution = resolution
        self.data: List[dict] = []
        with open(path_json) as f:
            for line in f:
                self.data.append(json.loads(line))

    def __len__(self) -> int:
        return len(self.data)

    def _paired_crop(self, control: np.ndarray, target: np.ndarray, rng):
        """Square-crop the control image (random or center) and apply the
        same *relative* crop to the target, then resize both."""
        H, W = control.shape[:2]
        if W >= H:
            crop = H
            l = int(rng.integers(0, W - crop + 1)) if self.random_cropping else (W - crop) // 2
            box = (0, H, l, l + crop)
        else:
            crop = W
            t = int(rng.integers(0, H - crop + 1)) if self.random_cropping else (H - crop) // 2
            box = (t, t + crop, 0, W)
        t0, b0, l0, r0 = box
        rates = (t0 / H, b0 / H, l0 / W, r0 / W)
        ctrl = control[t0:b0, l0:r0]
        Ht, Wt = target.shape[:2]
        tt, bt, lt, rt = (
            int(rates[0] * Ht), int(rates[1] * Ht), int(rates[2] * Wt), int(rates[3] * Wt)
        )
        tgt = target[tt:bt, lt:rt]
        up = self.resolution / min(H, W) > 1
        return (
            _resize(ctrl, self.resolution, up),
            _resize(tgt, self.resolution, self.resolution / min(Ht, Wt) > 1),
        )

    def get(self, idx: int, rng: np.random.Generator) -> Dict:
        # corrupt-sample skip loop (reference: multigen20m.py:110-126)
        for tries in range(10000):
            item = self.data[idx]
            src_name = item.get(self.key)
            tgt_name = item.get("source", "")
            tgt_name = tgt_name[2:] if tgt_name.startswith("./") else tgt_name
            source = (
                imread_rgb(os.path.join(self.path_meta, "conditions", src_name))
                if src_name
                else None
            )
            target = imread_rgb(os.path.join(self.path_meta, "images", tgt_name))
            prompt = item.get("prompt")
            if source is not None and target is not None and prompt is not None:
                break
            idx = (idx + 1) % len(self.data)
        source, target = self._paired_crop(source, target, rng)
        if rng.random() < self.drop_rate:
            prompt = ""
        return dict(
            jpg=target.astype(np.float32) / 127.5 - 1.0,
            txt=prompt,
            hint=source.astype(np.float32) / 255.0,
            task=self.key,
        )
