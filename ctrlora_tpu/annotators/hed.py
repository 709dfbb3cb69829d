"""HED edge detector, Flax port (reference: annotator/hed/__init__.py:37-99,
ControlNetHED_Apache2 — a 5-block VGG-style net with per-block 1x1 edge
projections; final edge = sigmoid(mean of bilinearly-upsampled projections)).

Also provides HEDSketchDetector (reference: annotator/hedsketch): HED ->
threshold -> invert -> gaussian blur, retried until enough dark pixels.

Weights bridge from the public ControlNetHED.pth when present; otherwise the
detector runs with random weights (shape-correct, for tests).
"""

from __future__ import annotations

import os
from typing import Optional

import cv2
import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ctrlora_tpu.annotators.util import HWC3, safe_step

CKPT_ENV = "CTRLORA_ANNOTATOR_CKPTS"


def ckpts_dir() -> str:
    return os.environ.get(
        CKPT_ENV, os.path.join(os.path.dirname(__file__), "ckpts")
    )


class DoubleConvBlock(nn.Module):
    out_ch: int
    layers: int

    @nn.compact
    def __call__(self, x, down: bool = False):
        if down:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for i in range(self.layers):
            x = nn.Conv(self.out_ch, (3, 3), padding=1, name=f"conv_{i}")(x)
            x = nn.relu(x)
        proj = nn.Conv(1, (1, 1), name="projection")(x)
        return x, proj


class ControlNetHED(nn.Module):
    @nn.compact
    def __call__(self, x):  # x: [B,H,W,3] float32 (0..255 scale)
        norm = self.param("norm", nn.initializers.zeros, (1, 1, 1, 3))
        h = x - norm
        projs = []
        for i, (ch, layers, down) in enumerate(
            [(64, 2, False), (128, 2, True), (256, 3, True), (512, 3, True), (512, 3, True)]
        ):
            h, p = DoubleConvBlock(ch, layers, name=f"block{i + 1}")(h, down=down)
            projs.append(p)
        return projs


def load_hed_params(path: Optional[str] = None):
    """Bridge ControlNetHED.pth (torch) -> flax params, or None if absent."""
    from ctrlora_tpu.annotators.download import ensure_ckpt

    path = ensure_ckpt("ControlNetHED.pth", path)
    if not os.path.exists(path):
        return None
    import torch

    sd = torch.load(path, map_location="cpu")
    tree: dict = {"params": {}}
    p = tree["params"]
    p["norm"] = sd["norm"].numpy().transpose(0, 2, 3, 1)
    for b in range(1, 6):
        blk = {}
        n_layers = {1: 2, 2: 2, 3: 3, 4: 3, 5: 3}[b]
        for i in range(n_layers):
            w = sd[f"block{b}.convs.{i}.weight"].numpy().transpose(2, 3, 1, 0)
            bias = sd[f"block{b}.convs.{i}.bias"].numpy()
            blk[f"conv_{i}"] = {"kernel": w, "bias": bias}
        blk["projection"] = {
            "kernel": sd[f"block{b}.projection.weight"].numpy().transpose(2, 3, 1, 0),
            "bias": sd[f"block{b}.projection.bias"].numpy(),
        }
        p[f"block{b}"] = blk
    return tree


class HEDdetector:
    def __init__(self, params=None):
        self.model = ControlNetHED()
        self.params = params if params is not None else load_hed_params()
        if self.params is None:  # random weights (tests / missing ckpt)
            self.params = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
            )
        self._apply = jax.jit(self.model.apply)

    def __call__(self, input_image: np.ndarray, safe: bool = False) -> np.ndarray:
        assert input_image.ndim == 3
        H, W, _ = input_image.shape
        x = jnp.asarray(input_image[None].astype(np.float32))
        projs = self._apply(self.params, x)
        edges = [
            cv2.resize(np.asarray(p[0, :, :, 0], np.float32), (W, H), interpolation=cv2.INTER_LINEAR)
            for p in projs
        ]
        edge = 1 / (1 + np.exp(-np.mean(np.stack(edges, 2), axis=2).astype(np.float64)))
        if safe:
            edge = safe_step(edge)
        return (edge * 255.0).clip(0, 255).astype(np.uint8)


class HEDSketchDetector:
    def __init__(self, params=None):
        self.hed = HEDdetector(params)

    def __call__(self, input_image, safe=False, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        edge = HWC3(self.hed(input_image, safe=safe))
        for cnt in range(6):
            thr = int(rng.integers(110, 160))
            binary = cv2.threshold(edge, thr, 255, cv2.THRESH_BINARY)[1]
            out = cv2.GaussianBlur(cv2.bitwise_not(binary), (3, 3), 0)
            if np.sum(out < 5) > 0.005 * out.shape[0] * out.shape[1] or cnt == 5:
                return out
        return out
