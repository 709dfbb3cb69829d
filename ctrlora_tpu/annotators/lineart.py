"""Lineart detectors, Flax ports.

 * LineartDetector — informative-drawings resnet generator
   (reference: annotator/lineart/__init__.py:17-92; 3 residual blocks,
   InstanceNorm, reflection padding; `coarse` selects the sk_model2 weights).
 * LineartAnimeDetector — Anime2Sketch 8-down UNet generator
   (reference: annotator/lineart_anime/__init__.py:15-149).
 * LineartAnimeWithColorPromptDetector — anime lineart over random color
   blocks (reference: annotator/lineart_anime_with_color_prompt).

Weights bridge from the public sk_model.pth / sk_model2.pth / netG.pth when
present under the annotator checkpoint dir; random weights otherwise.
"""

from __future__ import annotations

import os
from typing import Optional

import cv2
import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ctrlora_tpu.annotators.hed import ckpts_dir
from ctrlora_tpu.annotators.download import ensure_ckpt


def instance_norm(x, eps: float = 1e-5):
    """InstanceNorm2d (affine=False): normalize per sample, per channel."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def reflect_pad(x, p: int):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class TorchConvT(nn.Module):
    """torch ConvTranspose2d(k, s, p, op) equivalent: input dilation + conv
    with flipped kernel. Params stored in torch layout [in, out, kh, kw] so
    the bridge is a straight copy."""

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k, s, p, op = self.kernel_size, self.stride, self.padding, self.output_padding
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (cin, self.features, k, k), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        # flip spatially, move to HWIO
        w_hwio = jnp.flip(w, axis=(2, 3)).transpose(2, 3, 0, 1)
        pad = (k - 1 - p, k - 1 - p + op)
        y = jax.lax.conv_general_dilated(
            x, w_hwio, window_strides=(1, 1), padding=(pad, pad),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b


class TorchConv(nn.Module):
    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features), jnp.float32,
        )
        y = jax.lax.conv_general_dilated(
            x, w, (self.stride, self.stride),
            ((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class LineartGenerator(nn.Module):
    """informative-drawings Generator(3, 1, n_blocks)."""

    n_blocks: int = 3

    @nn.compact
    def __call__(self, x):
        h = reflect_pad(x, 3)
        h = TorchConv(64, 7, name="conv0")(h)
        h = nn.relu(instance_norm(h))
        for i in range(2):
            h = TorchConv(64 * 2 ** (i + 1), 3, stride=2, padding=1, name=f"down{i}")(h)
            h = nn.relu(instance_norm(h))
        for i in range(self.n_blocks):
            r = reflect_pad(h, 1)
            r = TorchConv(256, 3, name=f"res{i}_conv0")(r)
            r = nn.relu(instance_norm(r))
            r = reflect_pad(r, 1)
            r = TorchConv(256, 3, name=f"res{i}_conv1")(r)
            h = h + instance_norm(r)
        for i in range(2):
            h = TorchConvT(256 // 2 ** (i + 1), 3, 2, 1, 1, name=f"up{i}")(h)
            h = nn.relu(instance_norm(h))
        h = reflect_pad(h, 3)
        h = TorchConv(1, 7, name="conv_out")(h)
        return nn.sigmoid(h)


def convert_lineart(sd) -> dict:
    """torch Generator state dict -> flax tree."""
    t = lambda k: np.asarray(sd[k], np.float32)
    conv = lambda k: {"kernel": t(k + ".weight").transpose(2, 3, 1, 0), "bias": t(k + ".bias")}
    convT = lambda k: {"kernel": t(k + ".weight"), "bias": t(k + ".bias")}
    p = {
        "conv0": conv("model0.1"),
        "down0": conv("model1.0"),
        "down1": conv("model1.3"),
        "up0": convT("model3.0"),
        "up1": convT("model3.3"),
        "conv_out": conv("model4.1"),
    }
    i = 0
    while f"model2.{i}.conv_block.1.weight" in sd:
        p[f"res{i}_conv0"] = conv(f"model2.{i}.conv_block.1")
        p[f"res{i}_conv1"] = conv(f"model2.{i}.conv_block.5")
        i += 1
    return {"params": p}


# ---------------------------------------------------------------------------
# Anime2Sketch UNet
# ---------------------------------------------------------------------------

# per-level (outer_ch, inner_ch); level 0 is outermost, 7 innermost
ANIME_LEVELS = [(1, 64), (64, 128), (128, 256), (256, 512),
                (512, 512), (512, 512), (512, 512), (512, 512)]


class AnimeUNet(nn.Module):
    """UnetGenerator(3, 1, 8, 64, InstanceNorm) (reference:
    lineart_anime/__init__.py:15-113)."""

    @nn.compact
    def __call__(self, x):
        n = len(ANIME_LEVELS)
        skips = []
        h = x
        for lvl, (outer, inner) in enumerate(ANIME_LEVELS):
            if lvl > 0:
                h = nn.leaky_relu(h, 0.2)
            h = TorchConv(inner, 4, stride=2, padding=1, name=f"down{lvl}")(h)
            if 0 < lvl < n - 1:
                h = instance_norm(h)
            skips.append(h)
        # innermost up
        for lvl in reversed(range(n)):
            outer, inner = ANIME_LEVELS[lvl]
            h = nn.relu(h)
            h = TorchConvT(outer, 4, 2, 1, 0, name=f"up{lvl}")(h)
            if lvl == 0:
                return nn.tanh(h)
            h = instance_norm(h)
            h = jnp.concatenate([skips[lvl - 1], h], axis=-1)


def convert_anime_unet(sd) -> dict:
    """torch UnetGenerator state dict -> flax tree. Keys are nested
    'model(.N|.model)*' sequences; generated programmatically."""
    t = lambda k: np.asarray(sd[k], np.float32)
    conv = lambda k: {"kernel": t(k + ".weight").transpose(2, 3, 1, 0), "bias": t(k + ".bias")}
    convT = lambda k: {"kernel": t(k + ".weight"), "bias": t(k + ".bias")}
    n = len(ANIME_LEVELS)
    p = {}
    prefix = "model"
    for lvl in range(n):
        if lvl == 0:  # outermost: [0 conv, 1 sub, 2 relu, 3 convT, 4 tanh]
            p["down0"] = conv(f"{prefix}.model.0")
            p["up0"] = convT(f"{prefix}.model.3")
            prefix = f"{prefix}.model.1"
        elif lvl < n - 1:  # mid: [0 relu, 1 conv, 2 norm, 3 sub, 4 relu, 5 convT, 6 norm]
            p[f"down{lvl}"] = conv(f"{prefix}.model.1")
            p[f"up{lvl}"] = convT(f"{prefix}.model.5")
            prefix = f"{prefix}.model.3"
        else:  # innermost: [0 relu, 1 conv, 2 relu, 3 convT, 4 norm]
            p[f"down{lvl}"] = conv(f"{prefix}.model.1")
            p[f"up{lvl}"] = convT(f"{prefix}.model.3")
    return {"params": p}


# ---------------------------------------------------------------------------
# detectors
# ---------------------------------------------------------------------------

def _load_torch(path):
    if not os.path.exists(path):
        return None
    import torch

    sd = torch.load(path, map_location="cpu")
    return {
        k.replace("module.", ""): v.numpy()
        for k, v in sd.items()
        if hasattr(v, "numpy")
    }


class LineartDetector:
    def __init__(self):
        self.model = LineartGenerator(n_blocks=3)
        self.params = {}
        for name, f in (("fine", "sk_model.pth"), ("coarse", "sk_model2.pth")):
            sd = _load_torch(ensure_ckpt(f))
            if sd is not None:
                self.params[name] = jax.tree_util.tree_map(
                    jnp.asarray, convert_lineart(sd)
                )
        if not self.params:  # random weights for tests
            p = self.model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
            self.params = {"fine": p, "coarse": p}
        self._apply = jax.jit(self.model.apply)

    def __call__(self, input_image: np.ndarray, coarse: bool = False) -> np.ndarray:
        params = self.params["coarse" if coarse else "fine"]
        x = jnp.asarray(input_image[None].astype(np.float32) / 255.0)
        line = np.asarray(self._apply(params, x))[0, :, :, 0]
        return (line * 255.0).clip(0, 255).astype(np.uint8)


class LineartAnimeDetector:
    def __init__(self):
        self.model = AnimeUNet()
        sd = _load_torch(ensure_ckpt("netG.pth"))
        if sd is not None:
            self.params = jax.tree_util.tree_map(jnp.asarray, convert_anime_unet(sd))
        else:
            self.params = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3))
            )
        self._apply = jax.jit(self.model.apply)

    def __call__(self, input_image: np.ndarray) -> np.ndarray:
        H, W = input_image.shape[:2]
        Hn = 256 * int(np.ceil(H / 256.0))
        Wn = 256 * int(np.ceil(W / 256.0))
        img = cv2.resize(input_image, (Wn, Hn), interpolation=cv2.INTER_CUBIC)
        x = jnp.asarray(img[None].astype(np.float32) / 127.5 - 1.0)
        line = np.asarray(self._apply(self.params, x))[0, :, :, 0] * 127.5 + 127.5
        line = cv2.resize(line, (W, H), interpolation=cv2.INTER_CUBIC)
        return line.clip(0, 255).astype(np.uint8)


class LineartAnimeWithColorPromptDetector:
    """Anime lineart blended with random color blocks (reference:
    annotator/lineart_anime_with_color_prompt/__init__.py): downsampled color
    prompt where the lineart is weak."""

    def __init__(self):
        self.anime = LineartAnimeDetector()

    def __call__(self, input_image: np.ndarray, rng: Optional[np.random.Generator] = None,
                 block: int = 64, threshold: int = 200) -> np.ndarray:
        rng = rng or np.random.default_rng()
        line = self.anime(input_image)
        h, w = input_image.shape[:2]
        small = cv2.resize(
            input_image, (max(w // block, 1), max(h // block, 1)),
            interpolation=cv2.INTER_CUBIC,
        )
        color = cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)
        out = color.copy()
        dark = line < threshold
        out[dark] = np.stack([line] * 3, axis=-1)[dark]
        return out.astype(np.uint8)
