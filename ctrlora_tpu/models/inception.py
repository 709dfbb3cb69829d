"""FID InceptionV3 (pt_inception-2015-12-05), functional JAX port.

The reference defers FID/IS to external tooling over this exact network
(README-traineval.md:317-321 -> torch-fidelity / pytorch-fid, both of which
wrap the TF-ported 1008-class InceptionV3 with the three FID quirks:
count_include_pad=False average pools in the A/C/E1 mixed blocks and a MAX
branch pool in Mixed_7c). This port reproduces the pytorch-fid protocol:

    uint8 RGB -> float/255 -> bilinear resize to 299 (align_corners=False)
    -> 2x-1 -> pool3 features [B, 2048] (FID) and fc logits [B, 1008] (IS).

Weights: the standard pt_inception-2015-12-05-6726825d.pth state dict
(torchvision naming); BatchNorms (eps 1e-3) are folded into per-channel
affines at bridge time.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _conv(p, x, stride=1, padding=(0, 0)):
    if isinstance(padding, int):
        padding = (padding, padding)
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride),
        ((padding[0], padding[0]), (padding[1], padding[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y * p["scale"] + p["bias"]  # folded BN (eps 1e-3)


def _basic(p, x, stride=1, padding=(0, 0)):
    return jax.nn.relu(_conv(p, x, stride, padding))


def _maxpool3x3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _maxpool3x3s1p1(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _avgpool3x3s1p1_nocip(x):
    """avg_pool2d(3, 1, 1, count_include_pad=False) — the FID quirk."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return s / cnt


def _inception_a(p, x):
    b1 = _basic(p["branch1x1"], x)
    b5 = _basic(p["branch5x5_2"], _basic(p["branch5x5_1"], x), padding=2)
    b3 = _basic(p["branch3x3dbl_1"], x)
    b3 = _basic(p["branch3x3dbl_2"], b3, padding=1)
    b3 = _basic(p["branch3x3dbl_3"], b3, padding=1)
    bp = _basic(p["branch_pool"], _avgpool3x3s1p1_nocip(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x):
    b3 = _basic(p["branch3x3"], x, stride=2)
    bd = _basic(p["branch3x3dbl_1"], x)
    bd = _basic(p["branch3x3dbl_2"], bd, padding=1)
    bd = _basic(p["branch3x3dbl_3"], bd, stride=2)
    return jnp.concatenate([b3, bd, _maxpool3x3s2(x)], axis=-1)


def _inception_c(p, x):
    b1 = _basic(p["branch1x1"], x)
    b7 = _basic(p["branch7x7_1"], x)
    b7 = _basic(p["branch7x7_2"], b7, padding=(0, 3))
    b7 = _basic(p["branch7x7_3"], b7, padding=(3, 0))
    bd = _basic(p["branch7x7dbl_1"], x)
    bd = _basic(p["branch7x7dbl_2"], bd, padding=(3, 0))
    bd = _basic(p["branch7x7dbl_3"], bd, padding=(0, 3))
    bd = _basic(p["branch7x7dbl_4"], bd, padding=(3, 0))
    bd = _basic(p["branch7x7dbl_5"], bd, padding=(0, 3))
    bp = _basic(p["branch_pool"], _avgpool3x3s1p1_nocip(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    b3 = _basic(p["branch3x3_2"], _basic(p["branch3x3_1"], x), stride=2)
    b7 = _basic(p["branch7x7x3_1"], x)
    b7 = _basic(p["branch7x7x3_2"], b7, padding=(0, 3))
    b7 = _basic(p["branch7x7x3_3"], b7, padding=(3, 0))
    b7 = _basic(p["branch7x7x3_4"], b7, stride=2)
    return jnp.concatenate([b3, b7, _maxpool3x3s2(x)], axis=-1)


def _inception_e(p, x, pool: str):
    b1 = _basic(p["branch1x1"], x)
    b3 = _basic(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        _basic(p["branch3x3_2a"], b3, padding=(0, 1)),
        _basic(p["branch3x3_2b"], b3, padding=(1, 0)),
    ], axis=-1)
    bd = _basic(p["branch3x3dbl_1"], x)
    bd = _basic(p["branch3x3dbl_2"], bd, padding=1)
    bd = jnp.concatenate([
        _basic(p["branch3x3dbl_3a"], bd, padding=(0, 1)),
        _basic(p["branch3x3dbl_3b"], bd, padding=(1, 0)),
    ], axis=-1)
    pooled = _maxpool3x3s1p1(x) if pool == "max" else _avgpool3x3s1p1_nocip(x)
    bp = _basic(p["branch_pool"], pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_features(params: Dict, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x [B, 299, 299, 3] in [-1, 1] -> (pool3 [B, 2048], logits [B, 1008])."""
    x = _basic(params["Conv2d_1a_3x3"], x, stride=2)
    x = _basic(params["Conv2d_2a_3x3"], x)
    x = _basic(params["Conv2d_2b_3x3"], x, padding=1)
    x = _maxpool3x3s2(x)
    x = _basic(params["Conv2d_3b_1x1"], x)
    x = _basic(params["Conv2d_4a_3x3"], x)
    x = _maxpool3x3s2(x)
    x = _inception_a(params["Mixed_5b"], x)
    x = _inception_a(params["Mixed_5c"], x)
    x = _inception_a(params["Mixed_5d"], x)
    x = _inception_b(params["Mixed_6a"], x)
    x = _inception_c(params["Mixed_6b"], x)
    x = _inception_c(params["Mixed_6c"], x)
    x = _inception_c(params["Mixed_6d"], x)
    x = _inception_c(params["Mixed_6e"], x)
    x = _inception_d(params["Mixed_7a"], x)
    x = _inception_e(params["Mixed_7b"], x, pool="avg")
    x = _inception_e(params["Mixed_7c"], x, pool="max")
    feats = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
    logits = feats @ params["fc"]["kernel"] + params["fc"]["bias"]
    return feats, logits


def fid_preprocess(images_uint8: np.ndarray) -> np.ndarray:
    """uint8 [B, H, W, 3] -> [-1, 1] fp32 [B, 299, 299, 3] (pytorch-fid's
    bilinear align_corners=False resize on the [0,1] tensor)."""
    from ctrlora_tpu.annotators.oneformer.pixel_decoder import _resize_bilinear

    x = jnp.asarray(images_uint8, jnp.float32) / 255.0
    x = _resize_bilinear(x, (299, 299))
    return np.asarray(2.0 * x - 1.0)


def convert_inception(sd: Dict[str, np.ndarray], eps: float = 1e-3) -> Dict:
    """pt_inception state dict (torchvision names) -> folded-BN tree."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    out: Dict = {}

    def fold(prefix: str) -> Dict:
        w = sd[prefix + ".conv.weight"].transpose(2, 3, 1, 0)
        g = sd[prefix + ".bn.weight"]
        b = sd[prefix + ".bn.bias"]
        mean = sd[prefix + ".bn.running_mean"]
        var = sd[prefix + ".bn.running_var"]
        scale = g / np.sqrt(var + eps)
        return {
            "kernel": jnp.asarray(w),
            "scale": jnp.asarray(scale),
            "bias": jnp.asarray(b - mean * scale),
        }

    for stem in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                 "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
        out[stem] = fold(stem)
    branches = {
        "a": ("branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
              "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"),
        "b": ("branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"),
        "c": ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
              "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
              "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"),
        "d": ("branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
              "branch7x7x3_3", "branch7x7x3_4"),
        "e": ("branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
              "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
              "branch3x3dbl_3b", "branch_pool"),
    }
    kinds = {
        "Mixed_5b": "a", "Mixed_5c": "a", "Mixed_5d": "a", "Mixed_6a": "b",
        "Mixed_6b": "c", "Mixed_6c": "c", "Mixed_6d": "c", "Mixed_6e": "c",
        "Mixed_7a": "d", "Mixed_7b": "e", "Mixed_7c": "e",
    }
    for mixed, kind in kinds.items():
        out[mixed] = {br: fold(f"{mixed}.{br}") for br in branches[kind]}
    out["fc"] = {
        "kernel": jnp.asarray(sd["fc.weight"].T),
        "bias": jnp.asarray(sd["fc.bias"]),
    }
    return out


def inception_score(logits: np.ndarray, splits: int = 10) -> Tuple[float, float]:
    """IS over fc logits (torch-fidelity convention: softmax, 10 splits)."""
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    scores = []
    n = len(probs)
    for i in range(splits):
        part = probs[i * n // splits : (i + 1) * n // splits]
        if not len(part):
            continue
        marginal = part.mean(0, keepdims=True)
        kl = (part * (np.log(part + 1e-12) - np.log(marginal + 1e-12))).sum(-1)
        scores.append(float(np.exp(kl.mean())))
    return float(np.mean(scores)), float(np.std(scores))
