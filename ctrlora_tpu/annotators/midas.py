"""MiDaS DPT-Large depth estimator, Flax port (reference: annotator/midas —
DPTDepthModel on a ViT-L/16 backbone with 'project' readout, hooks at blocks
5/11/17/23, reassemble convs, four RefineNet fusion blocks, monocular-depth
head; MidasDetector also derives surface normals from depth via Sobel,
annotator/midas/__init__.py:27-51).

Weights bridge from the public dpt_large checkpoint (pretrained.model.* timm
ViT keys + scratch.* decoder keys).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from ctrlora_tpu.annotators.hed import ckpts_dir
from ctrlora_tpu.annotators.download import ensure_ckpt

VIT_DIM = 1024
VIT_LAYERS = 24
VIT_HEADS = 16
HOOKS = (5, 11, 17, 23)
REASSEMBLE = (256, 512, 1024, 1024)
FEATURES = 256


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def _ln(p, x, eps=1e-6):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _conv(p, x, stride=1, padding=0, bias=True):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"] if bias and "bias" in p else y


def _convT(p, x, k, s):
    """torch ConvTranspose2d(k, s, p=0): params in torch [in,out,k,k] layout."""
    w = jnp.flip(p["kernel"], axis=(2, 3)).transpose(2, 3, 0, 1)
    pad = (k - 1, k - 1)
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), (pad, pad), lhs_dilation=(s, s),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"]


def _up2_align(x):
    """bilinear 2x, align_corners=True (torch semantics)."""
    from ctrlora_tpu.annotators.mlsd import _bilinear_up2_align

    return _bilinear_up2_align(x)


def _vit_block(p, x):
    h = _ln(p["norm1"], x)
    b, s, d = h.shape
    qkv = _dense(p["qkv"], h).reshape(b, s, 3, VIT_HEADS, d // VIT_HEADS)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * (d // VIT_HEADS) ** -0.5, k,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v).transpose(0, 2, 1, 3).reshape(b, s, d)
    x = x + _dense(p["proj"], o)
    h = _ln(p["norm2"], x)
    h = _dense(p["fc2"], jax.nn.gelu(_dense(p["fc1"], h), approximate=False))
    return x + h


def _resize_pos_embed(pos, gh, gw):
    tok, grid = pos[:, :1], pos[0, 1:]
    g = int(np.sqrt(grid.shape[0]))
    grid = grid.reshape(g, g, -1)
    grid = jax.image.resize(grid, (gh, gw, grid.shape[-1]), method="bilinear")
    return jnp.concatenate([tok, grid.reshape(1, gh * gw, -1)], axis=1)


def _residual_conv_unit(p, x):
    out = jax.nn.relu(x)
    out = _conv(p["conv1"], out, padding=1)
    out = jax.nn.relu(out)
    out = _conv(p["conv2"], out, padding=1)
    return out + x


def _fusion(p, x, res=None):
    if res is not None:
        x = x + _residual_conv_unit(p["res1"], res)
    x = _residual_conv_unit(p["res2"], x)
    x = _up2_align(x)
    return _conv(p["out_conv"], x)


def dpt_forward(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """x [B,H,W,3] (H,W multiples of 16, values as the detector feeds them)
    -> inverse depth [B,H/2,W/2]."""
    b, H, W, _ = x.shape
    gh, gw = H // 16, W // 16
    p = params
    h = _conv(p["patch_embed"], x, stride=16)
    h = h.reshape(b, gh * gw, VIT_DIM)
    cls = jnp.tile(p["cls_token"], (b, 1, 1))
    h = jnp.concatenate([cls, h], axis=1)
    h = h + _resize_pos_embed(p["pos_embed"], gh, gw)

    taps = []
    for i in range(VIT_LAYERS):
        h = _vit_block(p[f"block_{i}"], h)
        if i in HOOKS:
            taps.append(h)

    layers = []
    for lvl, tap in enumerate(taps):
        # 'project' readout: cat cls onto every patch token, Linear + GELU
        readout = jnp.tile(tap[:, :1], (1, gh * gw, 1))
        feat = jnp.concatenate([tap[:, 1:], readout], axis=-1)
        feat = jax.nn.gelu(_dense(p[f"readout_{lvl}"], feat), approximate=False)
        feat = feat.reshape(b, gh, gw, VIT_DIM)
        feat = _conv(p[f"reassemble_{lvl}_conv"], feat)  # 1x1 to REASSEMBLE[lvl]
        if lvl == 0:
            feat = _convT(p["reassemble_0_up"], feat, 4, 4)
        elif lvl == 1:
            feat = _convT(p["reassemble_1_up"], feat, 2, 2)
        elif lvl == 3:
            feat = _conv(p["reassemble_3_down"], feat, stride=2, padding=1)
        layers.append(_conv(p[f"scratch_rn_{lvl}"], feat, padding=1, bias=False))

    path = _fusion(p["refinenet4"], layers[3])
    path = _fusion(p["refinenet3"], path, layers[2])
    path = _fusion(p["refinenet2"], path, layers[1])
    path = _fusion(p["refinenet1"], path, layers[0])

    out = _conv(p["head_conv1"], path, padding=1)
    out = _up2_align(out)
    out = jax.nn.relu(_conv(p["head_conv2"], out, padding=1))
    out = jax.nn.relu(_conv(p["head_conv3"], out))
    return out[:, :, :, 0]


# ---------------------------------------------------------------------------
# bridge
# ---------------------------------------------------------------------------

def convert_dpt(sd: Dict[str, np.ndarray]) -> Dict:
    t = lambda k: np.asarray(sd[k], np.float32)
    conv = lambda k, bias=True: (
        {"kernel": t(k + ".weight").transpose(2, 3, 1, 0),
         **({"bias": t(k + ".bias")} if bias else {})}
    )
    lin = lambda k: {"kernel": t(k + ".weight").T, "bias": t(k + ".bias")}
    norm = lambda k: {"scale": t(k + ".weight"), "bias": t(k + ".bias")}

    p: Dict = {
        "patch_embed": conv("pretrained.model.patch_embed.proj"),
        "cls_token": t("pretrained.model.cls_token"),
        "pos_embed": t("pretrained.model.pos_embed"),
    }
    for i in range(VIT_LAYERS):
        src = f"pretrained.model.blocks.{i}"
        p[f"block_{i}"] = {
            "norm1": norm(src + ".norm1"),
            "qkv": lin(src + ".attn.qkv"),
            "proj": lin(src + ".attn.proj"),
            "norm2": norm(src + ".norm2"),
            "fc1": lin(src + ".mlp.fc1"),
            "fc2": lin(src + ".mlp.fc2"),
        }
    for lvl in range(4):
        ap = f"pretrained.act_postprocess{lvl + 1}"
        p[f"readout_{lvl}"] = lin(f"{ap}.0.project.0")
        p[f"reassemble_{lvl}_conv"] = conv(f"{ap}.3")
        p[f"scratch_rn_{lvl}"] = conv(f"scratch.layer{lvl + 1}_rn", bias=False)
    p["reassemble_0_up"] = {"kernel": t("pretrained.act_postprocess1.4.weight"),
                            "bias": t("pretrained.act_postprocess1.4.bias")}
    p["reassemble_1_up"] = {"kernel": t("pretrained.act_postprocess2.4.weight"),
                            "bias": t("pretrained.act_postprocess2.4.bias")}
    p["reassemble_3_down"] = conv("pretrained.act_postprocess4.4")
    for n in range(1, 5):
        src = f"scratch.refinenet{n}"
        p[f"refinenet{n}"] = {
            "res1": {"conv1": conv(src + ".resConfUnit1.conv1"),
                     "conv2": conv(src + ".resConfUnit1.conv2")},
            "res2": {"conv1": conv(src + ".resConfUnit2.conv1"),
                     "conv2": conv(src + ".resConfUnit2.conv2")},
            "out_conv": conv(src + ".out_conv"),
        }
    p["head_conv1"] = conv("scratch.output_conv.0")
    p["head_conv2"] = conv("scratch.output_conv.2")
    p["head_conv3"] = conv("scratch.output_conv.4")
    return p


def init_random_dpt(rng: np.random.Generator, layers: int = VIT_LAYERS) -> Dict:
    """Shape-correct random params (tests / missing ckpt)."""
    lin = lambda i, o: {"kernel": rng.standard_normal((i, o)).astype(np.float32) * 0.02,
                        "bias": np.zeros(o, np.float32)}
    conv = lambda k, i, o, bias=True: (
        {"kernel": rng.standard_normal((k, k, i, o)).astype(np.float32) * 0.02,
         **({"bias": np.zeros(o, np.float32)} if bias else {})}
    )
    norm = lambda d: {"scale": np.ones(d, np.float32), "bias": np.zeros(d, np.float32)}
    d = VIT_DIM
    p: Dict = {
        "patch_embed": conv(16, 3, d),
        "cls_token": np.zeros((1, 1, d), np.float32),
        "pos_embed": rng.standard_normal((1, 577, d)).astype(np.float32) * 0.02,
    }
    for i in range(layers):
        p[f"block_{i}"] = {
            "norm1": norm(d), "qkv": lin(d, 3 * d), "proj": lin(d, d),
            "norm2": norm(d), "fc1": lin(d, 4 * d), "fc2": lin(4 * d, d),
        }
    for lvl, f in enumerate(REASSEMBLE):
        p[f"readout_{lvl}"] = lin(2 * d, d)
        p[f"reassemble_{lvl}_conv"] = conv(1, d, f)
        p[f"scratch_rn_{lvl}"] = conv(3, f, FEATURES, bias=False)
    p["reassemble_0_up"] = {
        "kernel": rng.standard_normal((REASSEMBLE[0], REASSEMBLE[0], 4, 4)).astype(np.float32) * 0.02,
        "bias": np.zeros(REASSEMBLE[0], np.float32),
    }
    p["reassemble_1_up"] = {
        "kernel": rng.standard_normal((REASSEMBLE[1], REASSEMBLE[1], 2, 2)).astype(np.float32) * 0.02,
        "bias": np.zeros(REASSEMBLE[1], np.float32),
    }
    p["reassemble_3_down"] = conv(3, REASSEMBLE[3], REASSEMBLE[3])
    for n in range(1, 5):
        p[f"refinenet{n}"] = {
            "res1": {"conv1": conv(3, FEATURES, FEATURES), "conv2": conv(3, FEATURES, FEATURES)},
            "res2": {"conv1": conv(3, FEATURES, FEATURES), "conv2": conv(3, FEATURES, FEATURES)},
            "out_conv": conv(1, FEATURES, FEATURES),
        }
    p["head_conv1"] = conv(3, FEATURES, FEATURES // 2)
    p["head_conv2"] = conv(3, FEATURES // 2, 32)
    p["head_conv3"] = conv(1, 32, 1)
    return p


class MidasDetector:
    """Returns (depth_image, normal_image) like the reference
    (annotator/midas/__init__.py:27-51)."""

    def __init__(self, params=None):
        if params is None:
            path = ensure_ckpt("dpt_large_384.pt")
            alt = os.path.join(ckpts_dir(), "dpt_large-midas-2f21e586.pt")
            path = path if os.path.exists(path) else alt
            if os.path.exists(path):
                import torch

                sd = torch.load(path, map_location="cpu")
                if "state_dict" in sd:
                    sd = sd["state_dict"]
                params = jax.tree_util.tree_map(
                    jnp.asarray,
                    convert_dpt({k: v.numpy() for k, v in sd.items()}),
                )
            else:
                params = jax.tree_util.tree_map(
                    jnp.asarray, init_random_dpt(np.random.default_rng(0))
                )
        self.params = params
        self._fwd = jax.jit(dpt_forward)

    def __call__(self, input_image: np.ndarray, a: float = np.pi * 0.2,
                 bg_th: float = 0.02) -> Tuple[np.ndarray, np.ndarray]:
        assert input_image.ndim == 3
        H, W = input_image.shape[:2]
        # pad to /32 like MiDaSInference's resize contract
        Hp, Wp = (H + 31) // 32 * 32, (W + 31) // 32 * 32
        img = cv2.resize(input_image, (Wp, Hp), interpolation=cv2.INTER_AREA)
        x = jnp.asarray(img[None].astype(np.float32) / 127.5 - 1.0)
        depth = np.asarray(self._fwd(self.params, x))[0]
        depth = cv2.resize(depth, (W, H), interpolation=cv2.INTER_LINEAR)

        depth_pt = depth - depth.min()
        depth_pt = depth_pt / max(depth_pt.max(), 1e-12)
        depth_image = (depth_pt * 255.0).clip(0, 255).astype(np.uint8)

        gx = cv2.Sobel(depth, cv2.CV_32F, 1, 0, ksize=3)
        gy = cv2.Sobel(depth, cv2.CV_32F, 0, 1, ksize=3)
        z = np.ones_like(gx) * a
        gx[depth_pt < bg_th] = 0
        gy[depth_pt < bg_th] = 0
        normal = np.stack([gx, gy, z], axis=2)
        normal /= np.sum(normal**2.0, axis=2, keepdims=True) ** 0.5
        normal_image = (normal * 127.5 + 127.5).clip(0, 255).astype(np.uint8)
        return depth_image, normal_image
