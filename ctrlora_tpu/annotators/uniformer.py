"""UniFormer-S + UPerNet ADE20K segmentation, Flax-free JAX port
(reference: annotator/uniformer — upernet_global_small over the vendored
mmseg; the 'seg' condition of MultiGen-20M).

Backbone (mmseg/models/backbones/uniformer.py): 4 stages of [3,4,8,3]
blocks at dims [64,128,320,512]; stages 1-2 use convolutional CBlocks
(BatchNorm, folded here), stages 3-4 global self-attention SABlocks
(LayerNorm). Decode head (uper_head.py): PPM over stage4 + FPN laterals +
fused bottleneck + 150-class conv. Whole-image inference: logits resized to
the input (align_corners=False), argmax, ADE palette colorization
(annotator/uniformer/__init__.py:24-27).
"""

from __future__ import annotations

import os
from typing import Dict, List

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from ctrlora_tpu.annotators.ade_palette import ADE_PALETTE
from ctrlora_tpu.annotators.hed import ckpts_dir
from ctrlora_tpu.annotators.download import ensure_ckpt

EMBED_DIMS = (64, 128, 320, 512)
LAYERS = (3, 4, 8, 3)
HEAD_DIM = 64
CHANNELS = 512
POOL_SCALES = (1, 2, 3, 6)
NUM_CLASSES = 150


def _conv(p, x, stride=1, padding=0, groups=1, bias=True):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride),
        ((padding, padding), (padding, padding)), feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"] if bias and "bias" in p else y


def _affine(p, x):  # folded BatchNorm
    return x * p["scale"] + p["bias"]


def _ln(p, x, eps):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def _resize(x, size):
    """bilinear align_corners=False, exact torch semantics (half-pixel
    centers with edge clamping — jax.image.resize diverges from torch at
    non-integer upscales because of its normalized-kernel edge handling)."""
    in_h, in_w = x.shape[1:3]
    oh, ow = size
    if (in_h, in_w) == (oh, ow):
        return x
    ys = jnp.clip((jnp.arange(oh) + 0.5) * (in_h / oh) - 0.5, 0, in_h - 1)
    xs = jnp.clip((jnp.arange(ow) + 0.5) * (in_w / ow) - 0.5, 0, in_w - 1)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, in_h - 1)
    x1 = jnp.minimum(x0 + 1, in_w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    g = lambda iy, ix: x[:, iy][:, :, ix]
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def _cblock(p, x):
    c = x.shape[-1]
    x = x + _conv(p["pos_embed"], x, padding=1, groups=c)
    h = _affine(p["norm1"], x)
    h = _conv(p["conv1"], h)
    h = _conv(p["attn"], h, padding=2, groups=c)
    h = _conv(p["conv2"], h)
    x = x + h
    h = _affine(p["norm2"], x)
    h = _conv(p["mlp_fc1"], h)
    h = jax.nn.gelu(h, approximate=False)
    h = _conv(p["mlp_fc2"], h)
    return x + h


def _sablock(p, x):
    b, hh, ww, c = x.shape
    x = x + _conv(p["pos_embed"], x, padding=1, groups=c)
    t = x.reshape(b, hh * ww, c)
    h = _ln(p["norm1"], t, 1e-6)
    heads = c // HEAD_DIM
    qkv = _dense(p["qkv"], h).reshape(b, hh * ww, 3, heads, HEAD_DIM)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * HEAD_DIM**-0.5, k,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v).transpose(0, 2, 1, 3).reshape(b, hh * ww, c)
    t = t + _dense(p["proj"], o)
    h = _ln(p["norm2"], t, 1e-6)
    h = _dense(p["mlp_fc2"], jax.nn.gelu(_dense(p["mlp_fc1"], h), approximate=False))
    t = t + h
    return t.reshape(b, hh, ww, c)


def _patch_embed(p, x, patch):
    x = _conv(p["proj"], x, stride=patch)
    return _ln(p["norm"], x, 1e-5)  # PatchEmbed uses default-eps LayerNorm


def _conv_module(p, x, k, padding=0):
    """mmseg ConvModule: conv (no bias) + folded BN + ReLU."""
    x = _conv(p, x, padding=padding, bias=False)
    return jax.nn.relu(_affine(p["bn"], x))


def _adaptive_avg_pool(x, out):
    """torch AdaptiveAvgPool2d semantics."""
    b, h, w, c = x.shape
    ys = [(h * i) // out for i in range(out)]
    ye = [-(-h * (i + 1) // out) for i in range(out)]
    xs = [(w * i) // out for i in range(out)]
    xe = [-(-w * (i + 1) // out) for i in range(out)]
    rows = []
    for i in range(out):
        cols = [
            x[:, ys[i]:ye[i], xs[j]:xe[j], :].mean(axis=(1, 2)) for j in range(out)
        ]
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # [b, out, out, c]


def uniformer_forward(params: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x [B,H,W,3] normalized -> 4 stage features (NHWC)."""
    outs = []
    for s in range(4):
        x = _patch_embed(params[f"patch_embed{s + 1}"], x, 4 if s == 0 else 2)
        for i in range(LAYERS[s]):
            blk = params[f"blocks{s + 1}_{i}"]
            x = _cblock(blk, x) if s < 2 else _sablock(blk, x)
        outs.append(_ln(params[f"stage_norm{s + 1}"], x, 1e-6))
    return outs


def upernet_forward(params: Dict, feats: List[jnp.ndarray]) -> jnp.ndarray:
    """4 stage features -> class logits at stage-1 resolution."""
    p = params
    # PSP over stage 4
    x4 = feats[3]
    psp = [x4]
    for i, scale in enumerate(POOL_SCALES):
        y = _adaptive_avg_pool(x4, scale)
        y = _conv_module(p[f"ppm_{i}"], y, 1)
        psp.append(_resize(y, x4.shape[1:3]))
    lat_top = _conv_module(p["bottleneck"], jnp.concatenate(psp, -1), 3, padding=1)

    laterals = [
        _conv_module(p[f"lateral_{i}"], feats[i], 1) for i in range(3)
    ] + [lat_top]
    for i in range(3, 0, -1):
        laterals[i - 1] = laterals[i - 1] + _resize(laterals[i], laterals[i - 1].shape[1:3])
    fpn = [
        _conv_module(p[f"fpn_{i}"], laterals[i], 3, padding=1) for i in range(3)
    ] + [laterals[3]]
    for i in range(3, 0, -1):
        fpn[i] = _resize(fpn[i], fpn[0].shape[1:3])
    out = _conv_module(p["fpn_bottleneck"], jnp.concatenate(fpn, -1), 3, padding=1)
    return _conv(p["conv_seg"], out)


def seg_logits(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    return upernet_forward(params, uniformer_forward(params, x))


# ---------------------------------------------------------------------------
# bridge
# ---------------------------------------------------------------------------

def _fold_bn(sd, k, eps=1e-5):
    w = np.asarray(sd[k + ".weight"], np.float32)
    b = np.asarray(sd[k + ".bias"], np.float32)
    mean = np.asarray(sd[k + ".running_mean"], np.float32)
    var = np.asarray(sd[k + ".running_var"], np.float32)
    scale = w / np.sqrt(var + eps)
    return {"scale": scale, "bias": b - mean * scale}


def convert_uniformer(sd: Dict[str, np.ndarray]) -> Dict:
    """upernet_global_small state dict -> params tree. Backbone keys are
    'backbone.*', head keys 'decode_head.*'."""
    t = lambda k: np.asarray(sd[k], np.float32)
    conv = lambda k, bias=True: {
        "kernel": t(k + ".weight").transpose(2, 3, 1, 0),
        **({"bias": t(k + ".bias")} if bias and k + ".bias" in sd else {}),
    }
    # depthwise torch [c,1,k,k] -> (k,k,1,c)
    dconv = lambda k: {"kernel": t(k + ".weight").transpose(2, 3, 1, 0),
                       "bias": t(k + ".bias")}
    lin = lambda k: {"kernel": t(k + ".weight").T, "bias": t(k + ".bias")}
    norm = lambda k: {"scale": t(k + ".weight"), "bias": t(k + ".bias")}

    p: Dict = {}
    for s in range(4):
        bpre = f"backbone.patch_embed{s + 1}"
        p[f"patch_embed{s + 1}"] = {"proj": conv(bpre + ".proj"), "norm": norm(bpre + ".norm")}
        p[f"stage_norm{s + 1}"] = norm(f"backbone.norm{s + 1}")
        for i in range(LAYERS[s]):
            src = f"backbone.blocks{s + 1}.{i}"
            if s < 2:
                p[f"blocks{s + 1}_{i}"] = {
                    "pos_embed": dconv(src + ".pos_embed"),
                    "norm1": _fold_bn(sd, src + ".norm1"),
                    "conv1": conv(src + ".conv1"),
                    "attn": dconv(src + ".attn"),
                    "conv2": conv(src + ".conv2"),
                    "norm2": _fold_bn(sd, src + ".norm2"),
                    "mlp_fc1": conv(src + ".mlp.fc1"),
                    "mlp_fc2": conv(src + ".mlp.fc2"),
                }
            else:
                p[f"blocks{s + 1}_{i}"] = {
                    "pos_embed": dconv(src + ".pos_embed"),
                    "norm1": norm(src + ".norm1"),
                    "qkv": lin(src + ".attn.qkv"),
                    "proj": lin(src + ".attn.proj"),
                    "norm2": norm(src + ".norm2"),
                    "mlp_fc1": lin(src + ".mlp.fc1"),
                    "mlp_fc2": lin(src + ".mlp.fc2"),
                }

    def conv_module(k):
        out = conv(k + ".conv", bias=False)
        out["bn"] = _fold_bn(sd, k + ".bn")
        return out

    h = "decode_head"
    for i in range(len(POOL_SCALES)):
        p[f"ppm_{i}"] = conv_module(f"{h}.psp_modules.{i}.1")
    p["bottleneck"] = conv_module(f"{h}.bottleneck")
    for i in range(3):
        p[f"lateral_{i}"] = conv_module(f"{h}.lateral_convs.{i}")
        p[f"fpn_{i}"] = conv_module(f"{h}.fpn_convs.{i}")
    p["fpn_bottleneck"] = conv_module(f"{h}.fpn_bottleneck")
    p["conv_seg"] = conv(f"{h}.conv_seg")
    return p


# ---------------------------------------------------------------------------
# detector
# ---------------------------------------------------------------------------

IMAGENET_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMAGENET_STD = np.array([58.395, 57.12, 57.375], np.float32)


class UniformerDetector:
    def __init__(self, params=None):
        if params is None:
            path = ensure_ckpt("upernet_global_small.pth")
            if os.path.exists(path):
                import torch

                sd = torch.load(path, map_location="cpu")
                sd = sd.get("state_dict", sd)
                params = jax.tree_util.tree_map(
                    jnp.asarray,
                    convert_uniformer({k: v.numpy() for k, v in sd.items()}),
                )
        self.params = params  # may stay None -> raise on call

        def fwd(params, x, out_h, out_w):
            logits = seg_logits(params, x)
            logits = _resize(logits, (out_h, out_w))
            return jnp.argmax(logits, axis=-1)

        self._fwd = jax.jit(fwd, static_argnums=(2, 3))

    def __call__(self, img: np.ndarray) -> np.ndarray:
        assert self.params is not None, (
            "UniformerDetector needs upernet_global_small.pth under the "
            "annotator ckpts dir"
        )
        H, W = img.shape[:2]
        # ade test pipeline: shorter side to 512, keep ratio, no padding
        # (the patch-embed convs floor non-divisible dims like the reference)
        scale = 512 / min(H, W)
        nh, nw = round(H * scale), round(W * scale)
        r = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        x = (r.astype(np.float32) - IMAGENET_MEAN) / IMAGENET_STD
        seg = np.asarray(self._fwd(self.params, jnp.asarray(x[None]), H, W))[0]
        palette = np.asarray(ADE_PALETTE, np.uint8)
        return palette[seg]
