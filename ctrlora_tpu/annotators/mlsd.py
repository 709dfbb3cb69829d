"""MLSD line-segment detector, Flax port (reference: annotator/mlsd —
MobileNetV2 FPN backbone + A/B/C fusion blocks, navervision/mlsd).

Eval-only: BatchNorms are folded into per-channel affines at bridge time.
Line decoding (sigmoid heatmap, 5x5 max-pool NMS, top-k, displacement map)
runs in jax; segment filtering on host (reference: utils.py:19-86).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import cv2
import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ctrlora_tpu.annotators.hed import ckpts_dir
from ctrlora_tpu.annotators.download import ensure_ckpt


class FoldedBN(nn.Module):
    """BatchNorm folded to affine (scale/bias from running stats)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return x * scale + bias


class ConvBNReLU6(nn.Module):
    """TFLite-padded conv + folded BN + ReLU6 (reference ConvBNReLU:
    stride-2 convs use explicit (0,1,0,1) padding)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        if s == 2:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            padding = ((0, 0), (0, 0))
        else:
            p = (k - 1) // 2
            padding = ((p, p), (p, p))
        cin = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, cin // self.groups, self.features), jnp.float32,
        )
        x = jax.lax.conv_general_dilated(
            x, w, (s, s), padding, feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = FoldedBN(name="bn")(x)
        return jnp.clip(x, 0.0, 6.0)


class InvertedResidual(nn.Module):
    out_ch: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        h = x
        if self.expand != 1:
            h = ConvBNReLU6(cin * self.expand, kernel_size=1, name="pw")(h)
        hidden = cin * self.expand
        h = ConvBNReLU6(hidden, stride=self.stride, groups=hidden, name="dw")(h)
        cin2 = h.shape[-1]
        w = self.param(
            "pwl_kernel", nn.initializers.lecun_normal(), (1, 1, cin2, self.out_ch)
        )
        h = jax.lax.conv_general_dilated(
            h, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        h = FoldedBN(name="pwl_bn")(h)
        if self.stride == 1 and cin == self.out_ch:
            return x + h
        return h


# (t, c, n, s) truncated MobileNetV2 (reference: mbv2_mlsd_large.py:173-181)
MBV2_SETTING = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2), (6, 96, 3, 1)]
FPN_SELECTED = [1, 3, 6, 10, 13]


class MLSDBackbone(nn.Module):
    @nn.compact
    def __call__(self, x):
        feats = []
        x = ConvBNReLU6(32, stride=2, name="feat0")(x)
        feats.append(x)
        idx = 1
        cin = 32
        for t, c, n, s in MBV2_SETTING:
            for i in range(n):
                x = InvertedResidual(
                    c, s if i == 0 else 1, t, name=f"feat{idx}"
                )(x)
                idx += 1
                feats.append(x)
        return [feats[i] for i in FPN_SELECTED]


def _bilinear_up2(x):
    """F.interpolate(scale=2, bilinear, align_corners=True)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


class BlockA(nn.Module):
    out_c1: int
    out_c2: int
    upscale: bool = True

    @nn.compact
    def __call__(self, a, b):
        conv = lambda f, name: ConvBNReLU6(f, kernel_size=1, name=name)
        # reference uses plain ReLU here; ReLU6 differs only above 6 —
        # BN-folded activations stay far below, but keep exact: use relu
        b = _conv_bn_relu(b, self.out_c2, 1, self, "conv1")
        a = _conv_bn_relu(a, self.out_c1, 1, self, "conv2")
        if self.upscale:
            b = _bilinear_up2_align(b)
        return jnp.concatenate([a, b], axis=-1)


def _conv_bn_relu(x, features, k, mod, name):
    cin = x.shape[-1]
    w = mod.param(
        f"{name}_kernel", nn.initializers.lecun_normal(), (k, k, cin, features)
    )
    bias = mod.param(f"{name}_cbias", nn.initializers.zeros, (features,))
    p = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    y = y * mod.param(f"{name}_bn_scale", nn.initializers.ones, (features,))
    y = y + mod.param(f"{name}_bn_bias", nn.initializers.zeros, (features,))
    return nn.relu(y)


def _bilinear_up2_align(x):
    """align_corners=True bilinear 2x (torch semantics)."""
    b, h, w, c = x.shape
    yy = jnp.linspace(0.0, h - 1.0, 2 * h)
    xx = jnp.linspace(0.0, w - 1.0, 2 * w)
    y0 = jnp.floor(yy).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (yy - y0)[None, :, None, None]
    wx = (xx - x0)[None, None, :, None]
    g = lambda iy, ix: x[:, iy][:, :, ix]
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


class BlockB(nn.Module):
    out_c: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        x = x + _conv_bn_relu(x, cin, 3, self, "conv1")
        return _conv_bn_relu(x, self.out_c, 3, self, "conv2")


class BlockC(nn.Module):
    out_c: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        # dilated 3x3 (dilation 5, pad 5)
        w = self.param(
            "conv1_kernel", nn.initializers.lecun_normal(), (3, 3, cin, cin)
        )
        b1 = self.param("conv1_cbias", nn.initializers.zeros, (cin,))
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((5, 5), (5, 5)), rhs_dilation=(5, 5),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b1
        y = nn.relu(
            y * self.param("conv1_bn_scale", nn.initializers.ones, (cin,))
            + self.param("conv1_bn_bias", nn.initializers.zeros, (cin,))
        )
        y = _conv_bn_relu(y, cin, 3, self, "conv2")
        w3 = self.param(
            "conv3_kernel", nn.initializers.lecun_normal(), (1, 1, cin, self.out_c)
        )
        b3 = self.param("conv3_bias", nn.initializers.zeros, (self.out_c,))
        return jax.lax.conv_general_dilated(
            y, w3, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b3


class MobileV2MLSDLarge(nn.Module):
    @nn.compact
    def __call__(self, x):
        c1, c2, c3, c4, c5 = MLSDBackbone(name="backbone")(x)
        x = BlockA(64, 64, upscale=False, name="block15")(c4, c5)
        x = BlockB(64, name="block16")(x)
        x = BlockA(64, 64, name="block17")(c3, x)
        x = BlockB(64, name="block18")(x)
        x = BlockA(64, 64, name="block19")(c2, x)
        x = BlockB(64, name="block20")(x)
        x = BlockA(64, 64, name="block21")(c1, x)
        x = BlockB(64, name="block22")(x)
        x = BlockC(16, name="block23")(x)
        return x[:, :, :, 7:]  # last 9 channels: center + 4 displacement (+4)


# ---------------------------------------------------------------------------
# bridge
# ---------------------------------------------------------------------------

def _fold_bn(sd, prefix, eps=1e-5):
    w = np.asarray(sd[prefix + ".weight"], np.float32)
    b = np.asarray(sd[prefix + ".bias"], np.float32)
    mean = np.asarray(sd[prefix + ".running_mean"], np.float32)
    var = np.asarray(sd[prefix + ".running_var"], np.float32)
    scale = w / np.sqrt(var + eps)
    return scale, b - mean * scale


def convert_mlsd(sd) -> dict:
    conv_w = lambda k: np.asarray(sd[k], np.float32).transpose(2, 3, 1, 0)
    # depthwise torch weight [c,1,k,k] -> HWIO with groups=c: (k,k,1,c)
    dw_w = lambda k: np.asarray(sd[k], np.float32).transpose(2, 3, 1, 0)

    p: dict = {"backbone": {}}

    def cbr(dst, tpre, depthwise=False):
        dst["kernel"] = dw_w(tpre + ".0.weight") if depthwise else conv_w(tpre + ".0.weight")
        s, b = _fold_bn(sd, tpre + ".1")
        dst["bn"] = {"scale": s, "bias": b}

    bb = p["backbone"]
    bb["feat0"] = {}
    cbr(bb["feat0"], "backbone.features.0")
    idx = 1
    for t, c, n, s in MBV2_SETTING:
        for i in range(n):
            node: dict = {}
            tpre = f"backbone.features.{idx}.conv"
            j = 0
            if t != 1:
                node["pw"] = {}
                cbr(node["pw"], f"{tpre}.{j}")
                j += 1
            node["dw"] = {}
            cbr(node["dw"], f"{tpre}.{j}", depthwise=True)
            j += 1
            node["pwl_kernel"] = conv_w(f"{tpre}.{j}.weight")
            sc, bi = _fold_bn(sd, f"{tpre}.{j + 1}")
            node["pwl_bn"] = {"scale": sc, "bias": bi}
            bb[f"feat{idx}"] = node
            idx += 1

    def ab_conv(dst, name, tpre):
        dst[f"{name}_kernel"] = conv_w(tpre + ".0.weight")
        dst[f"{name}_cbias"] = np.asarray(sd[tpre + ".0.bias"], np.float32)
        s, b = _fold_bn(sd, tpre + ".1")
        dst[f"{name}_bn_scale"] = s
        dst[f"{name}_bn_bias"] = b

    for blk in (15, 17, 19, 21):
        node = {}
        ab_conv(node, "conv1", f"block{blk}.conv1")
        ab_conv(node, "conv2", f"block{blk}.conv2")
        p[f"block{blk}"] = node
    for blk in (16, 18, 20, 22):
        node = {}
        ab_conv(node, "conv1", f"block{blk}.conv1")
        ab_conv(node, "conv2", f"block{blk}.conv2")
        p[f"block{blk}"] = node
    node = {}
    ab_conv(node, "conv1", "block23.conv1")
    ab_conv(node, "conv2", "block23.conv2")
    node["conv3_kernel"] = conv_w("block23.conv3.weight")
    node["conv3_bias"] = np.asarray(sd["block23.conv3.bias"], np.float32)
    p["block23"] = node
    return {"params": p}


# ---------------------------------------------------------------------------
# detector
# ---------------------------------------------------------------------------

def decode_lines(tp_map: np.ndarray, topk: int = 200, ksize: int = 3,
                 score_thr: float = 0.1, dist_thr: float = 20.0) -> np.ndarray:
    """tp_map [H,W,9] -> line segments [N,4] in 256-res coords (reference:
    utils.py:19-86)."""
    center = tp_map[:, :, 0]
    disp = tp_map[:, :, 1:5]
    heat = 1.0 / (1.0 + np.exp(-center))
    hmax = cv2.dilate(heat, np.ones((ksize, ksize)))
    heat = np.where(hmax == heat, heat, 0.0)
    flat = heat.reshape(-1)
    idx = np.argpartition(flat, -topk)[-topk:]
    idx = idx[np.argsort(-flat[idx])]
    w = heat.shape[1]
    segs = []
    dist_map = np.sqrt(((disp[:, :, :2] - disp[:, :, 2:]) ** 2).sum(-1))
    for i in idx:
        y, x = divmod(int(i), w)
        if flat[i] > score_thr and dist_map[y, x] > dist_thr:
            dx0, dy0, dx1, dy1 = disp[y, x]
            segs.append([x + dx0, y + dy0, x + dx1, y + dy1])
    return np.asarray(segs, np.float32).reshape(-1, 4)


class MLSDdetector:
    def __init__(self, params=None):
        self.model = MobileV2MLSDLarge()
        if params is None:
            path = ensure_ckpt("mlsd_large_512_fp32.pth")
            if os.path.exists(path):
                import torch

                sd = {k: v.numpy() for k, v in torch.load(path, map_location="cpu").items()}
                params = jax.tree_util.tree_map(jnp.asarray, convert_mlsd(sd))
            else:
                params = self.model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 4)))
        self.params = params
        self._apply = jax.jit(self.model.apply)

    def __call__(self, input_image: np.ndarray, thr_v: float = 0.1,
                 thr_d: float = 0.1) -> np.ndarray:
        """Runs at the input resolution (reference MLSDdetector passes the
        image's own shape as input_shape, mlsd/__init__.py:37)."""
        assert input_image.ndim == 3
        img = input_image
        out = np.zeros_like(img)
        h, w = img.shape[:2]
        feed = np.concatenate([img, np.ones((h, w, 1))], axis=-1).astype(np.float32)
        x = jnp.asarray(feed[None] / 127.5 - 1.0)
        tp_map = np.asarray(self._apply(self.params, x))[0]
        lines = 2 * decode_lines(tp_map, 200, 3, thr_v, thr_d)  # half-res map
        for x0, y0, x1, y1 in lines.astype(int):
            cv2.line(out, (x0, y0), (x1, y1), (255, 255, 255), 1)
        return out[:, :, 0]
