"""PiDiNet edge detector, Flax port (reference: annotator/pidinet —
pixel-difference convolutions, 'carv4' config, dil=24, sa=True).

The pixel-difference convolutions (cd/ad/rd) are pure kernel transforms, so
we convert them to vanilla convs at bridge time (exactly the reference's own
PDCBlock_converted path, model.py:438-466) and run a plain conv network:

  cd: subtract the kernel's channel-sum from the center tap
  ad: subtract the clockwise-rotated kernel
  rd: scatter the 8 outer taps (+/-) into a 5x5 radial-difference kernel
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from ctrlora_tpu.annotators.hed import ckpts_dir
from ctrlora_tpu.annotators.download import ensure_ckpt
from ctrlora_tpu.annotators.util import safe_step

CARV4 = ["cd", "ad", "rd", "cv"] * 4
PLANES = 60
DIL = 24


def convert_pdc(op: str, w: np.ndarray) -> np.ndarray:
    """torch [out,in,3,3] pdc kernel -> vanilla conv kernel (3x3 or 5x5)."""
    w = np.asarray(w, np.float32)
    if op == "cv":
        return w
    if op == "cd":
        out = w.copy()
        out[:, :, 1, 1] -= w.sum(axis=(2, 3))
        return out
    if op == "ad":
        flat = w.reshape(*w.shape[:2], 9)
        perm = [3, 0, 1, 6, 4, 2, 7, 8, 5]
        return (flat - flat[:, :, perm]).reshape(w.shape)
    if op == "rd":
        o, i = w.shape[:2]
        buf = np.zeros((o, i, 25), np.float32)
        flat = w.reshape(o, i, 9)
        buf[:, :, [0, 2, 4, 10, 14, 20, 22, 24]] = flat[:, :, 1:]
        buf[:, :, [6, 7, 8, 11, 13, 16, 17, 18]] = -flat[:, :, 1:]
        return buf.reshape(o, i, 5, 5)
    raise ValueError(op)


def _conv(x, p, stride=1, padding=0, dilation=1, groups=1):
    k = p["kernel"]
    pad = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x, k, (stride, stride), pad, rhs_dilation=(dilation, dilation),
        feature_group_count=groups, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"]
    return y


def _pdc_block(params, x, op: str, stride: int):
    if stride > 1:
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
    c = x.shape[-1]
    kh = params["conv1"]["kernel"].shape[0]
    y = _conv(x, params["conv1"], padding=(kh - 1) // 2, groups=c)
    y = jax.nn.relu(y)
    y = _conv(y, params["conv2"])
    if stride > 1:
        x = _conv(x, params["shortcut"])
    return y + x


def _cdcm(params, x):
    x = jax.nn.relu(x)
    x = _conv(x, params["conv1"])
    return sum(
        _conv(x, params[f"conv2_{i}"], padding=d, dilation=d)
        for i, d in zip(range(1, 5), (5, 7, 9, 11))
    )


def _csam(params, x):
    y = jax.nn.relu(x)
    y = _conv(y, params["conv1"])
    y = _conv(y, params["conv2"], padding=1)
    return x * jax.nn.sigmoid(y)


def pidinet_forward(params: Dict, x: jnp.ndarray):
    """x [1,H,W,3] -> list of 5 sigmoid edge maps [1,H,W,1] (reference:
    model.py:562-619, sa+dil variant)."""
    H, W = x.shape[1:3]
    h = _conv(x, params["init_block"], padding=(params["init_block"]["kernel"].shape[0] - 1) // 2)
    feats = []
    idx = 1
    stage_specs = [(3, 1), (4, 2), (4, 2), (4, 2)]
    for s, (n_blocks, first_stride) in enumerate(stage_specs):
        for b in range(n_blocks):
            stride = first_stride if b == 0 and s > 0 else 1
            h = _pdc_block(params[f"block{s + 1}_{b + 1}"], h, CARV4[idx], stride)
            idx += 1
        feats.append(h)
    outs = []
    for i, xi in enumerate(feats):
        y = _csam(params[f"attention_{i}"], _cdcm(params[f"dilation_{i}"], xi))
        e = _conv(y, params[f"reduce_{i}"])
        e = jax.image.resize(e, (e.shape[0], H, W, 1), method="bilinear")
        outs.append(e)
    fused = _conv(jnp.concatenate(outs, axis=-1), params["classifier"])
    return [jax.nn.sigmoid(o) for o in outs + [fused]]


def convert_pidinet(sd: Dict[str, np.ndarray]) -> Dict:
    """torch table5_pidinet state dict -> flax tree (pdc kernels converted)."""
    sd = {k.replace("module.", ""): np.asarray(v, np.float32) for k, v in sd.items()}
    hwio = lambda w: w.transpose(2, 3, 1, 0)

    def conv(prefix, pdc: Optional[str] = None, depthwise=False):
        w = sd[prefix + ".weight"]
        if pdc is not None:
            w = convert_pdc(pdc, w)
        if depthwise:
            w = w.transpose(2, 3, 1, 0)  # [c,1,k,k] -> [k,k,1,c]
        else:
            w = hwio(w)
        out = {"kernel": w}
        if prefix + ".bias" in sd:
            out["bias"] = sd[prefix + ".bias"]
        return out

    p: Dict = {"init_block": conv("init_block", CARV4[0])}
    idx = 1
    for s, n_blocks in enumerate((3, 4, 4, 4)):
        for b in range(n_blocks):
            name = f"block{s + 1}_{b + 1}"
            node = {
                "conv1": conv(f"{name}.conv1", CARV4[idx], depthwise=True),
                "conv2": conv(f"{name}.conv2"),
            }
            if f"{name}.shortcut.weight" in sd:
                node["shortcut"] = conv(f"{name}.shortcut")
            p[name] = node
            idx += 1
    for i in range(4):
        p[f"dilation_{i}"] = {
            "conv1": conv(f"dilations.{i}.conv1"),
            **{f"conv2_{j}": conv(f"dilations.{i}.conv2_{j}") for j in range(1, 5)},
        }
        p[f"attention_{i}"] = {
            "conv1": conv(f"attentions.{i}.conv1"),
            "conv2": conv(f"attentions.{i}.conv2"),
        }
        p[f"reduce_{i}"] = conv(f"conv_reduces.{i}.conv")
    p["classifier"] = conv("classifier")
    return p


def init_random_pidinet(rng: np.random.Generator) -> Dict:
    """Shape-correct random params for tests (already-converted kernels)."""
    def mk(kh, cin, cout, bias=True, depthwise=False):
        shape = (kh, kh, 1 if depthwise else cin, cout)
        d = {"kernel": rng.standard_normal(shape).astype(np.float32) * 0.05}
        if bias:
            d["bias"] = np.zeros(cout, np.float32)
        return d

    p = {"init_block": mk(3, 3, PLANES, bias=False)}
    chans = [PLANES, PLANES * 2, PLANES * 4, PLANES * 4]
    idx = 1
    cin = PLANES
    for s, n_blocks in enumerate((3, 4, 4, 4)):
        for b in range(n_blocks):
            cout = chans[s]
            kh = 5 if CARV4[idx] == "rd" else 3
            node = {
                "conv1": mk(kh, cin if b else cin, cin if b else cin, bias=False, depthwise=True),
                "conv2": mk(1, cin, cout, bias=False),
            }
            if b == 0 and s > 0:
                node["shortcut"] = mk(1, cin, cout)
            p[f"block{s + 1}_{b + 1}"] = node
            cin = cout
            idx += 1
    for i in range(4):
        p[f"dilation_{i}"] = {
            "conv1": mk(1, chans[i], DIL),
            **{f"conv2_{j}": mk(3, DIL, DIL, bias=False) for j in range(1, 5)},
        }
        p[f"attention_{i}"] = {"conv1": mk(1, DIL, 4), "conv2": mk(3, 4, 1, bias=False)}
        p[f"reduce_{i}"] = mk(1, DIL, 1)
    p["classifier"] = mk(1, 4, 1)
    return p


class PidiNetDetector:
    def __init__(self, params=None):
        if params is None:
            path = ensure_ckpt("table5_pidinet.pth")
            if os.path.exists(path):
                import torch

                sd = torch.load(path, map_location="cpu")["state_dict"]
                params = jax.tree_util.tree_map(
                    jnp.asarray, convert_pidinet({k: v.numpy() for k, v in sd.items()})
                )
            else:
                params = jax.tree_util.tree_map(
                    jnp.asarray, init_random_pidinet(np.random.default_rng(0))
                )
        self.params = params
        self._fwd = jax.jit(lambda p, x: pidinet_forward(p, x)[-1])

    def __call__(self, input_image: np.ndarray, safe: bool = False) -> np.ndarray:
        assert input_image.ndim == 3
        x = input_image[:, :, ::-1].astype(np.float32) / 255.0  # reference feeds BGR
        edge = np.asarray(self._fwd(self.params, jnp.asarray(x[None])))[0, :, :, 0]
        if safe:
            edge = safe_step(edge)
        return (edge * 255.0).clip(0, 255).astype(np.uint8)
