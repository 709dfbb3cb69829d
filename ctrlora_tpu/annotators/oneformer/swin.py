"""Swin Transformer backbone (functional JAX port).

Reference: annotator/oneformer/oneformer/modeling/backbone/swin.py
(D2SwinTransformer over the Microsoft Swin impl). Semantics preserved
exactly: patch embed with right/bottom padding, per-stage window attention
with relative position bias, cyclic-shift masking, patch merging after each
of the first 3 stages, per-out-index LayerNorms, outputs {'res2'..'res5'}
NHWC. fp32 throughout — the annotator runs once per image; fidelity over
throughput.

Window/shift masks and relative-position indices are computed with numpy at
trace time (shapes are static under jit), so the compiled graph is pure
reshapes + matmuls on the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 192
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (6, 12, 24, 48)
    window_size: int = 12
    patch_size: int = 4
    mlp_ratio: float = 4.0
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)


def _ln(p, x, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _dense(p, x):
    y = x @ p["kernel"]
    return y + p["bias"] if "bias" in p else y


def relative_position_index(ws: int) -> np.ndarray:
    """[ws*ws, ws*ws] lookup into the (2ws-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _shift_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """[nW, N, N] additive mask (-100 across shifted-window seams)."""
    img = np.zeros((hp, wp))
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[h, w] = cnt
            cnt += 1
    win = img.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_attention(p, x, *, num_heads, ws, mask):
    """x [B_, N, C] (B_ = B*nW, N = ws*ws); mask [nW, N, N] or None."""
    b_, n, c = x.shape
    d = c // num_heads
    qkv = _dense(p["qkv"], x).reshape(b_, n, 3, num_heads, d)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    attn = jnp.einsum("bhqd,bhkd->bhqk", q * (d**-0.5), k)
    idx = relative_position_index(ws).reshape(-1)
    bias = p["relative_position_bias_table"][idx].reshape(n, n, num_heads)
    attn = attn + bias.transpose(2, 0, 1)[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(b_ // nw, nw, num_heads, n, n) + mask[None, :, None]
        attn = attn.reshape(b_, num_heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3).reshape(b_, n, c)
    return _dense(p["proj"], out)


def _block(p, x, *, h, w, num_heads, ws, shift):
    b, l, c = x.shape
    shortcut = x
    x = _ln(p["norm1"], x).reshape(b, h, w, c)

    pad_r = (ws - w % ws) % ws
    pad_b = (ws - h % ws) % ws
    if pad_r or pad_b:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    hp, wp = h + pad_b, w + pad_r

    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        mask = jnp.asarray(_shift_mask(hp, wp, ws, shift))
    else:
        mask = None

    xw = x.reshape(b, hp // ws, ws, wp // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(-1, ws * ws, c)
    xw = _window_attention(p["attn"], xw, num_heads=num_heads, ws=ws, mask=mask)
    x = xw.reshape(b, hp // ws, wp // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, hp, wp, c)

    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    if pad_r or pad_b:
        x = x[:, :h, :w]
    x = shortcut + x.reshape(b, l, c)

    h2 = _ln(p["norm2"], x)
    h2 = _dense(p["mlp"]["fc2"], jax.nn.gelu(_dense(p["mlp"]["fc1"], h2), approximate=False))
    return x + h2


def _patch_merging(p, x, h, w):
    b, l, c = x.shape
    x = x.reshape(b, h, w, c)
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
    x = x.reshape(b, -1, 4 * c)
    x = _ln(p["norm"], x)
    return _dense(p["reduction"], x)


def swin_forward(params: Dict, x: jnp.ndarray, cfg: SwinConfig) -> Dict[str, jnp.ndarray]:
    """x [B, H, W, 3] normalized fp32 -> {'res2'..'res5'} NHWC."""
    b, h, w, _ = x.shape
    ps = cfg.patch_size
    if w % ps:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, ps - w % ps), (0, 0)))
    if h % ps:
        x = jnp.pad(x, ((0, 0), (0, ps - h % ps), (0, 0), (0, 0)))
    pe = params["patch_embed"]
    x = jax.lax.conv_general_dilated(
        x, pe["proj"]["kernel"], (ps, ps), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + pe["proj"]["bias"]
    wh, ww = x.shape[1], x.shape[2]
    x = x.reshape(b, wh * ww, cfg.embed_dim)
    x = _ln(pe["norm"], x)

    outs = {}
    for i, depth in enumerate(cfg.depths):
        lp = params[f"layers_{i}"]
        nh = cfg.num_heads[i]
        # the reference keeps window_size fixed, pads, and always shifts odd
        # blocks (the seam mask handles correctness) — swin.py:388,414-433
        ws = cfg.window_size
        for j in range(depth):
            shift = 0 if j % 2 == 0 else ws // 2
            x = _block(
                lp[f"blocks_{j}"], x, h=wh, w=ww, num_heads=nh, ws=ws,
                shift=shift,
            )
        if i in cfg.out_indices:
            xo = _ln(params[f"norm{i}"], x)
            outs[f"res{i + 2}"] = xo.reshape(b, wh, ww, -1)
        if i < len(cfg.depths) - 1:
            x = _patch_merging(lp["downsample"], x, wh, ww)
            wh, ww = (wh + 1) // 2, (ww + 1) // 2
    return outs
