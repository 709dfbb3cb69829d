"""MSDeformAttn pixel decoder (functional JAX port).

Reference: annotator/oneformer/oneformer/modeling/pixel_decoder/msdeformattn.py
+ ops/modules/ms_deform_attn.py (the pure-pytorch grid_sample path, which is
the semantics the shipped weights were evaluated with here).

The deformable-attention sampling is implemented as a vectorized 4-corner
gather (bilinear, zeros padding, align_corners=False — exactly
F.grid_sample's arithmetic), which XLA lowers to dynamic-gathers — static
shapes, no host loops.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PixelDecoderConfig:
    conv_dim: int = 256
    mask_dim: int = 256
    nheads: int = 8
    dim_feedforward: int = 1024
    enc_layers: int = 6
    enc_points: int = 4
    # input features, high->low res; the deformable encoder consumes the
    # last three, the FPN lateral consumes res2
    in_channels: Tuple[int, ...] = (192, 384, 768, 1536)  # res2..res5 (swin-L)


def _dense(p, x):
    y = x @ p["kernel"]
    return y + p["bias"] if "bias" in p else y


def _ln(p, x, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _gn32(p, x, eps=1e-5):
    """GroupNorm(32) over NHWC."""
    b, h, w, c = x.shape
    g = 32
    xg = x.reshape(b, h * w, g, c // g)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return xg.reshape(b, h, w, c) * p["scale"] + p["bias"]


def _conv(p, x, stride=1, padding=0):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"] if "bias" in p else y


def sine_position_embedding(h: int, w: int, num_pos_feats: int) -> np.ndarray:
    """PositionEmbeddingSine(normalize=True) over an unmasked [h, w] map ->
    [h, w, 2*num_pos_feats] (reference: position_encoding.py:32-55)."""
    eps, scale = 1e-6, 2 * math.pi
    y = (np.arange(h, dtype=np.float32) + 1.0)[:, None] / (h + eps) * scale
    x = (np.arange(w, dtype=np.float32) + 1.0)[None, :] / (w + eps) * scale
    y = np.broadcast_to(y, (h, w))
    x = np.broadcast_to(x, (h, w))
    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / num_pos_feats)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    inter = lambda p: np.stack([np.sin(p[..., 0::2]), np.cos(p[..., 1::2])], -1).reshape(h, w, -1)
    return np.concatenate([inter(py), inter(px)], axis=-1)


def _bilinear_gather(value: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray):
    """F.grid_sample(bilinear, zeros, align_corners=False) equivalent.
    value [B, H, W, M, D]; gx/gy [B, Q, M, P] in [-1, 1] grid coords.
    Returns [B, Q, M, P, D]."""
    b, hh, ww, m, d = value.shape
    x = (gx + 1.0) * ww / 2.0 - 0.5
    y = (gy + 1.0) * hh / 2.0 - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    flat = value.reshape(b, hh * ww, m, d)

    def corner(xi, yi, wgt):
        inb = (xi >= 0) & (xi <= ww - 1) & (yi >= 0) & (yi <= hh - 1)
        xi_c = jnp.clip(xi, 0, ww - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, hh - 1).astype(jnp.int32)
        idx = (yi_c * ww + xi_c).transpose(0, 1, 3, 2)  # [B, Q, P, M]
        q, p = idx.shape[1], idx.shape[2]
        # one gather per (batch, head) over the flattened map
        g = jnp.take_along_axis(flat, idx.reshape(b, q * p, m)[..., None], axis=1)
        g = g.reshape(b, q, p, m, d).transpose(0, 1, 3, 2, 4)  # [B, Q, M, P, D]
        return g * (wgt * inb.astype(value.dtype))[..., None]

    return (
        corner(x0, y0, (1 - wx1) * (1 - wy1))
        + corner(x0 + 1, y0, wx1 * (1 - wy1))
        + corner(x0, y0 + 1, (1 - wx1) * wy1)
        + corner(x0 + 1, y0 + 1, wx1 * wy1)
    )


def ms_deform_attn(
    p: Dict,
    query: jnp.ndarray,            # [B, Lq, C]
    reference_points: jnp.ndarray,  # [B, Lq, L, 2] in [0, 1]
    value_flat: jnp.ndarray,        # [B, S, C]
    shapes: Sequence[Tuple[int, int]],
    nheads: int,
    npoints: int,
):
    b, lq, c = query.shape
    L = len(shapes)
    m, d = nheads, c // nheads
    value = _dense(p["value_proj"], value_flat).reshape(b, -1, m, d)
    off = _dense(p["sampling_offsets"], query).reshape(b, lq, m, L, npoints, 2)
    attn = _dense(p["attention_weights"], query).reshape(b, lq, m, L * npoints)
    attn = jax.nn.softmax(attn, axis=-1).reshape(b, lq, m, L, npoints)

    normalizer = jnp.asarray([[wi, hi] for hi, wi in shapes], jnp.float32)
    loc = reference_points[:, :, None, :, None, :] + off / normalizer[None, None, None, :, None, :]
    grids = 2 * loc - 1  # [B, Lq, M, L, P, 2]

    start = 0
    out = jnp.zeros((b, lq, m, d), value.dtype)
    for lid, (hh, wi) in enumerate(shapes):
        v_l = value[:, start : start + hh * wi].reshape(b, hh, wi, m, d)
        gx = grids[:, :, :, lid, :, 0]
        gy = grids[:, :, :, lid, :, 1]
        sampled = _bilinear_gather(v_l, gx, gy)  # [B, Lq, M, P, D]
        out = out + jnp.einsum("bqmpd,bqmp->bqmd", sampled, attn[:, :, :, lid])
        start += hh * wi
    return _dense(p["output_proj"], out.reshape(b, lq, c))


def _enc_layer(p, src, pos, ref, shapes, cfg: PixelDecoderConfig):
    q = src + pos
    src2 = ms_deform_attn(
        p["self_attn"], q, ref, src, shapes, cfg.nheads, cfg.enc_points
    )
    src = _ln(p["norm1"], src + src2)
    h = jax.nn.relu(_dense(p["linear1"], src))
    src = _ln(p["norm2"], src + _dense(p["linear2"], h))
    return src


def _reference_points(shapes) -> np.ndarray:
    """[sum(HW), L, 2] center-of-pixel references (valid_ratios = 1)."""
    pts = []
    for h, w in shapes:
        ry = (np.linspace(0.5, h - 0.5, h, dtype=np.float32)) / h
        rx = (np.linspace(0.5, w - 0.5, w, dtype=np.float32)) / w
        gy, gx = np.meshgrid(ry, rx, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref = np.concatenate(pts, 0)  # [S, 2]
    return np.broadcast_to(ref[:, None, :], (ref.shape[0], len(shapes), 2)).copy()


def pixel_decoder_forward(params: Dict, feats: Dict[str, jnp.ndarray], cfg: PixelDecoderConfig):
    """feats: {'res2'..'res5'} NHWC -> (mask_features [B,H/4,W/4,mask_dim],
    multi_scale_features [1/32, 1/16, 1/8] NHWC)."""
    b = feats["res2"].shape[0]
    c = cfg.conv_dim
    # deformable encoder inputs, top-down: res5, res4, res3
    srcs, pos, shapes = [], [], []
    for i, name in enumerate(("res5", "res4", "res3")):
        x = feats[name]
        h, w = x.shape[1], x.shape[2]
        proj = params[f"input_proj_{i}"]
        y = _conv(proj["conv"], x)
        y = _gn32_flat(proj["norm"], y)
        srcs.append(y.reshape(b, h * w, c))
        pe = sine_position_embedding(h, w, c // 2).reshape(h * w, c)
        pos.append(jnp.asarray(pe)[None] + params["level_embed"][i][None, None])
        shapes.append((h, w))

    src = jnp.concatenate(srcs, axis=1)
    posx = jnp.concatenate(pos, axis=1)
    ref = jnp.asarray(_reference_points(shapes))[None]
    for li in range(cfg.enc_layers):
        src = _enc_layer(params[f"enc_{li}"], src, posx, ref, shapes, cfg)

    outs = []
    start = 0
    for (h, w) in shapes:
        outs.append(src[:, start : start + h * w].reshape(b, h, w, c))
        start += h * w

    # FPN: res2 lateral + upsampled 1/8 map
    x2 = feats["res2"]
    lat = _gn32(params["adapter_1"]["norm"], _conv(params["adapter_1"]["conv"], x2))
    up = _resize_bilinear(outs[-1], (x2.shape[1], x2.shape[2]))
    y = lat + up
    y = jax.nn.relu(
        _gn32(params["layer_1"]["norm"], _conv(params["layer_1"]["conv"], y, padding=1))
    )
    mask_features = _conv(params["mask_features"], y)
    return mask_features, outs  # outs = [1/32, 1/16, 1/8]


def _gn32_flat(p, x, eps=1e-5):
    return _gn32(p, x, eps)


def _resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False) on NHWC."""
    b, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * (h / oh) - 0.5
    xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * (w / ow) - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    top = x[:, y0i][:, :, x0i] * (1 - wx)[None, None, :, None] + x[:, y0i][:, :, x1i] * wx[None, None, :, None]
    bot = x[:, y1i][:, :, x0i] * (1 - wx)[None, None, :, None] + x[:, y1i][:, :, x1i] * wx[None, None, :, None]
    return top * (1 - wy)[None, :, None, None] + bot * wy[None, :, None, None]
