"""ZoeDepth metric-depth estimator, Flax/functional port (reference:
annotator/zoe — ZoeD_M12_N.pt, "ZoeDepth: Combining relative and metric
depth", isl-org/ZoeDepth).

Architecture (reference annotator/zoe/zoedepth/):
  * backbone: BEiT-L/16-384 (midas_repo backbones/beit.py) — per-block
    relative position biases interpolated to the runtime window, separate
    q/v biases (k bias fixed at zero), layer-scale gammas; taps at blocks
    [5, 11, 17, 23].
  * DPT neck + relative-depth head (midas_repo dpt_depth.py) with 'project'
    readout; hooks capture the 32-ch head activation ('out_conv'), the
    bottleneck ('l4_rn') and the four refinenet outputs (base_models/
    midas.py:298-318).
  * metric head (models/zoedepth/zoedepth_v1.py): seed bin regressor
    (softplus, 64 bins), bin-embedding projectors, 4 inverse attractors
    (alpha=1000, gamma=2, kind='mean'), conditional log-binomial output at
    full resolution; depth = sum(probs * bin_centers).
  * inference protocol (models/depth_model.py): reflect-pad augmentation,
    'minimal' keep-aspect resize to [384, 512] (multiple of 32,
    align_corners=True), horizontal-flip averaging, bicubic upsample back.

Eval-only; no BatchNorms anywhere (LayerNorm only), so the bridge is a pure
relayout of ZoeD_M12_N.pt.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ctrlora_tpu.annotators.hed import ckpts_dir
from ctrlora_tpu.annotators.download import ensure_ckpt
from ctrlora_tpu.annotators.midas import _conv, _convT, _dense, _fusion, _ln, _up2_align
from ctrlora_tpu.annotators.uniformer import _resize  # torch bilinear, align=False

BEIT_DIM = 1024
BEIT_LAYERS = 24
BEIT_HEADS = 16
HOOKS = (5, 11, 17, 23)
REASSEMBLE = (256, 512, 1024, 1024)
TRAIN_WINDOW = 24  # 384 // 16
N_BINS = 64
ATTRACTORS = (16, 8, 4, 1)
# config says attractor_alpha=1000 but the reference never passes it down:
# AttractorLayerUnnormed.forward calls inv_attractor(dx) bare, so the
# function defaults alpha=300, gamma=2 apply (attractor.py:45,194)
ATTR_ALPHA = 300.0
ATTR_GAMMA = 2
MIN_TEMP = 0.0212
MAX_TEMP = 50.0


def gen_relative_position_index(Wh: int, Ww: int) -> np.ndarray:
    """Port of timm.models.beit.gen_relative_position_index (numpy)."""
    num_rel = (2 * Wh - 1) * (2 * Ww - 1) + 3
    coords = np.stack(np.meshgrid(np.arange(Wh), np.arange(Ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel = rel.copy()
    rel[:, :, 0] += Wh - 1
    rel[:, :, 1] += Ww - 1
    rel[:, :, 0] *= 2 * Ww - 1
    n = Wh * Ww
    idx = np.zeros((n + 1, n + 1), np.int32)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel - 3
    idx[0:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx


def _rel_pos_bias(table: jnp.ndarray, Wh: int, Ww: int) -> jnp.ndarray:
    """Interpolate the (2*24-1)^2+3 bias table to the runtime window and
    gather the per-pair bias (midas_repo beit.py:29-61, quirks preserved:
    the table is reshaped (width, height) before bilinear interp)."""
    old = 2 * TRAIN_WINDOW - 1
    nh, nw = 2 * Wh - 1, 2 * Ww - 1
    sub = table[: old * old]
    if (nh, nw) != (old, old):
        arr = sub.reshape(old, old, BEIT_HEADS)
        arr = _resize(arr[None], (nh, nw))[0]
        sub = arr.reshape(nh * nw, BEIT_HEADS)
    full = jnp.concatenate([sub, table[old * old:]], axis=0)
    idx = gen_relative_position_index(Wh, Ww)
    n = Wh * Ww + 1
    bias = full[idx.reshape(-1)].reshape(n, n, BEIT_HEADS)
    return bias.transpose(2, 0, 1)[None]


def _beit_block(p: Dict, x: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    h = _ln(p["norm1"], x)
    b, s, d = h.shape
    qkv = h @ p["qkv_kernel"] + p["qkv_bias"]
    qkv = qkv.reshape(b, s, 3, BEIT_HEADS, d // BEIT_HEADS)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * (d // BEIT_HEADS) ** -0.5, k,
        preferred_element_type=jnp.float32,
    ) + bias
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v).transpose(0, 2, 1, 3).reshape(b, s, d)
    x = x + p["gamma_1"] * _dense(p["proj"], o)
    h = _ln(p["norm2"], x)
    h = _dense(p["fc2"], jax.nn.gelu(_dense(p["fc1"], h), approximate=False))
    return x + p["gamma_2"] * h


def _up_ac(x: jnp.ndarray, size) -> jnp.ndarray:
    from ctrlora_tpu.annotators.normalbae import _resize_ac

    return _resize_ac(x, size)


def dpt_beit_forward(p: Dict, x: jnp.ndarray):
    """x [B,H,W,3] (H,W multiples of 32, midas-normalized) ->
    (rel_depth [B,H,W], taps dict for the metric head)."""
    b, H, W, _ = x.shape
    gh, gw = H // 16, W // 16
    h = _conv(p["patch_embed"], x, stride=16)
    h = h.reshape(b, gh * gw, BEIT_DIM)
    h = jnp.concatenate([jnp.tile(p["cls_token"], (b, 1, 1)), h], axis=1)

    taps = []
    for i in range(BEIT_LAYERS):
        bias = _rel_pos_bias(p[f"block_{i}"]["rel_table"], gh, gw)
        h = _beit_block(p[f"block_{i}"], h, bias)
        if i in HOOKS:
            taps.append(h)

    layers = []
    for lvl, tap in enumerate(taps):
        readout = jnp.tile(tap[:, :1], (1, gh * gw, 1))
        feat = jnp.concatenate([tap[:, 1:], readout], axis=-1)
        feat = jax.nn.gelu(_dense(p[f"readout_{lvl}"], feat), approximate=False)
        feat = feat.reshape(b, gh, gw, BEIT_DIM)
        feat = _conv(p[f"reassemble_{lvl}_conv"], feat)
        if lvl == 0:
            feat = _convT(p["reassemble_0_up"], feat, 4, 4)
        elif lvl == 1:
            feat = _convT(p["reassemble_1_up"], feat, 2, 2)
        elif lvl == 3:
            feat = _conv(p["reassemble_3_down"], feat, stride=2, padding=1)
        layers.append(_conv(p[f"scratch_rn_{lvl}"], feat, padding=1, bias=False))

    l4_rn = layers[3]
    r4 = _fusion(p["refinenet4"], layers[3])
    r3 = _fusion(p["refinenet3"], r4, layers[2])
    r2 = _fusion(p["refinenet2"], r3, layers[1])
    r1 = _fusion(p["refinenet1"], r2, layers[0])

    out = _conv(p["head_conv1"], r1, padding=1)
    out = _up2_align(out)
    out_conv = jax.nn.relu(_conv(p["head_conv2"], out, padding=1))  # 32ch tap
    rel = jax.nn.relu(_conv(p["head_conv3"], out_conv))[:, :, :, 0]
    return rel, {"out_conv": out_conv, "l4_rn": l4_rn, "x_blocks": [r4, r3, r2, r1]}


# ---------------------------------------------------------------------------
# metric head
# ---------------------------------------------------------------------------

def _mlp2(p, x, act_out=None):
    """conv1x1 -> relu -> conv1x1 [-> act_out]."""
    h = jax.nn.relu(_conv(p["fc0"], x))
    h = _conv(p["fc1"], h)
    return act_out(h) if act_out is not None else h


def _inv_attractor(dx):
    return dx / (1.0 + ATTR_ALPHA * dx**ATTR_GAMMA)


def _log_binomial(p_prob, t, K=N_BINS, eps=1e-4):
    """(dist_layers.py:29-69): binomial over K classes via Stirling. The
    log-binomial coefficients are constants; computed host-side in fp32
    mirroring torch's evaluation order (XLA's constant folding of the naive
    in-graph form reassociates (K-1) - k + 1e-7 to 0 and yields 0 * -inf)."""
    e = np.float32(1e-7)
    k_np = np.arange(K, dtype=np.float32) + e
    n_np = np.float32(K - 1) + e
    log_binom_np = (
        n_np * np.log(n_np) - k_np * np.log(k_np)
        - (n_np - k_np) * np.log(n_np - k_np + e)
    )
    log_binom = jnp.asarray(log_binom_np).reshape(1, 1, 1, K)
    k_idx = jnp.arange(K, dtype=jnp.float32).reshape(1, 1, 1, K)
    K1 = jnp.float32(K - 1)
    one_minus = jnp.clip(1.0 - p_prob, eps, 1.0)
    pc = jnp.clip(p_prob, eps, 1.0)
    y = log_binom + k_idx * jnp.log(pc) + (K1 - k_idx) * jnp.log(one_minus)
    return jax.nn.softmax(y / t, axis=-1)


def zoe_forward(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Midas-normalized input [B,H,W,3] -> metric depth [B,H,W,1]
    (zoedepth_v1.py:124-201, test path)."""
    rel_depth, taps = dpt_beit_forward(p, x)
    btlnck = _conv(p["conv2"], taps["l4_rn"])
    seed_b_centers = _mlp2(p["seed_bin_regressor"], btlnck, jax.nn.softplus)
    b_prev = seed_b_centers
    prev_emb = _mlp2(p["seed_projector"], btlnck)

    for i, xb in enumerate(taps["x_blocks"]):
        emb = _mlp2(p[f"projector_{i}"], xb)
        h = emb + _up_ac(prev_emb, xb.shape[1:3])
        A = _mlp2(p[f"attractor_{i}"], h, jax.nn.softplus)  # [B,h,w,nA]
        bc = _up_ac(b_prev, xb.shape[1:3])  # [B,h,w,nbins]
        dx = A[..., :, None] - bc[..., None, :]  # [B,h,w,nA,nbins]
        delta = jnp.mean(_inv_attractor(dx), axis=-2)  # kind='mean'
        b_prev = bc + delta
        prev_emb = emb

    last = taps["out_conv"]
    rel_cond = _up_ac(rel_depth[..., None], last.shape[1:3])
    last = jnp.concatenate([last, rel_cond], axis=-1)  # [B,H,W,33]
    emb_up = _up_ac(prev_emb, last.shape[1:3])

    # conditional log binomial (dist_layers.py:72-121)
    pt = _conv(p["clb_fc1"], jax.nn.gelu(
        _conv(p["clb_fc0"], jnp.concatenate([last, emb_up], axis=-1)),
        approximate=False,
    ))
    pt = jax.nn.softplus(pt) + 1e-4
    prob = pt[..., 0:1] / (pt[..., 0:1] + pt[..., 1:2])
    t = pt[..., 2:3] / (pt[..., 2:3] + pt[..., 3:4])
    t = (MAX_TEMP - MIN_TEMP) * t + MIN_TEMP
    probs = _log_binomial(prob, t)

    b_centers = _up_ac(b_prev, probs.shape[1:3])
    return jnp.sum(probs * b_centers, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# preprocessing / inference protocol
# ---------------------------------------------------------------------------

def _constrain32(v: float) -> int:
    return int(round(v / 32) * 32)


def minimal_resize_size(h: int, w: int, th: int = 384, tw: int = 512) -> Tuple[int, int]:
    """'minimal' keep-aspect resize target, multiple of 32
    (base_models/midas.py:100-170)."""
    sh, sw = th / h, tw / w
    if abs(1 - sw) < abs(1 - sh):
        sh = sw
    else:
        sw = sh
    nh, nw = _constrain32(sh * h), _constrain32(sw * w)
    return max(nh, 32), max(nw, 32)


def _cubic_weight(t: np.ndarray, A: float = -0.75) -> np.ndarray:
    at = np.abs(t)
    w = np.where(
        at <= 1, (A + 2) * at**3 - (A + 3) * at**2 + 1,
        np.where(at < 2, A * at**3 - 5 * A * at**2 + 8 * A * at - 4 * A, 0.0),
    )
    return w.astype(np.float32)


def _resize_bicubic(x: jnp.ndarray, size) -> jnp.ndarray:
    """torch F.interpolate(mode='bicubic', align_corners=False), exact:
    half-pixel centers, A=-0.75, edge-clamped taps."""
    B, H, W, C = x.shape
    oh, ow = size

    def axis(n_in, n_out):
        src = (np.arange(n_out, dtype=np.float64) + 0.5) * n_in / n_out - 0.5
        base = np.floor(src).astype(np.int64)
        frac = src - base
        idxs = np.stack([np.clip(base + k, 0, n_in - 1) for k in (-1, 0, 1, 2)], 1)
        ws = np.stack([_cubic_weight(frac - k) for k in (-1, 0, 1, 2)], 1)
        return idxs, jnp.asarray(ws, jnp.float32)

    yi, yw = axis(H, oh)
    xi, xw = axis(W, ow)
    out = 0.0
    for ky in range(4):
        row = 0.0
        for kx in range(4):
            row = row + x[:, yi[:, ky]][:, :, xi[:, kx]] * xw[None, None, :, kx, None]
        out = out + row * yw[None, :, ky, None, None]
    return out


class ZoeDetector:
    """reference annotator/zoe/__init__.py:15-49 (ZoeD_M12_N.pt). Runs the
    full infer protocol: reflect-pad aug + flip aug + bicubic upsample."""

    def __init__(self, ckpt_path: str | None = None):
        import torch

        path = ckpt_path or ensure_ckpt("ZoeD_M12_N.pt")
        raw = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(raw, dict) and "model" in raw:
            raw = raw["model"]
        sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in raw.items()}
        self.params = jax.tree_util.tree_map(jnp.asarray, convert_zoe(sd))
        self._fwd = jax.jit(zoe_forward)

    def _infer_once(self, img01: np.ndarray) -> np.ndarray:
        """img01 [H,W,3] float in [0,1] -> metric depth [H,W] (no aug)."""
        h, w = img01.shape[:2]
        nh, nw = minimal_resize_size(h, w)
        x = jnp.asarray(img01, jnp.float32)[None]
        x = _up_ac(x, (nh, nw))  # Resize uses align_corners=True bilinear
        x = (x - 0.5) / 0.5
        d = self._fwd(self.params, x)
        if (nh, nw) != (h, w):
            d = _resize_bicubic(d, (h, w))
        return np.asarray(d)[0, :, :, 0]

    def _infer_pad(self, img01: np.ndarray) -> np.ndarray:
        h, w = img01.shape[:2]
        ph = int(np.sqrt(h / 2) * 3)
        pw = int(np.sqrt(w / 2) * 3)
        padded = np.pad(img01, ((ph, ph), (pw, pw), (0, 0)), mode="reflect")
        out = self._infer_once(padded)
        return out[ph:-ph or None, pw:-pw or None]

    def __call__(self, input_image: np.ndarray) -> np.ndarray:
        assert input_image.ndim == 3
        img01 = input_image.astype(np.float32) / 255.0
        d = self._infer_pad(img01)
        d_flip = self._infer_pad(img01[:, ::-1])[:, ::-1]
        depth = (d + d_flip) / 2.0

        vmin = np.percentile(depth, 2)
        vmax = np.percentile(depth, 85)
        depth = (depth - vmin) / (vmax - vmin)
        depth = 1.0 - depth
        return (depth * 255.0).clip(0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# bridge
# ---------------------------------------------------------------------------

def convert_zoe(sd: Dict[str, np.ndarray]) -> Dict:
    """ZoeD_M12_N.pt state dict -> functional params dict."""
    f32 = lambda k: np.asarray(sd[k], np.float32)
    lin = lambda k: {"kernel": f32(k + ".weight").T, "bias": f32(k + ".bias")}
    conv = lambda k: {"kernel": f32(k + ".weight").transpose(2, 3, 1, 0),
                      "bias": f32(k + ".bias")}
    convnb = lambda k: {"kernel": f32(k + ".weight").transpose(2, 3, 1, 0)}
    ln = lambda k: {"scale": f32(k + ".weight"), "bias": f32(k + ".bias")}

    pre = "core.core.pretrained."
    m = pre + "model."
    p: Dict = {
        "patch_embed": conv(m + "patch_embed.proj"),
        "cls_token": f32(m + "cls_token"),
    }
    for i in range(BEIT_LAYERS):
        t = f"{m}blocks.{i}."
        q_bias = f32(t + "attn.q_bias")
        v_bias = f32(t + "attn.v_bias")
        p[f"block_{i}"] = {
            "norm1": ln(t + "norm1"),
            "qkv_kernel": f32(t + "attn.qkv.weight").T,
            "qkv_bias": np.concatenate([q_bias, np.zeros_like(q_bias), v_bias]),
            "rel_table": f32(t + "attn.relative_position_bias_table"),
            "proj": lin(t + "attn.proj"),
            "norm2": ln(t + "norm2"),
            "fc1": lin(t + "mlp.fc1"),
            "fc2": lin(t + "mlp.fc2"),
            "gamma_1": f32(t + "gamma_1"),
            "gamma_2": f32(t + "gamma_2"),
        }
    for lvl in range(4):
        ap = f"{pre}act_postprocess{lvl + 1}."
        p[f"readout_{lvl}"] = lin(ap + "0.project.0")
        p[f"reassemble_{lvl}_conv"] = conv(ap + "3")
        if lvl in (0, 1):
            p[f"reassemble_{lvl}_up"] = {
                "kernel": f32(ap + "4.weight"), "bias": f32(ap + "4.bias")
            }
        elif lvl == 3:
            p["reassemble_3_down"] = conv(ap + "4")
    sc = "core.core.scratch."
    for lvl in range(4):
        p[f"scratch_rn_{lvl}"] = convnb(f"{sc}layer{lvl + 1}_rn")
    for r in range(1, 5):
        t = f"{sc}refinenet{r}."
        p[f"refinenet{r}"] = {
            "res1": {"conv1": conv(t + "resConfUnit1.conv1"),
                     "conv2": conv(t + "resConfUnit1.conv2")},
            "res2": {"conv1": conv(t + "resConfUnit2.conv1"),
                     "conv2": conv(t + "resConfUnit2.conv2")},
            "out_conv": conv(t + "out_conv"),
        }
    p["head_conv1"] = conv(sc + "output_conv.0")
    p["head_conv2"] = conv(sc + "output_conv.2")
    p["head_conv3"] = conv(sc + "output_conv.4")

    p["conv2"] = conv("conv2")
    mlp2 = lambda k: {"fc0": conv(k + "._net.0"), "fc1": conv(k + "._net.2")}
    p["seed_bin_regressor"] = mlp2("seed_bin_regressor")
    p["seed_projector"] = mlp2("seed_projector")
    for i in range(4):
        p[f"projector_{i}"] = mlp2(f"projectors.{i}")
        p[f"attractor_{i}"] = mlp2(f"attractors.{i}")
    p["clb_fc0"] = conv("conditional_log_binomial.mlp.0")
    p["clb_fc1"] = conv("conditional_log_binomial.mlp.2")
    return p
