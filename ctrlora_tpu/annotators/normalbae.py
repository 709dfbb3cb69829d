"""NormalBAE surface-normal estimator, Flax port (reference:
annotator/normalbae — NNET from "Estimating and Exploiting the Aleatoric
Uncertainty in Surface Normal Estimation", scannet.pt checkpoint).

Architecture (reference annotator/normalbae/models/):
  * encoder: tf_efficientnet_b5_ap from the vendored geffnet repo
    (encoder.py:13-15) — TF 'SAME' padding (exactly XLA's SAME semantics),
    BN eps 1e-3, swish activations, SE blocks reduced from the block's
    input channels (efficientnet_builder.py:52-64).
  * decoder (test mode, architecture='BN'): conv2 1x1 on the conv_head
    features, four UpSampleBN blocks (bilinear align_corners=True up to the
    skip size, concat, 2x conv+BN+LeakyReLU), a coarse 1/8 head, then three
    pixel-MLP refinement heads (1x1 Conv1d stacks) at 1/4, 1/2 and 1/1 res
    (decoder.py:104-180, test branches only — the sampling path is
    train-only).

Eval-only: all BatchNorms are folded into per-channel affines at bridge
time. The detector contract follows annotator/normalbae/__init__.py:36-52:
ImageNet-normalized input, output = (normal+1)/2 as uint8 RGB.
"""

from __future__ import annotations

import math
import os

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ctrlora_tpu.annotators.hed import ckpts_dir
from ctrlora_tpu.annotators.download import ensure_ckpt
from ctrlora_tpu.annotators.mlsd import FoldedBN


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _round_ch(ch: int, mult: float = 1.6) -> int:
    return _make_divisible(ch * mult)


# (kernel, stride, expand, base_out, base_repeats) for B0; B5 scales
# width x1.6 / depth x2.2 (gen_efficientnet.py:525-533)
_B0_STAGES = [
    (3, 1, 1, 16, 1),
    (3, 2, 6, 24, 2),
    (5, 2, 6, 40, 2),
    (3, 2, 6, 80, 3),
    (5, 1, 6, 112, 3),
    (5, 2, 6, 192, 4),
    (3, 1, 6, 320, 1),
]


def b5_stages():
    return [
        (k, s, e, _round_ch(c), int(math.ceil(r * 2.2)))
        for (k, s, e, c, r) in _B0_STAGES
    ]


def _conv(x, w, stride=1, groups=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding, feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class _SameConv(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    depthwise: bool = False

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        g = cin if self.depthwise else 1
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, cin // g, self.features), jnp.float32,
        )
        return _conv(x, w, self.stride, g)


class SqueezeExcite(nn.Module):
    """SE with reduction from the block's INPUT channels (divisor=1)."""

    reduced: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), name="conv_reduce")(s)
        s = nn.swish(s)
        s = nn.Conv(c, (1, 1), name="conv_expand")(s)
        return x * nn.sigmoid(s)


class DSBlock(nn.Module):
    """DepthwiseSeparableConv (efficientnet_builder.py:144-190)."""

    out_ch: int
    kernel: int
    stride: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        h = _SameConv(cin, self.kernel, self.stride, depthwise=True, name="conv_dw")(x)
        h = nn.swish(FoldedBN(name="bn1")(h))
        h = SqueezeExcite(max(1, int(cin * 0.25)), name="se")(h)
        h = _SameConv(self.out_ch, 1, name="conv_pw")(h)
        h = FoldedBN(name="bn2")(h)  # no activation (pw_act=False)
        if self.stride == 1 and cin == self.out_ch:
            h = h + x
        return h


class MBConv(nn.Module):
    """InvertedResidual (efficientnet_builder.py:193-248)."""

    out_ch: int
    kernel: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        mid = _make_divisible(cin * self.expand)
        h = _SameConv(mid, 1, name="conv_pw")(x)
        h = nn.swish(FoldedBN(name="bn1")(h))
        h = _SameConv(mid, self.kernel, self.stride, depthwise=True, name="conv_dw")(h)
        h = nn.swish(FoldedBN(name="bn2")(h))
        h = SqueezeExcite(max(1, int(cin * 0.25)), name="se")(h)
        h = _SameConv(self.out_ch, 1, name="conv_pwl")(h)
        h = FoldedBN(name="bn3")(h)
        if self.stride == 1 and cin == self.out_ch:
            h = h + x
        return h


class EffNetB5Encoder(nn.Module):
    """Feature pyramid used by the NNET decoder (encoder.py:24-32):
    stage0/1/2/4 outputs + the raw conv_head output (pre-bn2)."""

    @nn.compact
    def __call__(self, x):
        h = _SameConv(_round_ch(32), 3, 2, name="conv_stem")(x)
        h = nn.swish(FoldedBN(name="bn1")(h))
        skips = []
        for si, (k, s, e, c, r) in enumerate(b5_stages()):
            for i in range(r):
                blk = DSBlock if e == 1 else MBConv
                kw = {} if e == 1 else {"expand": e}
                h = blk(c, k, s if i == 0 else 1, name=f"s{si}_b{i}", **kw)(h)
            if si in (0, 1, 2, 4):
                skips.append(h)
        h = _SameConv(_round_ch(1280), 1, name="conv_head")(h)
        return skips + [h]


def _resize_ac(x, size):
    """Bilinear with align_corners=True (torch F.interpolate semantics:
    src = dst * (in-1)/(out-1), no half-pixel shift)."""
    B, H, W, C = x.shape
    oh, ow = size

    def grid(n_in, n_out):
        if n_out == 1 or n_in == 1:
            return np.zeros(n_out, np.float32)
        return np.arange(n_out, dtype=np.float32) * (n_in - 1) / (n_out - 1)

    def axis_weights(n_in, n_out):
        src = grid(n_in, n_out)
        lo = np.clip(np.floor(src).astype(np.int32), 0, n_in - 1)
        hi = np.clip(lo + 1, 0, n_in - 1)
        w = (src - lo).astype(np.float32)
        return lo, hi, jnp.asarray(w)

    ylo, yhi, wy = axis_weights(H, oh)
    xlo, xhi, wx = axis_weights(W, ow)
    top = x[:, ylo][:, :, xlo] * (1 - wx)[None, None, :, None] + x[:, ylo][:, :, xhi] * wx[None, None, :, None]
    bot = x[:, yhi][:, :, xlo] * (1 - wx)[None, None, :, None] + x[:, yhi][:, :, xhi] * wx[None, None, :, None]
    return top * (1 - wy)[None, :, None, None] + bot * wy[None, :, None, None]


def norm_normalize(out):
    """(submodules.py:102-109): unit-normalize xyz, kappa = elu+1.01."""
    n = out[..., :3]
    kappa = out[..., 3:]
    norm = jnp.sqrt(jnp.sum(n**2, axis=-1, keepdims=True)) + 1e-10
    kappa = nn.elu(kappa) + 1.0 + 0.01
    return jnp.concatenate([n / norm, kappa], axis=-1)


class UpSampleBN(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x, skip):
        x = _resize_ac(x, skip.shape[1:3])
        h = jnp.concatenate([x, skip], axis=-1)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)), name="conv_a")(h)
        h = nn.leaky_relu(FoldedBN(name="bn_a")(h), 0.01)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)), name="conv_b")(h)
        return nn.leaky_relu(FoldedBN(name="bn_b")(h), 0.01)


class _PixelMLP(nn.Module):
    """The reference's 1x1 Conv1d refinement stacks (decoder.py:36-57)."""

    @nn.compact
    def __call__(self, h):
        for i, c in enumerate((128, 128, 128)):
            h = nn.relu(nn.Conv(c, (1, 1), name=f"fc{i}")(h))
        return nn.Conv(4, (1, 1), name="fc3")(h)


class NNET(nn.Module):
    """Test-mode forward; returns the full-res [B,H,W,4] normal+kappa map
    (= reference out[0][-1])."""

    @nn.compact
    def __call__(self, x):
        b0, b1, b2, b4, head = EffNetB5Encoder(name="encoder")(x)
        d0 = nn.Conv(2048, (1, 1), name="conv2")(head)
        d1 = UpSampleBN(1024, name="up1")(d0, b4)
        d2 = UpSampleBN(512, name="up2")(d1, b2)
        d3 = UpSampleBN(256, name="up3")(d2, b1)
        d4 = UpSampleBN(128, name="up4")(d3, b0)

        r8 = norm_normalize(
            nn.Conv(4, (3, 3), padding=((1, 1), (1, 1)), name="out_conv_res8")(d2)
        )
        up2 = lambda t: _resize_ac(t, (t.shape[1] * 2, t.shape[2] * 2))
        f4 = jnp.concatenate([up2(d2), up2(r8)], axis=-1)
        r4 = norm_normalize(_PixelMLP(name="out_conv_res4")(f4))
        f2 = jnp.concatenate([up2(d3), up2(r4)], axis=-1)
        r2 = norm_normalize(_PixelMLP(name="out_conv_res2")(f2))
        f1 = jnp.concatenate([up2(d4), up2(r2)], axis=-1)
        return norm_normalize(_PixelMLP(name="out_conv_res1")(f1))


# ---------------------------------------------------------------------------
# bridge
# ---------------------------------------------------------------------------

def _fold_bn(sd, prefix, eps):
    w = np.asarray(sd[prefix + ".weight"], np.float32)
    b = np.asarray(sd[prefix + ".bias"], np.float32)
    mean = np.asarray(sd[prefix + ".running_mean"], np.float32)
    var = np.asarray(sd[prefix + ".running_var"], np.float32)
    scale = w / np.sqrt(var + eps)
    return {"scale": scale, "bias": b - mean * scale}


def convert_nnet(sd) -> dict:
    """scannet.pt state dict (possibly under 'model', 'module.'-prefixed) ->
    flax tree. Encoder BN eps 1e-3 (TF), decoder BN eps 1e-5."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}
    conv_w = lambda k: np.asarray(sd[k], np.float32).transpose(2, 3, 1, 0)
    dw_w = lambda k: np.asarray(sd[k], np.float32).transpose(2, 3, 1, 0)

    def plain(tpre):
        out = {"kernel": conv_w(tpre + ".weight")}
        if tpre + ".bias" in sd:
            out["bias"] = np.asarray(sd[tpre + ".bias"], np.float32)
        return out

    enc_pre = "encoder.original_model."
    enc: dict = {
        "conv_stem": {"kernel": conv_w(enc_pre + "conv_stem.weight")},
        "bn1": _fold_bn(sd, enc_pre + "bn1", 1e-3),
    }
    for si, (k, s, e, c, r) in enumerate(b5_stages()):
        for i in range(r):
            t = f"{enc_pre}blocks.{si}.{i}"
            node: dict = {
                "conv_dw": {"kernel": dw_w(t + ".conv_dw.weight")},
                "se": {
                    "conv_reduce": plain(t + ".se.conv_reduce"),
                    "conv_expand": plain(t + ".se.conv_expand"),
                },
            }
            if e == 1:
                node["bn1"] = _fold_bn(sd, t + ".bn1", 1e-3)
                node["conv_pw"] = {"kernel": conv_w(t + ".conv_pw.weight")}
                node["bn2"] = _fold_bn(sd, t + ".bn2", 1e-3)
            else:
                node["conv_pw"] = {"kernel": conv_w(t + ".conv_pw.weight")}
                node["bn1"] = _fold_bn(sd, t + ".bn1", 1e-3)
                node["bn2"] = _fold_bn(sd, t + ".bn2", 1e-3)
                node["conv_pwl"] = {"kernel": conv_w(t + ".conv_pwl.weight")}
                node["bn3"] = _fold_bn(sd, t + ".bn3", 1e-3)
            enc[f"s{si}_b{i}"] = node
    enc["conv_head"] = {"kernel": conv_w(enc_pre + "conv_head.weight")}

    def up(t):
        return {
            "conv_a": plain(t + "._net.0"),
            "bn_a": _fold_bn(sd, t + "._net.1", 1e-5),
            "conv_b": plain(t + "._net.3"),
            "bn_b": _fold_bn(sd, t + "._net.4", 1e-5),
        }

    def mlp(t):
        # torch Conv1d weight [out, in, 1] -> [1, 1, in, out]
        c1 = lambda k: np.asarray(sd[k], np.float32).transpose(2, 1, 0)[None]
        return {
            f"fc{j}": {
                "kernel": c1(f"{t}.{2 * j}.weight"),
                "bias": np.asarray(sd[f"{t}.{2 * j}.bias"], np.float32),
            }
            for j in range(3)
        } | {
            "fc3": {
                "kernel": c1(f"{t}.6.weight"),
                "bias": np.asarray(sd[f"{t}.6.bias"], np.float32),
            }
        }

    p = {
        "encoder": enc,
        "conv2": plain("decoder.conv2"),
        "up1": up("decoder.up1"),
        "up2": up("decoder.up2"),
        "up3": up("decoder.up3"),
        "up4": up("decoder.up4"),
        "out_conv_res8": plain("decoder.out_conv_res8"),
        "out_conv_res4": mlp("decoder.out_conv_res4"),
        "out_conv_res2": mlp("decoder.out_conv_res2"),
        "out_conv_res1": mlp("decoder.out_conv_res1"),
    }
    return {"params": p}


# ---------------------------------------------------------------------------
# detector
# ---------------------------------------------------------------------------

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class NormalBaeDetector:
    """reference annotator/normalbae/__init__.py:16-52 (scannet.pt)."""

    def __init__(self, ckpt_path: str | None = None):
        import torch

        path = ckpt_path or ensure_ckpt("scannet.pt")
        raw = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(raw, dict) and "model" in raw:
            raw = raw["model"]
        sd = {k: v.numpy() for k, v in raw.items()}
        self.params = jax.tree_util.tree_map(jnp.asarray, convert_nnet(sd))
        self.model = NNET()
        self._fwd = jax.jit(lambda p, x: self.model.apply(p, x))

    def __call__(self, input_image: np.ndarray) -> np.ndarray:
        assert input_image.ndim == 3
        x = input_image.astype(np.float32) / 255.0
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        out = self._fwd(self.params, jnp.asarray(x)[None])
        normal = np.asarray(out)[0, :, :, :3]
        return (((normal + 1.0) * 0.5).clip(0, 1) * 255.0).astype(np.uint8)
