"""OneFormer semantic segmentation annotator (seg_ofcoco / seg_ofade20k).

Reference: annotator/oneformer/__init__.py + api.py — swin-L OneFormer run
in 'semantic' task mode, argmax over the class-weighted mask union, colored
with the dataset's stuff palette.

Parity scope: the model (swin backbone -> MSDeformAttn pixel decoder ->
masked transformer decoder -> semantic inference) matches the torch
reference numerically on bridged weights (tests/test_oneformer.py). The
final rendering deviates knowingly from the reference's matplotlib polygon
rasterizer (demo/visualizer.py draw_sem_seg): we fill per-pixel palette
colors, which is the same map without matplotlib's antialiased polygon
edges.

Weights: place the reference checkpoints
  150_16_swin_l_oneformer_coco_100ep.pth / 250_16_swin_l_oneformer_ade20k_160k.pth
in the annotator ckpts dir (CTRLORA_ANNOTATOR_CKPTS).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ctrlora_tpu.annotators.oneformer.decoder import DecoderConfig, decoder_forward
from ctrlora_tpu.annotators.download import ensure_ckpt
from ctrlora_tpu.annotators.oneformer.pixel_decoder import (
    PixelDecoderConfig, _resize_bilinear, pixel_decoder_forward,
)
from ctrlora_tpu.annotators.oneformer.swin import SwinConfig, swin_forward

PIXEL_MEAN = np.array([123.675, 116.280, 103.530], np.float32)
PIXEL_STD = np.array([58.395, 57.120, 57.375], np.float32)
SIZE_DIVISIBILITY = 32


@dataclasses.dataclass(frozen=True)
class OneFormerConfig:
    swin: SwinConfig = SwinConfig()
    pixel: PixelDecoderConfig = PixelDecoderConfig()
    dec: DecoderConfig = DecoderConfig()
    # DefaultPredictor's ResizeShortestEdge bounds (defaults.py:63-65 for
    # COCO, the ade20k swin yaml overrides to 640/2560)
    min_size_test: int = 800
    max_size_test: int = 1333
    palette: str = "coco"


def coco_config() -> OneFormerConfig:
    return OneFormerConfig(
        dec=DecoderConfig(num_queries=150, num_classes=133),
        min_size_test=800, max_size_test=1333, palette="coco",
    )


def ade20k_config() -> OneFormerConfig:
    return OneFormerConfig(
        dec=DecoderConfig(num_queries=250, num_classes=150),
        min_size_test=640, max_size_test=2560, palette="ade20k",
    )


@functools.lru_cache()
def palettes() -> Dict:
    with open(os.path.join(os.path.dirname(__file__), "palettes.json")) as f:
        return json.load(f)


def task_tokens(task: str = "semantic", seq_len: int = 77) -> np.ndarray:
    """'The task is {task}' through the CLIP BPE, zero-padded (the
    reference's Tokenize, data/tokenizer.py:86-116 — note: zeros, not EOT)."""
    from ctrlora_tpu.utils.tokenizer import default_tokenizer

    tok = default_tokenizer()
    ids = [tok.sot_token] + tok.encode(f"The task is {task}") + [tok.eot_token]
    out = np.zeros((seq_len,), np.int64)
    out[: len(ids)] = ids[:seq_len]
    if len(ids) > seq_len:
        out[-1] = tok.eot_token
    return out


def oneformer_forward(params: Dict, image: jnp.ndarray, tasks: jnp.ndarray,
                      cfg: OneFormerConfig):
    """image [B, H, W, 3] normalized+padded; tasks [B, 77] float ids.
    Returns (pred_logits [B, Q, K+1], pred_masks [B, Q, H, W] upsampled to
    the padded input size, as oneformer_model.py:294-299)."""
    feats = swin_forward(params["backbone"], image, cfg.swin)
    mask_features, ms = pixel_decoder_forward(params["pixel_decoder"], feats, cfg.pixel)
    cls, masks = decoder_forward(params["predictor"], ms, mask_features, tasks, cfg.dec)
    up = _resize_bilinear(
        masks.transpose(0, 2, 3, 1), (image.shape[1], image.shape[2])
    ).transpose(0, 3, 1, 2)
    return cls, up


# ---------------------------------------------------------------------------
# weight bridge
# ---------------------------------------------------------------------------

def _t(sd, k):
    return np.asarray(sd[k], np.float32)


def _lin(sd, k):
    return {"kernel": _t(sd, k + ".weight").T, "bias": _t(sd, k + ".bias")}


def _norm(sd, k):
    return {"scale": _t(sd, k + ".weight"), "bias": _t(sd, k + ".bias")}


def _conv1x1(sd, k, bias=True):
    w = _t(sd, k + ".weight")
    out = {"kernel": w.transpose(2, 3, 1, 0)}
    if bias and k + ".bias" in sd:
        out["bias"] = _t(sd, k + ".bias")
    return out


def _mha_params(sd, k):
    w = _t(sd, k + ".in_proj_weight")
    b = _t(sd, k + ".in_proj_bias")
    c = w.shape[1]
    return {
        "q": {"kernel": w[:c].T, "bias": b[:c]},
        "k": {"kernel": w[c : 2 * c].T, "bias": b[c : 2 * c]},
        "v": {"kernel": w[2 * c :].T, "bias": b[2 * c :]},
        "out": _lin(sd, k + ".out_proj"),
    }


def convert_oneformer(sd: Dict[str, np.ndarray], cfg: OneFormerConfig) -> Dict:
    """Reference checkpoint state dict -> functional param tree."""
    p: Dict = {"backbone": {}, "pixel_decoder": {}, "predictor": {}}

    # ---- swin backbone
    bb = p["backbone"]
    bb["patch_embed"] = {
        "proj": {
            "kernel": _t(sd, "backbone.patch_embed.proj.weight").transpose(2, 3, 1, 0),
            "bias": _t(sd, "backbone.patch_embed.proj.bias"),
        },
        "norm": _norm(sd, "backbone.patch_embed.norm"),
    }
    for i, depth in enumerate(cfg.swin.depths):
        lp: Dict = {}
        for j in range(depth):
            base = f"backbone.layers.{i}.blocks.{j}"
            lp[f"blocks_{j}"] = {
                "norm1": _norm(sd, base + ".norm1"),
                "norm2": _norm(sd, base + ".norm2"),
                "attn": {
                    "qkv": _lin(sd, base + ".attn.qkv"),
                    "proj": _lin(sd, base + ".attn.proj"),
                    "relative_position_bias_table": _t(
                        sd, base + ".attn.relative_position_bias_table"
                    ),
                },
                "mlp": {
                    "fc1": _lin(sd, base + ".mlp.fc1"),
                    "fc2": _lin(sd, base + ".mlp.fc2"),
                },
            }
        if i < len(cfg.swin.depths) - 1:
            base = f"backbone.layers.{i}.downsample"
            lp["downsample"] = {
                "reduction": {"kernel": _t(sd, base + ".reduction.weight").T},
                "norm": _norm(sd, base + ".norm"),
            }
        bb[f"layers_{i}"] = lp
    for i in cfg.swin.out_indices:
        bb[f"norm{i}"] = _norm(sd, f"backbone.norm{i}")

    # ---- pixel decoder
    pd = p["pixel_decoder"]
    pre = "sem_seg_head.pixel_decoder."
    for i in range(3):
        pd[f"input_proj_{i}"] = {
            "conv": _conv1x1(sd, pre + f"input_proj.{i}.0"),
            "norm": _norm(sd, pre + f"input_proj.{i}.1"),
        }
    pd["level_embed"] = _t(sd, pre + "transformer.level_embed")
    for li in range(cfg.pixel.enc_layers):
        base = pre + f"transformer.encoder.layers.{li}"
        pd[f"enc_{li}"] = {
            "self_attn": {
                n: _lin(sd, base + f".self_attn.{n}")
                for n in ("sampling_offsets", "attention_weights", "value_proj", "output_proj")
            },
            "norm1": _norm(sd, base + ".norm1"),
            "norm2": _norm(sd, base + ".norm2"),
            "linear1": _lin(sd, base + ".linear1"),
            "linear2": _lin(sd, base + ".linear2"),
        }
    pd["mask_features"] = _conv1x1(sd, pre + "mask_features")
    pd["adapter_1"] = {
        "conv": _conv1x1(sd, pre + "adapter_1", bias=False),
        "norm": _norm(sd, pre + "adapter_1.norm"),
    }
    pd["layer_1"] = {
        "conv": _conv1x1(sd, pre + "layer_1", bias=False),
        "norm": _norm(sd, pre + "layer_1.norm"),
    }

    # ---- predictor
    pr = p["predictor"]
    pre = "sem_seg_head.predictor."
    ct: Dict = {}
    for i in range(cfg.dec.class_dec_layers):
        base = pre + f"class_transformer.decoder.layers.{i}"
        ct[f"dec_{i}"] = {
            "self_attn": _mha_params(sd, base + ".self_attn"),
            "multihead_attn": _mha_params(sd, base + ".multihead_attn"),
            "linear1": _lin(sd, base + ".linear1"),
            "linear2": _lin(sd, base + ".linear2"),
            "norm1": _norm(sd, base + ".norm1"),
            "norm2": _norm(sd, base + ".norm2"),
            "norm3": _norm(sd, base + ".norm3"),
        }
    ct["decoder_norm"] = _norm(sd, pre + "class_transformer.decoder.norm")
    pr["class_transformer"] = ct
    for i in range(cfg.dec.dec_layers):
        pr[f"layer_{i}"] = {
            "self": {
                "attn": _mha_params(sd, pre + f"transformer_self_attention_layers.{i}.self_attn"),
                "norm": _norm(sd, pre + f"transformer_self_attention_layers.{i}.norm"),
            },
            "cross": {
                "attn": _mha_params(sd, pre + f"transformer_cross_attention_layers.{i}.multihead_attn"),
                "norm": _norm(sd, pre + f"transformer_cross_attention_layers.{i}.norm"),
            },
            "ffn": {
                "linear1": _lin(sd, pre + f"transformer_ffn_layers.{i}.linear1"),
                "linear2": _lin(sd, pre + f"transformer_ffn_layers.{i}.linear2"),
                "norm": _norm(sd, pre + f"transformer_ffn_layers.{i}.norm"),
            },
        }
    pr["decoder_norm"] = _norm(sd, pre + "decoder_norm")
    pr["query_embed"] = _t(sd, pre + "query_embed.weight")
    pr["level_embed"] = _t(sd, pre + "level_embed.weight")
    for i in range(3):
        key = pre + f"input_proj.{i}.weight"
        if key in sd:  # only present when in_channels != hidden_dim
            w = _t(sd, key)
            pr[f"input_proj_{i}"] = {
                "kernel": w.reshape(w.shape[0], w.shape[1]).T,
                "bias": _t(sd, pre + f"input_proj.{i}.bias"),
            }
    w = _t(sd, pre + "class_input_proj.weight")
    pr["class_input_proj"] = {
        "kernel": w.reshape(w.shape[0], w.shape[1]).T,
        "bias": _t(sd, pre + "class_input_proj.bias"),
    }
    pr["class_embed"] = _lin(sd, pre + "class_embed")
    pr["mask_embed"] = {
        f"layers_{i}": _lin(sd, pre + f"mask_embed.layers.{i}") for i in range(3)
    }
    pr["task_mlp"] = {
        f"layers_{i}": _lin(sd, f"task_mlp.layers.{i}") for i in range(2)
    }
    return jax.tree_util.tree_map(jnp.asarray, p)


# ---------------------------------------------------------------------------
# inference protocol (DefaultPredictor + semantic_run)
# ---------------------------------------------------------------------------

def resize_shortest_edge(img: np.ndarray, short: int, max_size: int) -> np.ndarray:
    """detectron2 T.ResizeShortestEdge.get_transform + PIL bilinear."""
    h, w = img.shape[:2]
    scale = short / min(h, w)
    if h < w:
        newh, neww = short, scale * w
    else:
        newh, neww = scale * h, short
    if max(newh, neww) > max_size:
        s = max_size / max(newh, neww)
        newh, neww = newh * s, neww * s
    newh = int(newh + 0.5)
    neww = int(neww + 0.5)
    if (newh, neww) == (h, w):
        return img
    from PIL import Image

    return np.asarray(Image.fromarray(img).resize((neww, newh), Image.BILINEAR))


class OneformerDetector:
    def __init__(self, cfg: OneFormerConfig, ckpt_path: Optional[str] = None,
                 params: Optional[Dict] = None):
        self.cfg = cfg
        if params is None:
            assert ckpt_path is not None
            from ctrlora_tpu.utils.ckpt_torch import load_torch_state_dict

            params = convert_oneformer(load_torch_state_dict(ckpt_path), cfg)
        self.params = params
        self.tasks = task_tokens("semantic", cfg.dec.task_seq_len)[None].astype(np.float32)
        self._jit = jax.jit(
            functools.partial(oneformer_forward, cfg=self.cfg)
        )
        meta = palettes()[cfg.palette]
        self.colors = np.asarray(meta["colors"], np.uint8)
        self.classes = meta["classes"]

    def semantic_map(self, img_rgb: np.ndarray) -> np.ndarray:
        """uint8 RGB [H, W, 3] -> per-pixel class ids [H, W] int32."""
        import cv2

        h0, w0 = img_rgb.shape[:2]
        resized = resize_shortest_edge(
            img_rgb, self.cfg.min_size_test, self.cfg.max_size_test
        )
        rh, rw = resized.shape[:2]
        x = (resized.astype(np.float32) - PIXEL_MEAN) / PIXEL_STD
        pad_h = (SIZE_DIVISIBILITY - rh % SIZE_DIVISIBILITY) % SIZE_DIVISIBILITY
        pad_w = (SIZE_DIVISIBILITY - rw % SIZE_DIVISIBILITY) % SIZE_DIVISIBILITY
        x = np.pad(x, ((0, pad_h), (0, pad_w), (0, 0)))

        cls, masks = self._jit(self.params, jnp.asarray(x[None]), jnp.asarray(self.tasks))
        cls = np.asarray(cls[0], np.float32)     # [Q, K+1]
        masks = np.asarray(masks[0], np.float32)  # [Q, Hp, Wp]
        # sem_seg_postprocess (before inference): crop padding, resize to the
        # original size, then the softmax x sigmoid einsum
        masks = masks[:, :rh, :rw]
        masks = np.stack(
            [cv2.resize(m, (w0, h0), interpolation=cv2.INTER_LINEAR) for m in masks]
        )
        prob = _softmax(cls)[:, :-1]              # drop the no-object class
        sig = 1.0 / (1.0 + np.exp(-masks))
        semseg = np.einsum("qc,qhw->chw", prob, sig)
        return np.argmax(semseg, axis=0).astype(np.int32)

    def __call__(self, img_rgb: np.ndarray) -> np.ndarray:
        seg = self.semantic_map(img_rgb)
        return self.colors[np.clip(seg, 0, len(self.colors) - 1)]


def _softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _ckpt(name: str) -> str:
    from ctrlora_tpu.annotators.hed import ckpts_dir

    path = ensure_ckpt(name)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"OneFormer weights not found: {path} — download "
            f"https://huggingface.co/lllyasviel/Annotators/resolve/main/{name}"
        )
    return path


def OneformerCOCODetector() -> OneformerDetector:
    return OneformerDetector(coco_config(), _ckpt("150_16_swin_l_oneformer_coco_100ep.pth"))


def OneformerADE20kDetector() -> OneformerDetector:
    return OneformerDetector(ade20k_config(), _ckpt("250_16_swin_l_oneformer_ade20k_160k.pth"))
