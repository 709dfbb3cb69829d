"""IP-Adapter components: CLIP vision tower, image-projection model, and the
checkpoint bridges for the style-transfer pipeline.

Reference trail:
  * IPCrossAttention with to_k_ip/to_v_ip + per-layer ip_scale
    (ldm/modules/attention_ip.py:196-289) — implemented inside
    models/attention.CrossAttention via `ip_tokens`.
  * ImageProjModel: CLIP image embedding (1024) -> 4 context tokens of 768
    (app/gradio_ctrlora_style_transfer.py:93-111).
  * ip-adapter checkpoint remap: HF ip_adapter dict keys '{2j+1}.to_{k,v}_ip
    .weight' -> the UNet's 16 attn2 sites in encoder/middle/decoder order
    (app/gradio_ctrlora_style_transfer.py:114-174 + ip_layers.txt).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ctrlora_tpu.configs import UNetConfig
from ctrlora_tpu.models.layers import Dense, LayerNorm32
from ctrlora_tpu.models.unet import decoder_plan, encoder_plan


class ImageProjModel(nn.Module):
    """CLIP image embedding -> N extra cross-attention tokens."""

    cross_attention_dim: int = 768
    clip_extra_context_tokens: int = 4

    @nn.compact
    def __call__(self, image_embeds: jnp.ndarray) -> jnp.ndarray:
        b = image_embeds.shape[0]
        x = Dense(
            self.clip_extra_context_tokens * self.cross_attention_dim, name="proj"
        )(image_embeds)
        x = x.reshape(b, self.clip_extra_context_tokens, self.cross_attention_dim)
        return LayerNorm32(name="norm")(x)


# ---------------------------------------------------------------------------
# CLIP vision tower (for style-image embedding and CLIPScore)
# ---------------------------------------------------------------------------

import dataclasses


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """ViT image tower. Defaults = ViT-H/14 (the IP-Adapter image encoder).

    hidden_act: 'quick_gelu' for openai CLIP, 'gelu' for laion ViT-H.
    """

    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_layers: int = 32
    num_heads: int = 16
    projection_dim: int = 1024
    hidden_act: str = "gelu"


class _VisionLayer(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        d, hn = cfg.hidden_size, cfg.num_heads
        hd = d // hn
        b, s, _ = x.shape
        h = LayerNorm32(name="layer_norm1")(x)
        proj = lambda name: Dense(d, name=name)
        split = lambda t: t.reshape(b, s, hn, hd).transpose(0, 2, 1, 3)
        q = split(proj("q_proj")(h)) * (hd**-0.5)
        k = split(proj("k_proj")(h))
        v = split(proj("v_proj")(h))
        w = nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32),
            axis=-1,
        ).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, v).transpose(0, 2, 1, 3).reshape(b, s, d)
        x = x + proj("out_proj")(o)
        h = LayerNorm32(name="layer_norm2")(x)
        h = Dense(cfg.intermediate_size, name="fc1")(h)
        h = h * nn.sigmoid(1.702 * h) if cfg.hidden_act == "quick_gelu" else nn.gelu(h, approximate=False)
        h = Dense(cfg.hidden_size, name="fc2")(h)
        return x + h


class CLIPVisionModel(nn.Module):
    """Returns projected image embeds [B, projection_dim] (the
    CLIPVisionModelWithProjection.image_embeds used by the style app)."""

    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        b = pixel_values.shape[0]
        d = cfg.hidden_size
        patches = nn.Conv(
            d, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False, padding="VALID", name="patch_embedding",
        )(pixel_values)
        patches = patches.reshape(b, -1, d)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (d,))
        x = jnp.concatenate([jnp.tile(cls[None, None], (b, 1, 1)), patches], axis=1)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            ((cfg.image_size // cfg.patch_size) ** 2 + 1, d),
        )
        x = x + pos[None]
        x = LayerNorm32(name="pre_layrnorm")(x)
        for i in range(cfg.num_layers):
            x = _VisionLayer(cfg, name=f"layer_{i}")(x)
        pooled = LayerNorm32(name="post_layernorm")(x[:, 0])
        return Dense(cfg.projection_dim, use_bias=False, name="visual_projection")(pooled)


def clip_image_preprocess(images: np.ndarray, size: int = 224) -> np.ndarray:
    """uint8 RGB [B,H,W,3] -> normalized [B,size,size,3] (CLIP mean/std)."""
    import cv2

    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
    out = []
    for img in images:
        h, w = img.shape[:2]
        scale = size / min(h, w)
        nh, nw = round(h * scale), round(w * scale)
        r = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_CUBIC)
        top, left = (nh - size) // 2, (nw - size) // 2
        r = r[top : top + size, left : left + size]
        out.append((r.astype(np.float32) / 255.0 - mean) / std)
    return np.stack(out)


def convert_clip_vision(sd: Dict[str, np.ndarray], cfg: CLIPVisionConfig) -> dict:
    """HF CLIPVisionModelWithProjection state dict -> flax tree."""
    p: dict = {}
    pre = "vision_model."
    t = lambda k: np.asarray(sd[k], np.float32)
    p["class_embedding"] = t(pre + "embeddings.class_embedding")
    p["position_embedding"] = t(pre + "embeddings.position_embedding.weight")
    p["patch_embedding"] = {
        "kernel": t(pre + "embeddings.patch_embedding.weight").transpose(2, 3, 1, 0)
    }
    for ln in ("pre_layrnorm", "post_layernorm"):
        p[ln] = {"scale": t(pre + ln + ".weight"), "bias": t(pre + ln + ".bias")}
    for i in range(cfg.num_layers):
        src = f"{pre}encoder.layers.{i}."
        layer: dict = {}
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            layer[n] = {
                "kernel": t(f"{src}self_attn.{n}.weight").T,
                "bias": t(f"{src}self_attn.{n}.bias"),
            }
        for ln in ("layer_norm1", "layer_norm2"):
            layer[ln] = {"scale": t(src + ln + ".weight"), "bias": t(src + ln + ".bias")}
        for fc in ("fc1", "fc2"):
            layer[fc] = {
                "kernel": t(f"{src}mlp.{fc}.weight").T,
                "bias": t(f"{src}mlp.{fc}.bias"),
            }
        p[f"layer_{i}"] = layer
    p["visual_projection"] = {"kernel": t("visual_projection.weight").T}
    return {"params": p}


# ---------------------------------------------------------------------------
# ip-adapter checkpoint -> UNet attn2 ip sites
# ---------------------------------------------------------------------------

def ip_attn_sites(cfg: UNetConfig) -> List[Tuple[str, ...]]:
    """The 16 attn2 sites in the reference's ip_layers.txt order: encoder
    transformers, middle, decoder transformers."""
    sites: List[Tuple[str, ...]] = []
    for i, step in enumerate(encoder_plan(cfg)[0]):
        if step.kind == "res" and step.attn:
            for d in range(cfg.transformer_depth):
                sites.append((f"in_{i}_attn", f"block_{d}", "attn2"))
    for d in range(cfg.transformer_depth):
        sites.append(("mid_attn", f"block_{d}", "attn2"))
    for i, step in enumerate(decoder_plan(cfg)):
        if step.attn:
            for d in range(cfg.transformer_depth):
                sites.append((f"out_{i}_attn", f"block_{d}", "attn2"))
    return sites


# named ip_scale target subsets (app/gradio_ctrlora_style_transfer.py:134-173)
IP_SCALE_TARGETS = {
    "all": None,  # every site
    "style_blocks": [("out_3_attn",), ("out_4_attn",), ("out_5_attn",)],
    "style_layout": [
        ("in_7_attn",), ("in_8_attn",),
        ("out_3_attn",), ("out_4_attn",), ("out_5_attn",),
    ],
}


def load_ip_adapter_into(
    unet_tree: dict,
    ip_sd: Dict[str, np.ndarray],
    cfg: UNetConfig,
    ip_scale: float = 1.0,
    target: str = "all",
) -> dict:
    """Write to_k_ip/to_v_ip weights and per-site ip_scale into a mutable
    unet tree. ip_sd is the HF 'ip_adapter' sub-dict with keys
    '{2j+1}.to_{k,v}_ip.weight'."""
    sites = ip_attn_sites(cfg)
    targets = IP_SCALE_TARGETS[target]
    p = unet_tree["params"]
    for j, site in enumerate(sites):
        node = p
        for part in site:
            node = node[part]
        num = 2 * j + 1
        node["to_k_ip"] = {"kernel": np.asarray(ip_sd[f"{num}.to_k_ip.weight"], np.float32).T}
        node["to_v_ip"] = {"kernel": np.asarray(ip_sd[f"{num}.to_v_ip.weight"], np.float32).T}
        on = targets is None or any(site[: len(t)] == t for t in targets)
        node["ip_scale"] = np.float32(ip_scale if on else 0.0)
    return unet_tree


def convert_image_proj(sd: Dict[str, np.ndarray]) -> dict:
    """HF 'image_proj' sub-dict -> ImageProjModel flax tree."""
    return {
        "params": {
            "proj": {
                "kernel": np.asarray(sd["proj.weight"], np.float32).T,
                "bias": np.asarray(sd["proj.bias"], np.float32),
            },
            "norm": {
                "scale": np.asarray(sd["norm.weight"], np.float32),
                "bias": np.asarray(sd["norm.bias"], np.float32),
            },
        }
    }
