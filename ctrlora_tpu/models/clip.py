"""Frozen CLIP ViT-L/14 text encoder (reference:
ldm/modules/encoders/modules.py:88-131, HF openai/clip-vit-large-patch14).

Supports the reference's conditioning variants:
  * layer='last'   — final_layer_norm(hidden)  (FrozenCLIPEmbedder default)
  * layer='hidden' — intermediate hidden state at `layer_idx` (clip-skip,
                     reference: cldm/hack.py:23-28)
  * layer='pooled' — EOS-token pooled embedding (used by the IP-Adapter
                     image-encoder pathway's text analogue)

Also implements the 3x77-token windowed "clip hack"
(cldm/hack.py:32-68) as `encode_windowed`.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ctrlora_tpu.configs import CLIPTextConfig
from ctrlora_tpu.models.layers import Dense, LayerNorm32


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        d = cfg.hidden_size
        head_dim = d // cfg.num_heads
        b, s, _ = x.shape
        dt = cfg.compute_dtype
        proj = lambda name: Dense(d, dtype=dt, name=name)
        split = lambda t: t.reshape(b, s, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)
        q = split(proj("q_proj")(x)) * (head_dim**-0.5)
        k = split(proj("k_proj")(x))
        v = split(proj("v_proj")(x))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits + mask
        w = nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v).transpose(0, 2, 1, 3).reshape(b, s, d)
        return proj("out_proj")(out)


class CLIPLayer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        dt = cfg.compute_dtype
        h = LayerNorm32(name="layer_norm1")(x)
        x = x + CLIPAttention(cfg, name="self_attn")(h, mask)
        h = LayerNorm32(name="layer_norm2")(x)
        h = Dense(cfg.intermediate_size, dtype=dt, name="fc1")(h)
        import flax.linen as _nn

        h = quick_gelu(h) if cfg.hidden_act == "quick_gelu" else _nn.gelu(h, approximate=False)
        h = Dense(cfg.hidden_size, dtype=dt, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """input_ids [B, 77] int32 -> [B, 77, hidden] float32 (layer='last'/
        'hidden') or [B, hidden] (layer='pooled')."""
        cfg = self.cfg
        b, s = input_ids.shape
        tok = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.hidden_size), jnp.float32,
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (cfg.max_length, cfg.hidden_size), jnp.float32,
        )
        # mode='clip': out-of-vocab ids clamp instead of producing NaNs
        x = jnp.take(tok, input_ids, axis=0, mode="clip") + pos[None, :s]
        x = x.astype(cfg.compute_dtype)
        causal = jnp.triu(jnp.full((s, s), -jnp.inf, jnp.float32), k=1)[None, None]

        hidden = None
        # 'penultimate' (FrozenOpenCLIPEmbedder, ldm/modules/encoders/
        # modules.py:157-159,181-186): stop one block early, then ln_final —
        # unlike 'hidden', which returns the raw intermediate state
        n_run = cfg.num_layers - (1 if cfg.layer == "penultimate" else 0)
        for i in range(n_run):
            if cfg.layer == "hidden" and cfg.layer_idx is not None and i == (
                cfg.num_layers + cfg.layer_idx if cfg.layer_idx < 0 else cfg.layer_idx
            ):
                hidden = x
            x = CLIPLayer(cfg, name=f"layer_{i}")(x, causal)

        final = LayerNorm32(name="final_layer_norm")(x).astype(jnp.float32)
        if cfg.layer in ("last", "penultimate"):
            return final
        if cfg.layer == "hidden":
            assert hidden is not None, "layer='hidden' requires layer_idx"
            return hidden.astype(jnp.float32)
        if cfg.layer in ("pooled", "projected"):
            eos = jnp.argmax(input_ids, axis=-1)  # EOT has the max token id
            pooled = final[jnp.arange(b), eos]
            if cfg.layer == "pooled":
                return pooled
            assert cfg.projection_dim, "layer='projected' needs projection_dim"
            return Dense(
                cfg.projection_dim, use_bias=False, name="text_projection"
            )(pooled)
        raise ValueError(f"unknown layer {self.cfg.layer!r}")


def encode_windowed(apply_fn, params, input_ids: jnp.ndarray) -> jnp.ndarray:
    """3x77-token windowed encoding (the reference's clip hack,
    cldm/hack.py:32-68): encode three consecutive 77-token windows and
    concatenate the sequence outputs. input_ids [B, 231]."""
    b, s = input_ids.shape
    assert s % 77 == 0, "windowed encoding expects a multiple of 77 tokens"
    outs = [
        apply_fn(params, input_ids[:, i * 77 : (i + 1) * 77]) for i in range(s // 77)
    ]
    return jnp.concatenate(outs, axis=1)
