"""OneFormer transformer decoder (functional JAX port).

Reference: annotator/oneformer/oneformer/modeling/transformer_decoder/
oneformer_transformer_decoder.py (ContrastiveMultiScaleMaskedTransformerDecoder)
+ transformer.py (the DETR class-transformer) — inference path only (the
text/contrastive tower is train-only, oneformer_model.py:266-270).

Structure: a task token from task_mlp joins Q-1 learned queries produced by
a 2-layer DETR decoder over the mask features; 9 masked-attention layers
then cycle over the three pixel-decoder scales, each round predicting
class logits and mask embeddings whose sigmoid(<0.5) forms the next
cross-attention mask.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ctrlora_tpu.annotators.oneformer.pixel_decoder import (
    _dense, _ln, _resize_bilinear, sine_position_embedding,
)


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    hidden_dim: int = 256
    num_queries: int = 150
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9          # DEC_LAYERS - 1
    class_dec_layers: int = 2
    num_classes: int = 133
    task_seq_len: int = 77


def _mha(p, q, k, v, nheads, mask=None):
    """torch nn.MultiheadAttention (batch_second semantics folded away):
    q/k/v [B, S, C]; mask [B*nheads? or S_q, S_k] additive or bool-blocked.
    Here mask is additive fp32 [B, nheads, Sq, Sk] or None."""
    b, sq, c = q.shape
    d = c // nheads
    qh = (_dense(p["q"], q)).reshape(b, sq, nheads, d).transpose(0, 2, 1, 3)
    kh = (_dense(p["k"], k)).reshape(b, -1, nheads, d).transpose(0, 2, 1, 3)
    vh = (_dense(p["v"], v)).reshape(b, -1, nheads, d).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh * (d**-0.5), kh)
    if mask is not None:
        logits = logits + mask
    w = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, vh).transpose(0, 2, 1, 3).reshape(b, sq, c)
    return _dense(p["out"], o)


def _mlp(p, x, n_layers):
    for i in range(n_layers):
        x = _dense(p[f"layers_{i}"], x)
        if i < n_layers - 1:
            x = jax.nn.relu(x)
    return x


def task_mlp_forward(p, tokens: jnp.ndarray) -> jnp.ndarray:
    """Raw zero-padded task token ids [B, 77] (float) -> [B, hidden]
    (oneformer_model.py:260-261: MLP over the raw id vector)."""
    return _mlp(p, tokens.astype(jnp.float32), 2)


# ---------------------------------------------------------------------------
# DETR class transformer (enc_layers=0 in every shipped config)
# ---------------------------------------------------------------------------

def _detr_dec_layer(p, tgt, memory, pos, query_pos, nheads):
    # post-norm DETR decoder layer (transformer.py TransformerDecoderLayer)
    q = k = tgt + query_pos
    tgt = _ln(p["norm1"], tgt + _mha(p["self_attn"], q, k, tgt, nheads))
    tgt2 = _mha(
        p["multihead_attn"], tgt + query_pos, memory + pos, memory, nheads
    )
    tgt = _ln(p["norm2"], tgt + tgt2)
    h = jax.nn.relu(_dense(p["linear1"], tgt))
    tgt = _ln(p["norm3"], tgt + _dense(p["linear2"], h))
    return tgt


def class_transformer_forward(
    p, src: jnp.ndarray, pos: jnp.ndarray, query_embed: jnp.ndarray,
    task_token: jnp.ndarray, cfg: DecoderConfig,
) -> jnp.ndarray:
    """src/pos [B, S, C] (pe(mask_features) and class_input_proj(mask_features)
    — the reference passes them in this swapped order, decoder.py:434-437);
    query_embed [Q-1, C]; task_token [B, 1, C]. Returns [B, Q-1, C]."""
    b = src.shape[0]
    qe = jnp.broadcast_to(query_embed[None], (b,) + query_embed.shape)
    tgt = jnp.broadcast_to(task_token, (b, qe.shape[1], qe.shape[2]))
    memory = src  # encoder has 0 layers in every shipped config
    for i in range(cfg.class_dec_layers):
        tgt = _detr_dec_layer(p[f"dec_{i}"], tgt, memory, pos, qe, cfg.nheads)
    return _ln(p["decoder_norm"], tgt)


# ---------------------------------------------------------------------------
# main masked decoder
# ---------------------------------------------------------------------------

def _prediction_heads(p, output, mask_features, target_hw, cfg: DecoderConfig):
    """output [B, Q, C]; mask_features [B, H, W, C]. Returns
    (class_logits [B, Q, K+1], masks [B, Q, H, W], attn_mask [B, 1, Q, hw])."""
    x = _ln(p["decoder_norm"], output)
    cls = _dense(p["class_embed"], x)
    memb = _mlp(p["mask_embed"], x, 3)
    masks = jnp.einsum("bqc,bhwc->bqhw", memb, mask_features)
    b, q = masks.shape[:2]
    small = _resize_bilinear(
        masks.transpose(0, 2, 3, 1), target_hw
    ).transpose(0, 3, 1, 2)
    blocked = jax.nn.sigmoid(small.reshape(b, q, -1)) < 0.5
    # un-block fully-masked rows (decoder.py:454)
    all_blocked = jnp.all(blocked, axis=-1, keepdims=True)
    blocked = jnp.where(all_blocked, False, blocked)
    attn_mask = jnp.where(blocked, -jnp.inf, 0.0)[:, None, :, :]
    return cls, masks, attn_mask


def _masked_layer(p, output, src, pos, query_embed, attn_mask, nheads):
    # cross-attention first (decoder.py:456-476), then self-attn, then FFN;
    # all post-norm with dropout 0
    out2 = _mha(
        p["cross"]["attn"], output + query_embed, src + pos, src, nheads,
        mask=attn_mask,
    )
    output = _ln(p["cross"]["norm"], output + out2)
    q = k = output + query_embed
    output = _ln(p["self"]["norm"], output + _mha(p["self"]["attn"], q, k, output, nheads))
    h = jax.nn.relu(_dense(p["ffn"]["linear1"], output))
    output = _ln(p["ffn"]["norm"], output + _dense(p["ffn"]["linear2"], h))
    return output


def decoder_forward(
    params: Dict,
    multi_scale_features: Sequence[jnp.ndarray],  # [1/32, 1/16, 1/8] NHWC
    mask_features: jnp.ndarray,                   # [B, H/4, W/4, C]
    task_tokens: jnp.ndarray,                     # [B, 77] float ids
    cfg: DecoderConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (pred_logits [B, Q, K+1], pred_masks [B, Q, H/4, W/4])."""
    b = mask_features.shape[0]
    c = cfg.hidden_dim
    num_levels = 3

    src, pos, sizes = [], [], []
    for i in range(num_levels):
        x = multi_scale_features[i]
        h, w = x.shape[1], x.shape[2]
        sizes.append((h, w))
        pe = jnp.asarray(sine_position_embedding(h, w, c // 2)).reshape(1, h * w, c)
        pos.append(pe)
        flat = x.reshape(b, h * w, x.shape[3])
        if f"input_proj_{i}" in params:  # only when in_channels != hidden_dim
            flat = _dense(params[f"input_proj_{i}"], flat)
        src.append(flat + params["level_embed"][i][None, None])

    task = task_mlp_forward(params["task_mlp"], task_tokens)[:, None, :]  # [B,1,C]
    task = _ln(params["decoder_norm"], task)  # use_task_norm=True everywhere

    mf_pe = jnp.asarray(
        sine_position_embedding(mask_features.shape[1], mask_features.shape[2], c // 2)
    ).reshape(1, -1, c)
    mf_pe = jnp.broadcast_to(mf_pe, (b, mf_pe.shape[1], c))
    mf_proj = (
        mask_features.reshape(b, -1, mask_features.shape[3]) @ params["class_input_proj"]["kernel"]
        + params["class_input_proj"]["bias"]
    )
    out_t = class_transformer_forward(
        params["class_transformer"], mf_pe, mf_proj,
        params["query_embed"][:-1], task, cfg,
    )
    output = jnp.concatenate([out_t, task], axis=1)  # [B, Q, C]
    query_embed = params["query_embed"][None]  # [1, Q, C]

    cls, masks, attn_mask = _prediction_heads(
        params, output, mask_features, sizes[0], cfg
    )
    for i in range(cfg.dec_layers):
        li = i % num_levels
        output = _masked_layer(
            params[f"layer_{i}"], output, src[li], pos[li], query_embed,
            attn_mask, cfg.nheads,
        )
        cls, masks, attn_mask = _prediction_heads(
            params, output, mask_features, sizes[(i + 1) % num_levels], cfg
        )
    return cls, masks
