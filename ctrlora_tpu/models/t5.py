"""Frozen T5 text encoder (reference: ldm/modules/encoders/modules.py:58-86,
FrozenT5Embedder on google/t5-v1_1-large).

No ctrlora config instantiates this encoder — it exists for surface parity
with the vendored SD codebase's conditioning options. T5 v1.1 encoder
architecture: shared token embedding, pre-RMSNorm blocks of (self-attention
with bucketed relative position bias, gated-GELU feed-forward), final
RMSNorm. No biases anywhere; attention is NOT 1/sqrt(d)-scaled (T5 folds the
scale into the initialization).

The weight bridge consumes the HF `T5EncoderModel` state-dict naming
(`t5_entries`); parity is tested against a randomly initialized
transformers T5EncoderModel (tests/test_t5.py). Tokenization (SentencePiece)
is not vendored — `FrozenT5Embedder.encode` takes pre-tokenized ids, or a
callable tokenizer when one is available.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 1024  # t5-v1_1-large
    d_kv: int = 64
    d_ff: int = 2816
    num_layers: int = 24
    num_heads: int = 16
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    max_length: int = 77  # the reference pads/truncates to 77


class RMSNorm(nn.Module):
    """T5LayerNorm: no mean subtraction, no bias, fp32 accumulation."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * w


def _relative_position_bucket(rel_pos: np.ndarray, num_buckets: int,
                              max_distance: int) -> np.ndarray:
    """Bidirectional bucketing (HF T5Attention._relative_position_bucket)."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(np.int64) * num_buckets
    n = np.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    large = max_exact + (
        np.log(n.clip(1) / max_exact) / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    return ret + np.where(is_small, n, large)


def position_bias_table(seq_len: int, cfg: T5Config) -> np.ndarray:
    """[seq, seq] int bucket ids for the relative_attention_bias lookup."""
    ctx = np.arange(seq_len)[:, None]
    mem = np.arange(seq_len)[None, :]
    return _relative_position_bucket(
        mem - ctx, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )


class T5Attention(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, position_bias):
        cfg = self.cfg
        b, s, _ = x.shape
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda feat, name: nn.Dense(feat, use_bias=False, name=name)
        split = lambda t: t.reshape(b, s, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        q = split(dense(inner, "q")(x))  # NOT scaled (T5 convention)
        k = split(dense(inner, "k")(x))
        v = split(dense(inner, "v")(x))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits + position_bias
        w = nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, inner)
        return dense(self.cfg.d_model, "o")(out)


class T5Block(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, position_bias):
        cfg = self.cfg
        h = RMSNorm(cfg.layer_norm_epsilon, name="ln_attn")(x)
        x = x + T5Attention(cfg, name="attn")(h, position_bias)
        h = RMSNorm(cfg.layer_norm_epsilon, name="ln_ff")(x)
        gate = nn.gelu(
            nn.Dense(cfg.d_ff, use_bias=False, name="wi_0")(h), approximate=True
        )
        h = gate * nn.Dense(cfg.d_ff, use_bias=False, name="wi_1")(h)
        h = nn.Dense(cfg.d_model, use_bias=False, name="wo")(h)
        return x + h


class T5TextModel(nn.Module):
    """input_ids [B, S] -> last hidden state [B, S, d_model] (the
    reference returns outputs.last_hidden_state, modules.py:83)."""

    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        b, s = input_ids.shape
        tok = self.param(
            "token_embedding", nn.initializers.normal(1.0),
            (cfg.vocab_size, cfg.d_model),
        )
        x = jnp.take(tok, input_ids, axis=0)
        rel = self.param(
            "relative_attention_bias", nn.initializers.normal(0.02),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
        )
        buckets = jnp.asarray(position_bias_table(s, cfg))
        # [S, S, H] -> [1, H, S, S], shared by every layer (HF computes it
        # in block 0 and threads it through)
        bias = jnp.take(rel, buckets, axis=0).transpose(2, 0, 1)[None]
        for i in range(cfg.num_layers):
            x = T5Block(cfg, name=f"block_{i}")(x, bias)
        return RMSNorm(cfg.layer_norm_epsilon, name="final_layer_norm")(x)


def t5_entries(cfg: T5Config) -> Dict[str, tuple]:
    """HF T5EncoderModel state-dict name -> (our tree path, transform)."""
    t = lambda w: w.T  # torch Linear [out, in] -> [in, out]
    ident = lambda w: w
    e: Dict[str, tuple] = {
        "shared.weight": (("token_embedding",), ident),
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight":
            (("relative_attention_bias",), ident),
        "encoder.final_layer_norm.weight": (("final_layer_norm", "weight"), ident),
    }
    for i in range(cfg.num_layers):
        hf = f"encoder.block.{i}.layer"
        ours = f"block_{i}"
        for nm in ("q", "k", "v", "o"):
            e[f"{hf}.0.SelfAttention.{nm}.weight"] = ((ours, "attn", nm, "kernel"), t)
        e[f"{hf}.0.layer_norm.weight"] = ((ours, "ln_attn", "weight"), ident)
        for nm in ("wi_0", "wi_1", "wo"):
            e[f"{hf}.1.DenseReluDense.{nm}.weight"] = ((ours, nm, "kernel"), t)
        e[f"{hf}.1.layer_norm.weight"] = ((ours, "ln_ff", "weight"), ident)
    return e


def convert_t5(sd: Dict[str, np.ndarray], cfg: T5Config) -> Dict:
    params: Dict = {}
    for hf_name, (path, tf) in t5_entries(cfg).items():
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(tf(np.asarray(sd[hf_name], np.float32)))
    return {"params": params}


class FrozenT5Embedder:
    """API-parity wrapper (reference FrozenT5Embedder, modules.py:58-86)."""

    def __init__(self, cfg: T5Config = T5Config(), params=None,
                 tokenize: Optional[Callable] = None):
        self.cfg = cfg
        self.model = T5TextModel(cfg)
        self.params = params
        self.tokenize = tokenize

    def encode(self, ids_or_text) -> jnp.ndarray:
        if isinstance(ids_or_text, (list, tuple)) and ids_or_text and isinstance(
            ids_or_text[0], str
        ):
            if self.tokenize is None:
                raise RuntimeError(
                    "T5 SentencePiece tokenizer unavailable on this host; "
                    "pass pre-tokenized ids or a `tokenize` callable"
                )
            ids_or_text = self.tokenize(ids_or_text)
        return self.model.apply(self.params, jnp.asarray(ids_or_text))
