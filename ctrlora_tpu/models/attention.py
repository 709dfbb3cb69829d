"""Spatial transformer stack: cross/self attention, GEGLU FF, transformer
blocks (reference: ldm/modules/attention.py:145-341 and the IP-Adapter
variant ldm/modules/attention_ip.py:196-289).

All attention runs through ops.flash_attention.dot_product_attention, which
uses a Pallas online-softmax kernel on TPU — this single code path replaces
the reference's sliced-attention hack, xformers path, and fp32-QK autocast
escape hatch.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ctrlora_tpu.configs import LoRAConfig
from ctrlora_tpu.models.layers import Conv, Dense, GroupNorm32, LayerNorm32
from ctrlora_tpu.ops import kernel_flags
from ctrlora_tpu.ops.flash_attention import (
    dot_product_attention, dot_product_attention_bshd,
)
from ctrlora_tpu.parallel import tp

Dtype = Any


class _Kernel(nn.Module):
    """Declares a Dense-compatible bias-free kernel ({name}/kernel, same init
    RNG path as Dense) without applying it — lets the caller concatenate
    several projections into one MXU dot (q/k/v fusion cuts kernel-launch
    count, which is material on remote-dispatch runtimes)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features), jnp.float32,
        )


class _KernelBias(nn.Module):
    """Dense-compatible kernel+bias params ({name}/kernel, {name}/bias)
    without applying them — for hand-fused consumers (ops/geglu_ffn)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return (
            self.param(
                "kernel", nn.initializers.lecun_normal(),
                (in_features, self.features), jnp.float32,
            ),
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32),
        )


class CrossAttention(nn.Module):
    """Self- or cross-attention with optional LoRA on q/k/v/out and an
    optional IP-Adapter image branch (extra k/v projections over the last
    `ip_tokens` context tokens, output scaled by `ip_scale`)."""

    query_dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None  # None -> self attention
    dtype: Dtype = jnp.float32
    lora: Optional[LoRAConfig] = None
    use_flash: bool = True
    ip_tokens: int = 0

    @nn.compact
    def __call__(self, x, context=None, lora_idx=None, kv=None):
        """kv: optional precomputed [B, Sk, 2*inner] cross-attention K|V
        projection of the (sampler-loop-invariant) text context — the exact
        output of the fused `ctx @ [wk|wv]` dot below, hoisted out of the
        sampling scan by CtrLoraPipeline.xattn_kv_tables. Only valid on the
        fused/no-LoRA cross-attention path without an IP branch."""
        inner = self.heads * self.dim_head
        is_self = context is None
        ctx = x if is_self else context
        ip_ctx = None
        if self.ip_tokens > 0 and not is_self:
            # context = [text tokens | image-prompt tokens]
            ip_ctx = ctx[:, -self.ip_tokens:, :]
            ctx = ctx[:, : ctx.shape[1] - self.ip_tokens, :]
        assert kv is None or (not is_self and ip_ctx is None), (
            "hoisted kv applies only to plain cross-attention"
        )

        if self.lora is None or self.lora.n_loras == 0:
            # fused projections: the concatenated weight is loop-invariant
            # (hoisted out of the sampler scan), so self-attn q/k/v is ONE
            # dot and cross-attn k/v one dot instead of three/two
            in_f = x.shape[-1]
            wq = _Kernel(inner, name="to_q")(in_f)
            wk = _Kernel(inner, name="to_k")(ctx.shape[-1])
            wv = _Kernel(inner, name="to_v")(ctx.shape[-1])
            fuse_qkv = kernel_flags.flags().fuse_qkv is not False
            if is_self and fuse_qkv:
                qkv = jnp.dot(
                    x.astype(self.dtype),
                    jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype),
                )
                if (kernel_flags.flags().attn_qkv_packed is not False
                        and kernel_flags.flags().attn_layout == "bshd"
                        and tp.active() is None):
                    # skip the split: the packed kernel consumes the fused
                    # projection output directly (lane offsets 0/HD/2HD)
                    from ctrlora_tpu.ops.flash_attention import (
                        dot_product_attention_bshd_qkv,
                    )

                    b, sq = qkv.shape[0], qkv.shape[1]
                    out = dot_product_attention_bshd_qkv(
                        qkv, self.heads, self.dim_head,
                        use_flash=self.use_flash,
                    ).reshape(b, sq, inner)
                    return Dense(
                        self.query_dim, dtype=self.dtype, lora=self.lora,
                        name="to_out",
                    )(out, lora_idx)
                q, k, v = jnp.split(qkv, 3, axis=-1)
            elif is_self:
                xc = x.astype(self.dtype)
                q = jnp.dot(xc, wq.astype(self.dtype))
                k = jnp.dot(xc, wk.astype(self.dtype))
                v = jnp.dot(xc, wv.astype(self.dtype))
            else:
                q = jnp.dot(x.astype(self.dtype), wq.astype(self.dtype))
                if kv is None:
                    kv = jnp.dot(
                        ctx.astype(self.dtype),
                        jnp.concatenate([wk, wv], axis=1).astype(self.dtype),
                    )
                k, v = jnp.split(kv, 2, axis=-1)
        else:
            assert kv is None, "hoisted kv requires the fused/no-LoRA path"
            dense = lambda name: Dense(
                inner, use_bias=False, dtype=self.dtype, lora=self.lora, name=name
            )
            q = dense("to_q")(x, lora_idx)
            k = dense("to_k")(ctx, lora_idx)
            v = dense("to_v")(ctx, lora_idx)

        # TP: shard the head-major inner dim over the model axis (whole
        # heads per shard) — the projection dots partition column-wise and
        # the attention einsum runs collective-free per head group.
        # model_units=heads: when heads % tp != 0 the constraint is skipped
        # (a shard boundary inside dim_head would reshard around the einsum)
        q, k, v = (
            tp.constrain(t, "data", None, "model", model_units=self.heads)
            for t in (q, k, v)
        )

        b, sq, _ = q.shape
        split = lambda t: t.reshape(b, t.shape[1], self.heads, self.dim_head).transpose(0, 2, 1, 3)

        heads4 = lambda t: t.reshape(b, t.shape[1], self.heads, self.dim_head)
        if tp.active() is not None:
            # TP: shard_map the flash kernel over whole head groups (or the
            # XLA path for non-dividing shapes) — see tp.attention_bshd
            out = tp.attention_bshd(
                heads4(q), heads4(k), heads4(v), use_flash=self.use_flash
            ).reshape(b, sq, inner)
        elif kernel_flags.flags().attn_layout == "bshd":
            # DEFAULT since the 2026-08-18 ledger A/B (4.126 vs 4.399
            # s/batch): head-split WITHOUT the BHSD transpose — the
            # hd-packed flash kernel slices head columns itself, saving a
            # layout copy of q/k/v/out per site. CTRLORA_KERNELS=bhsd
            # restores the transpose path for comparisons.
            out = dot_product_attention_bshd(
                heads4(q), heads4(k), heads4(v), use_flash=self.use_flash
            ).reshape(b, sq, inner)
        else:
            out = dot_product_attention(
                split(q), split(k), split(v), use_flash=self.use_flash
            )
            out = out.transpose(0, 2, 1, 3).reshape(b, sq, inner)

        if ip_ctx is not None:
            # IP-Adapter branch (reference: attention_ip.py:208-288): separate
            # k/v over image tokens, same queries; summed with per-layer scale.
            k_ip = Dense(inner, use_bias=False, dtype=self.dtype, name="to_k_ip")(ip_ctx)
            v_ip = Dense(inner, use_bias=False, dtype=self.dtype, name="to_v_ip")(ip_ctx)
            out_ip = dot_product_attention(
                split(q), split(k_ip), split(v_ip), use_flash=False
            )
            out_ip = out_ip.transpose(0, 2, 1, 3).reshape(b, sq, inner)
            ip_scale = self.param("ip_scale", nn.initializers.ones, (), jnp.float32)
            out = out + ip_scale.astype(out.dtype) * out_ip

        return Dense(self.query_dim, dtype=self.dtype, lora=self.lora, name="to_out")(
            out, lora_idx
        )


class FeedForward(nn.Module):
    """GEGLU feed-forward (reference: attention.py:48-75, glu=True)."""

    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32
    lora: Optional[LoRAConfig] = None

    @nn.compact
    def __call__(self, x, lora_idx=None):
        inner = self.dim * self.mult
        if self.lora is None or self.lora.n_loras == 0:
            # hand-fused path: the [*, 2*inner] up-projection never touches
            # HBM (ops/geglu_ffn.py — the profiled XLA down-proj fusion reads
            # it back HBM-bound at ~1/3 of peak bandwidth). Same param names
            # as the Dense path, so checkpoints and the fused-LoRA trees are
            # unaffected.
            from ctrlora_tpu.ops.geglu_ffn import geglu_ffn, geglu_shapes_ok

            w1, b1 = _KernelBias(inner * 2, name="proj")(x.shape[-1])
            w2, b2 = _KernelBias(self.dim, name="out")(inner)
            xc = x.astype(self.dtype)
            if geglu_shapes_ok(xc, w1, b1, w2, b2):
                return geglu_ffn(xc, w1, b1, w2, b2)
            h = jnp.dot(xc, w1.astype(self.dtype)) + b1.astype(self.dtype)
            h, gate = jnp.split(h, 2, axis=-1)
            # TP: GEGLU hidden sharded over model — up-proj columns split,
            # down-proj contracts the sharded dim (one psum per FF)
            h = tp.constrain(h, "data", None, "model")
            gate = tp.constrain(gate, "data", None, "model")
            h = h * nn.gelu(gate, approximate=False)
            return jnp.dot(h, w2.astype(self.dtype)) + b2.astype(self.dtype)
        h = Dense(inner * 2, dtype=self.dtype, lora=self.lora, name="proj")(x, lora_idx)
        h, gate = jnp.split(h, 2, axis=-1)
        h = tp.constrain(h, "data", None, "model")
        gate = tp.constrain(gate, "data", None, "model")
        h = h * nn.gelu(gate, approximate=False)
        return Dense(self.dim, dtype=self.dtype, lora=self.lora, name="out")(h, lora_idx)


class BasicTransformerBlock(nn.Module):
    """Pre-LN self-attn -> cross-attn -> FF block (reference:
    attention.py:246-275). The three LayerNorms are 'norm'-named and so are
    banked/trainable under the reference's name-filter rules."""

    dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int]
    dtype: Dtype = jnp.float32
    lora: Optional[LoRAConfig] = None
    use_flash: bool = True
    ip_tokens: int = 0

    @nn.compact
    def __call__(self, x, context, lora_idx=None, kv=None):
        banks = (
            self.lora.n_loras
            if (self.lora is not None and self.lora.switchable_banks)
            else 0
        )
        h = LayerNorm32(n_banks=banks, name="norm1")(x, lora_idx)
        x = x + CrossAttention(
            query_dim=self.dim, heads=self.heads, dim_head=self.dim_head,
            dtype=self.dtype, lora=self.lora, use_flash=self.use_flash, name="attn1",
        )(h, None, lora_idx)
        h = LayerNorm32(n_banks=banks, name="norm2")(x, lora_idx)
        x = x + CrossAttention(
            query_dim=self.dim, heads=self.heads, dim_head=self.dim_head,
            context_dim=self.context_dim, dtype=self.dtype, lora=self.lora,
            use_flash=self.use_flash, ip_tokens=self.ip_tokens, name="attn2",
        )(h, context, lora_idx, kv)
        h = LayerNorm32(n_banks=banks, name="norm3")(x, lora_idx)
        x = x + FeedForward(self.dim, dtype=self.dtype, lora=self.lora, name="ff")(
            h, lora_idx
        )
        return x


class SpatialTransformer(nn.Module):
    """GroupNorm -> 1x1 proj -> transformer blocks -> zero 1x1 proj, residual
    (reference: attention.py:278-341, use_linear=False)."""

    heads: int
    dim_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    lora: Optional[LoRAConfig] = None
    use_flash: bool = True
    ip_tokens: int = 0

    @nn.compact
    def __call__(self, x, context, lora_idx=None, kv_rows=None):
        """kv_rows: optional per-depth tuple of hoisted cross-attn K|V
        projections (see CrossAttention.kv)."""
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        banks = (
            self.lora.n_loras
            if (self.lora is not None and self.lora.switchable_banks)
            else 0
        )
        x_in = x
        x = GroupNorm32(eps=1e-6, n_banks=banks, name="norm")(x, lora_idx)
        x = Conv(inner, kernel_size=(1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, inner)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                dim=inner, heads=self.heads, dim_head=self.dim_head,
                context_dim=self.context_dim, dtype=self.dtype, lora=self.lora,
                use_flash=self.use_flash, ip_tokens=self.ip_tokens,
                name=f"block_{i}",
            )(x, context, lora_idx, None if kv_rows is None else kv_rows[i])
        x = x.reshape(b, h, w, inner)
        x = Conv(
            c, kernel_size=(1, 1), dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="proj_out",
        )(x)
        return x + x_in
