"""Core layers: LoRA-aware dense, fp32 norms, banked (switchable) layers,
ResBlock and resampling.

TPU-native design decisions (vs the reference, cldm/ + ldm/):
  * NHWC layout everywhere — XLA's native conv layout on TPU.
  * Params are fp32; compute dtype is configurable (bfloat16 by default);
    GroupNorm/LayerNorm always reduce in fp32 (reference: GroupNorm32,
    ldm/modules/diffusionmodules/util.py:217).
  * LoRA adapters are stacked along a leading [n_loras] axis and selected by
    an integer index at call time. Switching adapters is a traced gather, not
    python module surgery (reference: cldm/cldm_ctrlora_pretrain.py:68-75).
  * "Switchable" zero convs / norms (reference: cldm/switchable.py) are the
    same trick: a parameter bank with a leading [n_loras] axis.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ctrlora_tpu.configs import LoRAConfig
from ctrlora_tpu.schedules import timestep_embedding

Dtype = Any


def _take(bank: jnp.ndarray, idx: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Select one slice of a [n_banks, ...] parameter bank.

    mode='clip' so an out-of-range index selects the last bank instead of
    silently producing NaNs (jnp.take's default fill mode).
    """
    if idx is None:
        idx = 0
    return jnp.take(bank, idx, axis=0, mode="clip")


class Dense(nn.Module):
    """Linear layer with optional stacked LoRA adapters.

    Computes ``y = x @ W + b + lora_scale * (x @ down[i]) @ up[i]`` where ``i``
    is `lora_idx`. LoRA math follows the reference primitives
    (cldm/lora.py:26-80,225-291): down ~ N(0, 1/rank^2), up = 0, optional
    network_alpha/rank scaling.
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    lora: Optional[LoRAConfig] = None
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x, lora_idx: Optional[jnp.ndarray] = None, lora_scale: float = 1.0):
        in_features = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (in_features, self.features), jnp.float32)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        if self.lora is not None and self.lora.n_loras > 0:
            rank = self.lora.rank
            down = self.param(
                "lora_down",
                nn.initializers.normal(stddev=1.0 / rank),
                (self.lora.n_loras, in_features, rank),
                jnp.float32,
            )
            up = self.param(
                "lora_up", nn.initializers.zeros,
                (self.lora.n_loras, rank, self.features), jnp.float32,
            )
            d = _take(down, lora_idx).astype(self.dtype)
            u = _take(up, lora_idx).astype(self.dtype)
            z = jnp.dot(jnp.dot(x.astype(self.dtype), d), u)
            if self.lora.network_alpha is not None:
                z = z * (self.lora.network_alpha / rank)
            y = y + lora_scale * z
        return y


class GroupNorm32(nn.Module):
    """GroupNorm computed in fp32 regardless of input dtype.

    Matches torch GroupNorm semantics (reference GroupNorm32,
    ldm/modules/diffusionmodules/util.py:217: eps 1e-5 for UNet norms;
    Normalize() uses eps 1e-6 for transformer/VAE norms).
    Optionally holds a bank of [n_banks] affine params (switchable norms,
    reference cldm/switchable.py:5).
    """

    num_groups: int = 32
    eps: float = 1e-5
    n_banks: int = 0
    # fuse the SiLU that follows every UNet/VAE norm into the same kernel
    # pass (one HBM read + write instead of two)
    silu: bool = False

    @nn.compact
    def __call__(self, x, bank_idx: Optional[jnp.ndarray] = None,
                 add_row: Optional[jnp.ndarray] = None):
        """add_row [C]/[1,C]/[B,C]: normalize (x + add_row) without
        materializing the sum — the row folds into the stats epilogue
        (ops/group_norm.py). Inside the DDIM scan a loop-varying broadcast
        add costs a full extra HBM pass per block; this makes it free."""
        orig_dtype = x.dtype
        c = x.shape[-1]
        shape = (self.n_banks, c) if self.n_banks > 0 else (c,)
        scale = self.param("scale", nn.initializers.ones, shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, shape, jnp.float32)
        if self.n_banks > 0:
            scale = _take(scale, bank_idx)
            bias = _take(bias, bank_idx)
        # real models always have c % 32 == 0; tiny test configs fall back to
        # the largest group count that divides c
        g = self.num_groups if c % self.num_groups == 0 else math.gcd(c, self.num_groups)
        if scale.ndim == 1:  # unbanked (or bank already selected to [C])
            from ctrlora_tpu.ops.group_norm import group_norm, group_norm_ok

            if group_norm_ok(x, g):
                return group_norm(x, scale, bias, add_row, g, self.eps,
                                  self.silu)
        if add_row is not None:
            row = add_row.astype(jnp.float32).reshape(-1, c)
            x = x.astype(jnp.float32) + row.reshape(
                row.shape[0], *([1] * (x.ndim - 2)), c
            )
        x = x.astype(jnp.float32)
        spatial = x.shape[1:-1]
        xg = x.reshape(x.shape[0], -1, g, c // g)
        mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
        var = jnp.var(xg, axis=(1, 3), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        x = xg.reshape(x.shape[0], *spatial, c)
        x = x * scale + bias
        if self.silu:
            x = x * jax.nn.sigmoid(x)
        return x.astype(orig_dtype)


class LayerNorm32(nn.Module):
    """LayerNorm computed in fp32 (torch default eps 1e-5), optionally banked."""

    eps: float = 1e-5
    n_banks: int = 0

    @nn.compact
    def __call__(self, x, bank_idx: Optional[jnp.ndarray] = None):
        orig_dtype = x.dtype
        c = x.shape[-1]
        shape = (self.n_banks, c) if self.n_banks > 0 else (c,)
        scale = self.param("scale", nn.initializers.ones, shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, shape, jnp.float32)
        if self.n_banks > 0:
            scale = _take(scale, bank_idx)
            bias = _take(bias, bank_idx)
        x = x.astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + self.eps)
        x = x * scale + bias
        return x.astype(orig_dtype)


class Conv(nn.Module):
    """NHWC conv with fp32 params and configurable compute dtype."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    # None -> torch-style symmetric padding (k-1)//2 on both sides; this is
    # NOT XLA 'SAME' for strided convs (SAME splits odd padding (0,1), torch
    # pads (1,1) and shifts the sampling grid)
    padding: Any = None
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", self.kernel_init,
            (*self.kernel_size, x.shape[-1], self.features), jnp.float32,
        )
        padding = self.padding
        if padding is None:
            padding = [((k - 1) // 2, (k - 1) // 2) for k in self.kernel_size]
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=self.strides,
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class ZeroConv(nn.Module):
    """1x1 zero-initialized conv, optionally with a [n_banks] parameter bank.

    The 13 control residual taps (reference: cldm/cldm.py:281-282); banked in
    the switchable inference model (reference: cldm/cldm_ctrlora_inference.py:
    32-39, SwitchableConv2d).
    """

    features: int
    n_banks: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bank_idx: Optional[jnp.ndarray] = None):
        cin = x.shape[-1]
        kshape = (1, 1, cin, self.features)
        bshape = (self.features,)
        if self.n_banks > 0:
            kshape = (self.n_banks, *kshape)
            bshape = (self.n_banks, *bshape)
        kernel = self.param("kernel", nn.initializers.zeros, kshape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, bshape, jnp.float32)
        if self.n_banks > 0:
            kernel = _take(kernel, bank_idx)
            bias = _take(bias, bank_idx)
        # 1x1 conv == matmul over the channel dim; cheaper than conv on TPU.
        y = jnp.dot(x.astype(self.dtype), kernel[0, 0].astype(self.dtype))
        return y + bias.astype(self.dtype)


class TimestepEmbed(nn.Module):
    """Sinusoidal embedding -> 2-layer SiLU MLP (reference: cldm/cldm.py:132)."""

    model_channels: int
    dtype: Dtype = jnp.float32
    lora: Optional[LoRAConfig] = None

    @nn.compact
    def __call__(self, timesteps, lora_idx=None):
        emb = timestep_embedding(timesteps, self.model_channels)
        dim = self.model_channels * 4
        emb = Dense(dim, dtype=self.dtype, lora=self.lora, name="dense0")(emb, lora_idx)
        emb = nn.silu(emb)
        emb = Dense(dim, dtype=self.dtype, lora=self.lora, name="dense1")(emb, lora_idx)
        return emb


class ResBlock(nn.Module):
    """UNet residual block (reference: openaimodel.py:162-276, no scale-shift).

    Note the timestep-embedding projection is a Linear, so it carries a LoRA
    site in the control branch (the reference wraps *every* nn.Linear:
    cldm/cldm_ctrlora_pretrain.py:26). The GroupNorms here are named
    in_layers.0/out_layers.0 in torch — NOT matched by the reference's
    'norm' filters, so they are never banked or norm-trainable.
    """

    out_channels: int
    dtype: Dtype = jnp.float32
    lora: Optional[LoRAConfig] = None

    @nn.compact
    def __call__(self, x, emb, lora_idx: Optional[jnp.ndarray] = None,
                 emb_row: Optional[jnp.ndarray] = None):
        """emb_row [1, C]: precomputed emb_proj output for this block (the
        timestep is uniform across the batch in samplers, so one row serves
        the whole batch; pipeline.emb_proj_tables). The row is folded into
        out_norm's stats epilogue rather than added to h: a loop-varying
        broadcast add inside the DDIM scan costs a separate full-tensor HBM
        pass per block, ~22.6 ms/step over the ~35 blocks
        (perf/step_glue2.py bisect). When given, `emb` is unused and may be
        None."""
        h = GroupNorm32(name="in_norm", silu=True)(x)
        h = Conv(self.out_channels, dtype=self.dtype, name="in_conv")(h)
        if emb_row is None:
            emb_row = Dense(
                self.out_channels, dtype=self.dtype, lora=self.lora, name="emb_proj"
            )(nn.silu(emb), lora_idx)
        h = GroupNorm32(name="out_norm", silu=True)(h, add_row=emb_row)
        h = Conv(
            self.out_channels, dtype=self.dtype, name="out_conv",
            kernel_init=nn.initializers.zeros,
        )(h)
        if x.shape[-1] != self.out_channels:
            x = Conv(self.out_channels, kernel_size=(1, 1), dtype=self.dtype, name="skip")(x)
        from ctrlora_tpu.ops.kernel_flags import flags

        if flags().split_res_add is not False:
            # keep the residual add OUT of the conv fusion: XLA's fused
            # conv+add epilogue runs the dominant 64x64x320 convs at 0.53
            # MFU vs 0.70 unfused (hlo_stats 2026-08-19). Default ON after
            # the interleaved A/B won 4.083 vs 4.135 s/batch with
            # bit-identical checksums (ledger 2026-08-19);
            # CTRLORA_KERNELS=split_res_add=0 restores the fusion.
            h = jax.lax.optimization_barrier(h)
        return x + h


class Downsample(nn.Module):
    """Stride-2 conv downsample (reference: openaimodel.py:134-159)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return Conv(
            self.out_channels, strides=(2, 2), dtype=self.dtype, name="conv"
        )(x)


class Upsample(nn.Module):
    """Nearest 2x upsample + conv (reference: openaimodel.py:90-118)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return Conv(self.out_channels, dtype=self.dtype, name="conv")(x)
