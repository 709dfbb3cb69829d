"""AutoencoderKL — the SD1.5 first stage (reference:
ldm/models/autoencoder.py:13-219 and the Encoder/Decoder CNNs in
ldm/modules/diffusionmodules/model.py:452-629).

NHWC, fp32 GroupNorm (eps 1e-6), single-head full-channel attention at the
bottleneck routed through the same flash-attention dispatch as the UNet.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ctrlora_tpu.configs import VAEConfig
from ctrlora_tpu.models.layers import Conv, GroupNorm32
from ctrlora_tpu.ops.flash_attention import dot_product_attention

Dtype = Any


class VAEResBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupNorm32(eps=1e-6, name="norm1", silu=True)(x)
        h = Conv(self.out_channels, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(eps=1e-6, name="norm2", silu=True)(h)
        h = Conv(self.out_channels, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = Conv(self.out_channels, kernel_size=(1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head full-channel self attention (reference: model.py:185-232)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hid = GroupNorm32(eps=1e-6, name="norm")(x)
        q = Conv(c, kernel_size=(1, 1), dtype=self.dtype, name="q")(hid)
        k = Conv(c, kernel_size=(1, 1), dtype=self.dtype, name="k")(hid)
        v = Conv(c, kernel_size=(1, 1), dtype=self.dtype, name="v")(hid)
        to_seq = lambda t: t.reshape(b, 1, h * w, c)
        out = dot_product_attention(to_seq(q), to_seq(k), to_seq(v))
        out = out.reshape(b, h, w, c)
        out = Conv(c, kernel_size=(1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = cfg.compute_dtype
        h = Conv(cfg.ch, dtype=dt, name="conv_in")(x.astype(dt))
        for level, mult in enumerate(cfg.ch_mult):
            ch = cfg.ch * mult
            for i in range(cfg.num_res_blocks):
                h = VAEResBlock(ch, dtype=dt, name=f"down_{level}_block_{i}")(h)
            if level != len(cfg.ch_mult) - 1:
                # asymmetric (0,1) pad + VALID stride-2 conv (reference:
                # model.py Downsample)
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = Conv(
                    ch, strides=(2, 2), padding="VALID", dtype=dt,
                    name=f"down_{level}_downsample",
                )(h)
        h = VAEResBlock(h.shape[-1], dtype=dt, name="mid_block_1")(h)
        h = VAEAttnBlock(dtype=dt, name="mid_attn_1")(h)
        h = VAEResBlock(h.shape[-1], dtype=dt, name="mid_block_2")(h)
        h = GroupNorm32(eps=1e-6, name="norm_out", silu=True)(h)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return Conv(out_ch, dtype=dt, name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        dt = cfg.compute_dtype
        ch = cfg.ch * cfg.ch_mult[-1]
        h = Conv(ch, dtype=dt, name="conv_in")(z.astype(dt))
        h = VAEResBlock(ch, dtype=dt, name="mid_block_1")(h)
        h = VAEAttnBlock(dtype=dt, name="mid_attn_1")(h)
        h = VAEResBlock(ch, dtype=dt, name="mid_block_2")(h)
        for level in reversed(range(len(cfg.ch_mult))):
            ch = cfg.ch * cfg.ch_mult[level]
            for i in range(cfg.num_res_blocks + 1):
                h = VAEResBlock(ch, dtype=dt, name=f"up_{level}_block_{i}")(h)
            if level != 0:
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = Conv(ch, dtype=dt, name=f"up_{level}_upsample")(h)
        h = GroupNorm32(eps=1e-6, name="norm_out", silu=True)(h)
        return Conv(cfg.out_channels, dtype=dt, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """KL-regularized autoencoder. encode() returns (mean, logvar) of the
    diagonal Gaussian posterior; use `sample_posterior` / `mode` to get z
    (reference: ldm/modules/distributions/distributions.py)."""

    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, name="decoder")
        self.quant_conv = Conv(
            2 * self.cfg.embed_dim if self.cfg.double_z else self.cfg.embed_dim,
            kernel_size=(1, 1), dtype=self.cfg.compute_dtype, name="quant_conv",
        )
        self.post_quant_conv = Conv(
            self.cfg.z_channels, kernel_size=(1, 1),
            dtype=self.cfg.compute_dtype, name="post_quant_conv",
        )

    def encode(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        moments = self.quant_conv(self.encoder(x)).astype(jnp.float32)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean, logvar

    def decode(self, z) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z)).astype(jnp.float32)

    def __call__(self, x, rng: Optional[jax.Array] = None):
        mean, logvar = self.encode(x)
        z = sample_posterior(mean, logvar, rng) if rng is not None else mean
        return self.decode(z), mean, logvar


def sample_posterior(mean: jnp.ndarray, logvar: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
