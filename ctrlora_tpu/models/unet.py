"""SD1.5 UNet with control-residual injection, and the ControlNet branch.

Topology matches the reference UNetModel
(ldm/modules/diffusionmodules/openaimodel.py:412-786) and ControlNet
(cldm/cldm.py:48-305): 320 base channels, mult (1,2,4,4), 2 res blocks per
level, depth-1 spatial transformers at downsample ratios 1/2/4, 8 heads with
per-resolution head dim ch//8 (legacy=False).

TPU-first differences: NHWC, bf16 compute with fp32 norms, Pallas flash
attention, rematerialization via nn.remat instead of torch checkpointing,
and LoRA/banked params addressed by a traced integer instead of module
surgery. The frozen encoder of the controlled UNet needs no no_grad — params
outside the optimizer mask simply receive no updates.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ctrlora_tpu.configs import ControlNetConfig, LoRAConfig, UNetConfig
from ctrlora_tpu.models.attention import SpatialTransformer
from ctrlora_tpu.models.layers import (
    Conv, Dense, Downsample, GroupNorm32, ResBlock, TimestepEmbed, Upsample, ZeroConv,
)


@dataclasses.dataclass(frozen=True)
class EncoderStep:
    kind: str  # 'conv' | 'res' | 'down'
    out_ch: int
    attn: bool = False
    ds: int = 1


def encoder_plan(cfg: UNetConfig) -> Tuple[List[EncoderStep], List[int], int]:
    """Static topology of the 12 input blocks; returns (steps, skip_chans, ch)."""
    steps = [EncoderStep("conv", cfg.model_channels)]
    chans = [cfg.model_channels]
    ch, ds = cfg.model_channels, 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            ch = mult * cfg.model_channels
            steps.append(EncoderStep("res", ch, attn=ds in cfg.attention_resolutions, ds=ds))
            chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            steps.append(EncoderStep("down", ch, ds=ds))
            chans.append(ch)
            ds *= 2
    return steps, chans, ch


@dataclasses.dataclass(frozen=True)
class DecoderStep:
    skip_ch: int
    out_ch: int
    attn: bool
    upsample: bool
    ds: int


def decoder_plan(cfg: UNetConfig) -> List[DecoderStep]:
    _, chans, _ = encoder_plan(cfg)
    chans = list(chans)
    ds = 2 ** (len(cfg.channel_mult) - 1)
    steps = []
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            skip = chans.pop()
            out_ch = cfg.model_channels * mult
            up = level > 0 and i == cfg.num_res_blocks
            steps.append(
                DecoderStep(skip, out_ch, attn=ds in cfg.attention_resolutions, upsample=up, ds=ds)
            )
            if up:
                ds //= 2
    return steps


def _res(cfg: UNetConfig, out_ch: int, lora, name: str):
    cls = nn.remat(ResBlock) if cfg.use_checkpoint else ResBlock
    return cls(out_channels=out_ch, dtype=cfg.compute_dtype, lora=lora, name=name)


def _attn(cfg: UNetConfig, ch: int, lora, name: str):
    cls = nn.remat(SpatialTransformer) if cfg.use_checkpoint else SpatialTransformer
    return cls(
        heads=cfg.num_heads,
        dim_head=ch // cfg.num_heads,
        depth=cfg.transformer_depth,
        context_dim=cfg.context_dim,
        dtype=cfg.compute_dtype,
        lora=lora,
        use_flash=cfg.use_flash_attention,
        ip_tokens=cfg.ip_tokens,
        name=name,
    )


class UNet(nn.Module):
    """Controlled SD UNet (reference: ControlledUnetModel, cldm/cldm.py:22-45).

    `control` is a tuple of 13 residuals: index 0..11 add onto the encoder
    skip tensors (consumed in reverse by the decoder), index 12 adds onto the
    middle-block output.
    """

    cfg: UNetConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, H, W, C] noisy latent
        timesteps: jnp.ndarray,  # [B]
        context: jnp.ndarray,  # [B, S, context_dim]
        control: Optional[Sequence[jnp.ndarray]] = None,
        only_mid_control: bool = False,
        control_mode: str = "decoder",
        emb_rows: Optional[dict] = None,
        kv_rows: Optional[dict] = None,
    ) -> jnp.ndarray:
        """control_mode='decoder': residuals add onto skip connections and
        middle (standard ControlNet, cldm/cldm.py:22-45). 'encoder': residuals
        add onto encoder outputs (ControlNet-Lite, cldm/cldm_lite.py:20-42).

        emb_rows: {res_block_name: [C]} precomputed emb_proj outputs for a
        batch-uniform timestep (CtrLoraPipeline.emb_proj_tables). Skips the
        in-graph TimestepEmbed + per-block projections entirely.
        kv_rows: {attn_site_name: per-depth kv tuple} hoisted cross-attn K|V
        projections of the loop-invariant context
        (CtrLoraPipeline.xattn_kv_tables)."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        if emb_rows is None:
            emb = TimestepEmbed(cfg.model_channels, dtype=dt, name="time_embed")(timesteps)
        else:
            emb = None
        row = lambda name: None if emb_rows is None else emb_rows[name]
        kvr = lambda name: None if kv_rows is None else kv_rows.get(name)
        context = context.astype(dt)
        enc_side = control is not None and control_mode == "encoder"

        hs = []
        h = x.astype(dt)
        for i, step in enumerate(encoder_plan(cfg)[0]):
            if step.kind == "conv":
                h = Conv(step.out_ch, dtype=dt, name="in_conv")(h)
            elif step.kind == "res":
                h = _res(cfg, step.out_ch, None, f"in_{i}_res")(h, emb, None, row(f"in_{i}_res"))
                if step.attn:
                    h = _attn(cfg, step.out_ch, None, f"in_{i}_attn")(
                        h, context, None, kvr(f"in_{i}_attn"))
            else:
                h = Downsample(step.out_ch, dtype=dt, name=f"in_{i}_down")(h)
            if enc_side:
                h = h + control[i].astype(dt)
            hs.append(h)

        ch = hs[-1].shape[-1]
        h = _res(cfg, ch, None, "mid_res0")(h, emb, None, row("mid_res0"))
        h = _attn(cfg, ch, None, "mid_attn")(h, context, None, kvr("mid_attn"))
        h = _res(cfg, ch, None, "mid_res1")(h, emb, None, row("mid_res1"))

        n_enc = len(hs)
        if control is not None:
            assert len(control) == n_enc + 1, (
                f"expected {n_enc + 1} control residuals, got {len(control)}"
            )
            h = h + control[n_enc].astype(dt)

        for i, step in enumerate(decoder_plan(cfg)):
            skip = hs.pop()
            if control is not None and not only_mid_control and not enc_side:
                skip = skip + control[n_enc - 1 - i].astype(dt)
            h = jnp.concatenate([h, skip], axis=-1)
            h = _res(cfg, step.out_ch, None, f"out_{i}_res")(h, emb, None, row(f"out_{i}_res"))
            if step.attn:
                h = _attn(cfg, step.out_ch, None, f"out_{i}_attn")(
                    h, context, None, kvr(f"out_{i}_attn"))
            if step.upsample:
                h = Upsample(step.out_ch, dtype=dt, name=f"out_{i}_up")(h)

        h = GroupNorm32(name="norm_out", silu=True)(h)
        h = Conv(
            cfg.out_channels, dtype=dt, kernel_init=nn.initializers.zeros, name="conv_out"
        )(h)
        return h.astype(jnp.float32)


class HintBlock(nn.Module):
    """8-conv stride-2 hint encoder, 3ch pixels -> model_channels latents
    (reference: cldm/cldm.py:147-163). Only used in hint_mode='image'."""

    model_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hint):
        widths = [(16, 1), (16, 1), (32, 2), (32, 1), (96, 2), (96, 1), (256, 2)]
        h = hint.astype(self.dtype)
        for i, (w, s) in enumerate(widths):
            h = Conv(w, strides=(s, s), dtype=self.dtype, name=f"conv_{i}")(h)
            h = nn.silu(h)
        return Conv(
            self.model_channels, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="conv_out",
        )(h)


class ControlNet(nn.Module):
    """Control branch: UNet encoder + middle with zero-conv taps.

    hint_mode='latent' (CtrLoRA): the VAE-encoded hint IS the input stream;
    the noisy latent x is not consumed (reference:
    cldm/cldm_ctrlora_pretrain.py:52-66).
    hint_mode='image' (vanilla ControlNet): x enters in_conv and the encoded
    pixel hint is added after block 0 (reference: cldm/cldm.py:284-305).
    """

    cfg: ControlNetConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # latent hint ('latent' mode) or noisy latent ('image')
        timesteps: jnp.ndarray,
        context: jnp.ndarray,
        hint: Optional[jnp.ndarray] = None,  # pixel hint, 'image' mode only
        lora_idx: Optional[jnp.ndarray] = None,
        lora_scale: float = 1.0,
        emb_rows: Optional[dict] = None,
        kv_rows: Optional[dict] = None,
    ) -> Tuple[jnp.ndarray, ...]:
        cfg = self.cfg
        ucfg = cfg.unet
        dt = ucfg.compute_dtype
        lora = cfg.lora if cfg.lora.n_loras > 0 else None
        banks = cfg.lora.n_loras if cfg.lora.switchable_banks else 0

        if emb_rows is None:
            emb = TimestepEmbed(ucfg.model_channels, dtype=dt, lora=lora, name="time_embed")(
                timesteps, lora_idx
            )
        else:
            emb = None
        row = lambda name: None if emb_rows is None else emb_rows[name]
        kvr = lambda name: None if kv_rows is None else kv_rows.get(name)
        context = context.astype(dt)

        guided = None
        if cfg.hint_mode == "image":
            assert hint is not None, "hint_mode='image' requires a pixel hint"
            guided = HintBlock(ucfg.model_channels, dtype=dt, name="hint_block")(hint)

        outs = []
        h = x.astype(dt)
        for i, step in enumerate(encoder_plan(ucfg)[0]):
            if step.kind == "conv":
                h = Conv(step.out_ch, dtype=dt, name="in_conv")(h)
                if guided is not None:
                    h = h + guided
            elif step.kind == "res":
                h = _res(ucfg, step.out_ch, lora, f"in_{i}_res")(h, emb, lora_idx, row(f"in_{i}_res"))
                if step.attn:
                    h = _attn(ucfg, step.out_ch, lora, f"in_{i}_attn")(
                        h, context, lora_idx, kvr(f"in_{i}_attn"))
            else:
                h = Downsample(step.out_ch, dtype=dt, name=f"in_{i}_down")(h)
            outs.append(
                ZeroConv(step.out_ch, n_banks=banks, dtype=dt, name=f"zero_{i}")(h, lora_idx)
            )

        ch = h.shape[-1]
        h = _res(ucfg, ch, lora, "mid_res0")(h, emb, lora_idx, row("mid_res0"))
        h = _attn(ucfg, ch, lora, "mid_attn")(h, context, lora_idx, kvr("mid_attn"))
        h = _res(ucfg, ch, lora, "mid_res1")(h, emb, lora_idx, row("mid_res1"))
        outs.append(
            ZeroConv(ch, n_banks=banks, dtype=dt, name="zero_mid")(h, lora_idx)
        )
        return tuple(outs)
