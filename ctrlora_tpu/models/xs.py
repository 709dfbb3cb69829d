"""ControlNet-XS baseline: two-stream cross-infusion control
(reference: cldm/cldm_xs.py — TwoStreamControlNet + ControlledUNetModelFixed).

A slim control copy of the UNet encoder (width = control_model_ratio x base)
runs in lockstep with the base encoder; after every block the base stream is
corrected by a zero-conv of the control stream ('add' infusion2base) and the
control stream sees the base stream ('cat' infusion2control). The base
decoder consumes corrections from the control encoder stack in reverse.

Covered modes (the shipped config, configs/cnxs_sd15.yaml): two_stream_mode=
'cross', guiding='encoder'/'encoder_double'/'full', infusion2control='cat'/
'add'/None, infusion2base='add', fixed=True. 'full' gives the control stream
its own decoder with mutual infusion at every decoder layer except the last
(cldm_xs.py:325-348). two_stream_mode='sequential' is dead code in the
reference — its forward only implements 'cross' (cldm_xs.py:302) — so it is
intentionally omitted.

The base stream's blocks use the same names as models.unet.UNet so SD
weights bridge with the standard table under the 'base' subtree.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ctrlora_tpu.configs import UNetConfig
from ctrlora_tpu.models.layers import Conv, Downsample, GroupNorm32, TimestepEmbed, Upsample, ZeroConv
from ctrlora_tpu.models.unet import HintBlock, _attn, _res, decoder_plan, encoder_plan


class XSUNet(nn.Module):
    """Base UNet + slim control stream, fused in one module."""

    cfg: UNetConfig  # base UNet config
    hint_channels: int = 3
    control_model_ratio: float = 0.2
    infusion2control: Optional[str] = "cat"  # 'cat' | 'add' | None
    guiding: str = "encoder_double"  # 'encoder' | 'encoder_double' | 'full'
    learn_embedding: bool = False
    control_scale: float = 1.0

    @nn.compact
    def __call__(self, x, timesteps, context, hint=None, no_control: bool = False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        ctr_cfg = dataclasses.replace(
            cfg, model_channels=max(1, int(cfg.model_channels * self.control_model_ratio))
        )
        base_steps, base_chans, _ = encoder_plan(cfg)
        ctr_steps, ctr_chans, _ = encoder_plan(ctr_cfg)

        emb = TimestepEmbed(cfg.model_channels, dtype=dt, name="time_embed")(timesteps)
        if self.learn_embedding:
            s = self.control_scale
            ctr_emb = TimestepEmbed(cfg.model_channels, dtype=dt, name="ctrl_time_embed")(timesteps)
            emb = ctr_emb * s**0.3 + emb * (1 - s**0.3)
        context = context.astype(dt)

        run_base_enc = lambda h, i, step: (
            Conv(step.out_ch, dtype=dt, name="in_conv")(h) if step.kind == "conv"
            else _res(cfg, step.out_ch, None, f"in_{i}_res")(h, emb, None)
            if step.kind == "res" else Downsample(step.out_ch, dtype=dt, name=f"in_{i}_down")(h)
        )

        def run_base_enc_attn(h, i, step):
            if step.kind == "res" and step.attn:
                h = _attn(cfg, step.out_ch, None, f"in_{i}_attn")(h, context, None)
            return h

        if no_control or hint is None:
            # plain SD forward (reference: no_control branch)
            hs = []
            h = x.astype(dt)
            for i, step in enumerate(base_steps):
                h = run_base_enc_attn(run_base_enc(h, i, step), i, step)
                hs.append(h)
            ch = hs[-1].shape[-1]
            h = _res(cfg, ch, None, "mid_res0")(h, emb, None)
            h = _attn(cfg, ch, None, "mid_attn")(h, context, None)
            h = _res(cfg, ch, None, "mid_res1")(h, emb, None)
            for i, step in enumerate(decoder_plan(cfg)):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = _res(cfg, step.out_ch, None, f"out_{i}_res")(h, emb, None)
                if step.attn:
                    h = _attn(cfg, step.out_ch, None, f"out_{i}_attn")(h, context, None)
                if step.upsample:
                    h = Upsample(step.out_ch, dtype=dt, name=f"out_{i}_up")(h)
            h = GroupNorm32(name="norm_out", silu=True)(h)
            return Conv(cfg.out_channels, dtype=dt, kernel_init=nn.initializers.zeros,
                        name="conv_out")(h).astype(jnp.float32)

        guided = HintBlock(ctr_cfg.model_channels, dtype=dt, name="hint_block")(hint)

        h_base = h_ctr = x.astype(dt)
        hs_base, hs_ctr = [], []
        for i, (bstep, cstep) in enumerate(zip(base_steps, ctr_steps)):
            h_base = run_base_enc_attn(run_base_enc(h_base, i, bstep), i, bstep)
            if cstep.kind == "conv":
                h_ctr = Conv(cstep.out_ch, dtype=dt, name="ctrl_in_conv")(h_ctr)
            elif cstep.kind == "res":
                h_ctr = _res(ctr_cfg, cstep.out_ch, None, f"ctrl_in_{i}_res")(h_ctr, emb, None)
                if cstep.attn:
                    h_ctr = _attn(ctr_cfg, cstep.out_ch, None, f"ctrl_in_{i}_attn")(h_ctr, context, None)
            else:
                h_ctr = Downsample(cstep.out_ch, dtype=dt, name=f"ctrl_in_{i}_down")(h_ctr)
            if guided is not None:
                h_ctr = h_ctr + guided
                guided = None
            if self.guiding in ("encoder_double", "full"):
                h_base = h_base + ZeroConv(bstep.out_ch, dtype=dt, name=f"enc_zero_out_{i}")(h_ctr) * self.control_scale
            hs_base.append(h_base)
            hs_ctr.append(h_ctr)
            # infusion2control
            if self.infusion2control == "cat":
                h_ctr = jnp.concatenate(
                    [h_ctr, ZeroConv(bstep.out_ch, dtype=dt, name=f"enc_zero_in_{i}")(h_base)],
                    axis=-1,
                )
            elif self.infusion2control == "add":
                h_ctr = h_ctr + ZeroConv(cstep.out_ch, dtype=dt, name=f"enc_zero_in_{i}")(h_base)

        bch = base_chans[-1]
        cch = ctr_chans[-1]
        h_base = _res(cfg, bch, None, "mid_res0")(h_base, emb, None)
        h_base = _attn(cfg, bch, None, "mid_attn")(h_base, context, None)
        h_base = _res(cfg, bch, None, "mid_res1")(h_base, emb, None)
        h_ctr = _res(ctr_cfg, cch, None, "ctrl_mid_res0")(h_ctr, emb, None)
        h_ctr = _attn(ctr_cfg, cch, None, "ctrl_mid_attn")(h_ctr, context, None)
        h_ctr = _res(ctr_cfg, cch, None, "ctrl_mid_res1")(h_ctr, emb, None)
        h_base = h_base + ZeroConv(bch, dtype=dt, name="mid_zero_out")(h_ctr) * self.control_scale
        if self.guiding == "full":
            # control stream keeps seeing the base at the bottleneck
            # (cldm_xs.py:326-327, middle_block_in)
            if self.infusion2control == "cat":
                h_ctr = jnp.concatenate(
                    [h_ctr, ZeroConv(bch, dtype=dt, name="mid_zero_in")(h_base)], axis=-1
                )
            elif self.infusion2control == "add":
                h_ctr = h_ctr + ZeroConv(cch, dtype=dt, name="mid_zero_in")(h_base)

        dec_steps = decoder_plan(cfg)
        dec_steps_ctr = decoder_plan(ctr_cfg)
        for i, step in enumerate(dec_steps):
            if self.guiding != "full":
                # corrections from the control ENCODER stack in reverse
                corr = hs_ctr.pop()
                h_base = h_base + ZeroConv(h_base.shape[-1], dtype=dt, name=f"dec_zero_out_{i}")(corr) * self.control_scale
            h_base = jnp.concatenate([h_base, hs_base.pop()], axis=-1)
            h_base = _res(cfg, step.out_ch, None, f"out_{i}_res")(h_base, emb, None)
            if step.attn:
                h_base = _attn(cfg, step.out_ch, None, f"out_{i}_attn")(h_base, context, None)
            if step.upsample:
                h_base = Upsample(step.out_ch, dtype=dt, name=f"out_{i}_up")(h_base)
            if self.guiding == "full":
                # control decoder runs in lockstep; mutual infusion on every
                # layer but the last (cldm_xs.py:341-348)
                cstep = dec_steps_ctr[i]
                h_ctr = jnp.concatenate([h_ctr, hs_ctr.pop()], axis=-1)
                h_ctr = _res(ctr_cfg, cstep.out_ch, None, f"ctrl_out_{i}_res")(h_ctr, emb, None)
                if cstep.attn:
                    h_ctr = _attn(ctr_cfg, cstep.out_ch, None, f"ctrl_out_{i}_attn")(h_ctr, context, None)
                if cstep.upsample:
                    h_ctr = Upsample(cstep.out_ch, dtype=dt, name=f"ctrl_out_{i}_up")(h_ctr)
                if i != len(dec_steps) - 1:
                    h_base = h_base + ZeroConv(step.out_ch, dtype=dt, name=f"dec_zero_out_{i}")(h_ctr) * self.control_scale
                    if self.infusion2control == "cat":
                        h_ctr = jnp.concatenate(
                            [h_ctr, ZeroConv(step.out_ch, dtype=dt, name=f"dec_zero_in_{i}")(h_base)],
                            axis=-1,
                        )
                    elif self.infusion2control == "add":
                        h_ctr = h_ctr + ZeroConv(cstep.out_ch, dtype=dt, name=f"dec_zero_in_{i}")(h_base)

        h = GroupNorm32(name="norm_out", silu=True)(h_base)
        return Conv(
            cfg.out_channels, dtype=dt, kernel_init=nn.initializers.zeros, name="conv_out"
        )(h).astype(jnp.float32)


def xs_entries(
    cfg: UNetConfig,
    ratio: float = 0.2,
    infusion2control: Optional[str] = "cat",
    guiding: str = "encoder_double",
    learn_embedding: bool = False,
    base_prefix: str = "base.",
    ctrl_prefix: str = "control_model.",
):
    """Torch key table for the XS tree.

    Base-stream torch keys are '{base_prefix}...' (UNetModel layout); the
    control stream / zero convs / hint block use the TwoStreamControlNet
    layout (reference: cldm_xs.py:129-262).
    """
    from ctrlora_tpu.utils.ckpt_torch import (
        _conv, _linear, _resblock, _transformer, unet_entries,
    )

    e = [(base_prefix + t, f, k) for t, f, k in unet_entries(cfg)]
    ctr_cfg = dataclasses.replace(
        cfg, model_channels=max(1, int(cfg.model_channels * ratio))
    )
    if learn_embedding:
        e += [(f"{ctrl_prefix}time_embed.0.weight", ("ctrl_time_embed", "dense0", "kernel"), "linear_w"),
              (f"{ctrl_prefix}time_embed.0.bias", ("ctrl_time_embed", "dense0", "bias"), "copy"),
              (f"{ctrl_prefix}time_embed.2.weight", ("ctrl_time_embed", "dense1", "kernel"), "linear_w"),
              (f"{ctrl_prefix}time_embed.2.bias", ("ctrl_time_embed", "dense1", "bias"), "copy")]
    steps, chans, _ = encoder_plan(ctr_cfg)
    cat = infusion2control == "cat"
    in_ch = ctr_cfg.model_channels
    for i, step in enumerate(steps):
        t = f"{ctrl_prefix}input_blocks.{i}"
        if step.kind == "conv":
            e += _conv(f"{t}.0", ("ctrl_in_conv",))
        elif step.kind == "res":
            has_skip = cat or in_ch != step.out_ch
            e += _resblock(f"{t}.0", f"ctrl_in_{i}_res", has_skip)
            if step.attn:
                e += _transformer(f"{t}.1", f"ctrl_in_{i}_attn", cfg.transformer_depth)
            in_ch = step.out_ch
        else:
            e += _conv(f"{t}.0.op", (f"ctrl_in_{i}_down", "conv"))
    e += _resblock(f"{ctrl_prefix}middle_block.0", "ctrl_mid_res0", cat)
    e += _transformer(f"{ctrl_prefix}middle_block.1", "ctrl_mid_attn", cfg.transformer_depth)
    e += _resblock(f"{ctrl_prefix}middle_block.2", "ctrl_mid_res1", False)
    if guiding == "full":
        # control decoder (reference: ControlledUNetModelFixed output_blocks)
        from ctrlora_tpu.models.unet import decoder_plan

        for i, step in enumerate(decoder_plan(ctr_cfg)):
            t = f"{ctrl_prefix}output_blocks.{i}"
            e += _resblock(f"{t}.0", f"ctrl_out_{i}_res", True)
            nxt = 1
            if step.attn:
                e += _transformer(f"{t}.{nxt}", f"ctrl_out_{i}_attn", cfg.transformer_depth)
                nxt += 1
            if step.upsample:
                e += _conv(f"{t}.{nxt}.conv", (f"ctrl_out_{i}_up", "conv"))
    n_enc = len(steps)
    for i in range(n_enc):
        e += _conv(f"enc_zero_convs_in.{i}.0", (f"enc_zero_in_{i}",))
        if guiding in ("encoder_double", "full"):
            e += _conv(f"enc_zero_convs_out.{i}.0", (f"enc_zero_out_{i}",))
    e += _conv("middle_block_out.0", ("mid_zero_out",))
    if guiding == "full":
        e += _conv("middle_block_in.0", ("mid_zero_in",))
        n_dec = len(decoder_plan(ctr_cfg))
        for i in range(n_dec - 1):
            e += _conv(f"dec_zero_convs_out.{i}.0", (f"dec_zero_out_{i}",))
            e += _conv(f"dec_zero_convs_in.{i}.0", (f"dec_zero_in_{i}",))
    else:
        for i in range(n_enc):
            e += _conv(f"dec_zero_convs_out.{i}.0", (f"dec_zero_out_{i}",))
    for j, idx in enumerate(range(0, 14, 2)):
        e += _conv(f"input_hint_block.{idx}", ("hint_block", f"conv_{j}"))
    e += _conv("input_hint_block.14", ("hint_block", "conv_out"))
    return e
