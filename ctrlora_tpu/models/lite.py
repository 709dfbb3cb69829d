"""ControlNet-Lite baseline (reference: cldm/cldm_lite.py) — a lightweight
attention-free control branch whose residuals inject on the *encoder* side
of the main UNet (unlike standard ControlNet's decoder-side injection).

Blocks are plain GroupNorm-SiLU-Conv stacks; hint enters through the same
8-conv pixel encoder as vanilla ControlNet.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ctrlora_tpu.configs import UNetConfig
from ctrlora_tpu.models.layers import Conv, Downsample, GroupNorm32, TimestepEmbed, ZeroConv
from ctrlora_tpu.models.unet import HintBlock, encoder_plan


class ControlNetLite(nn.Module):
    """Reference ControlNetLite (cldm_lite.py:45-167): conv-only encoder with
    zero-conv taps after every block and the middle."""

    cfg: UNetConfig
    hint_channels: int = 3

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        context: jnp.ndarray,  # unused (no attention); kept for interface parity
        hint: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, ...]:
        cfg = self.cfg
        dt = cfg.compute_dtype
        emb = TimestepEmbed(cfg.model_channels, dtype=dt, name="time_embed")(timesteps)
        del emb  # reference defines time_embed but its lite blocks ignore emb
        assert hint is not None
        guided = HintBlock(cfg.model_channels, dtype=dt, name="hint_block")(hint)

        outs = []
        h = x.astype(dt)
        for i, step in enumerate(encoder_plan(cfg)[0]):
            if step.kind == "conv":
                h = Conv(step.out_ch, dtype=dt, name="in_conv")(h)
                h = h + guided
            elif step.kind == "res":
                h = GroupNorm32(name=f"in_{i}_norm", silu=True)(h)
                h = Conv(step.out_ch, dtype=dt, name=f"in_{i}_conv")(h)
            else:
                h = Downsample(step.out_ch, dtype=dt, name=f"in_{i}_down")(h)
            outs.append(ZeroConv(step.out_ch, dtype=dt, name=f"zero_{i}")(h))

        ch = h.shape[-1]
        h = GroupNorm32(name="mid_norm", silu=True)(h)
        h = Conv(ch, dtype=dt, name="mid_conv")(h)
        outs.append(ZeroConv(ch, dtype=dt, name="zero_mid")(h))
        return tuple(outs)


def lite_entries(cfg: UNetConfig, hint_channels: int = 3):
    """Torch key table for ControlNetLite (control_model.*)."""
    from ctrlora_tpu.utils.ckpt_torch import _conv, _linear, _norm

    e = []
    e += _linear("time_embed.0", ("time_embed", "dense0"))
    e += _linear("time_embed.2", ("time_embed", "dense1"))
    steps, _, _ = encoder_plan(cfg)
    for i, step in enumerate(steps):
        if step.kind == "conv":
            e += _conv(f"input_blocks.{i}.0", ("in_conv",))
        elif step.kind == "res":
            e += _norm(f"input_blocks.{i}.0", (f"in_{i}_norm",))
            e += _conv(f"input_blocks.{i}.2", (f"in_{i}_conv",))
        else:
            e += _conv(f"input_blocks.{i}.0.op", (f"in_{i}_down", "conv"))
        e += _conv(f"zero_convs.{i}.0", (f"zero_{i}",))
    e += _norm("middle_block.0", ("mid_norm",))
    e += _conv("middle_block.2", ("mid_conv",))
    e += _conv("middle_block_out.0", ("zero_mid",))
    for j, idx in enumerate(range(0, 14, 2)):
        e += _conv(f"input_hint_block.{idx}", ("hint_block", f"conv_{j}"))
    e += _conv("input_hint_block.14", ("hint_block", "conv_out"))
    return e
