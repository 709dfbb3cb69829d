"""Optimizer construction and trainable-parameter masks.

Replicates the reference's trainable-set rules
(cldm/cldm_ctrlora_finetune.py:84-108, cldm_ctrlora_pretrain.py:174-182,
cldm/cldm.py:419-426) as pure pytree-path predicates:

  * trainable='all'  — every control-branch param (pretrain / vanilla CN)
  * trainable='lora' — LoRA matrices + zero convs (if zero_trainable) +
                       transformer norms (if norm_trainable)
  * trainable='full' — every control param except LoRA (finetune w/o LoRA)

When sd_locked=False, the UNet decoder (out_* blocks + final norm/conv) also
trains (reference: cldm/cldm.py:421-424). Frozen params receive zero updates
via optax.multi_transform, mirroring a torch optimizer that simply never saw
them.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ctrlora_tpu.configs import TrainConfig
from ctrlora_tpu.pipeline import Params

# transformer norms are the modules literally named norm/norm1/norm2/norm3
# (the reference filters torch module names for 'norm', which matches only
# SpatialTransformer.norm and BasicTransformerBlock.norm1/2/3 — ResBlock
# norms live inside in_layers/out_layers and never match)
_NORM_NAMES = {"norm", "norm1", "norm2", "norm3"}


def _path_names(path) -> list:
    return [getattr(p, "key", str(p)) for p in path]


def control_trainable(path, cfg: TrainConfig) -> bool:
    names = _path_names(path)
    is_lora = any(n in ("lora_down", "lora_up") for n in names)
    if cfg.trainable == "all":
        return True
    if cfg.trainable == "full":
        return not is_lora
    if cfg.trainable == "lora":
        if is_lora:
            return True
        if cfg.zero_trainable and any(n.startswith("zero_") for n in names):
            return True
        if cfg.norm_trainable and any(n in _NORM_NAMES for n in names):
            return True
        return False
    raise ValueError(f"unknown trainable mode {cfg.trainable!r}")


_XS_TRAINABLE_PREFIXES = ("ctrl_", "enc_zero_", "dec_zero_", "mid_zero_", "hint_block")


def unet_trainable(path, cfg: TrainConfig, xs: bool = False) -> bool:
    names = _path_names(path)
    top = names[1] if len(names) > 1 else ""
    if xs:
        # ControlNet-XS: the control stream, zero convs and hint block live
        # inside the fused unet tree; the base stream stays frozen
        return any(top.startswith(p) for p in _XS_TRAINABLE_PREFIXES)
    if cfg.sd_locked:
        return False
    # top-level module name only ('params' is names[0]): decoder blocks and
    # the output head (reference: cldm/cldm.py:421-424 output_blocks + out)
    return top.startswith("out_") or top in ("norm_out", "conv_out")


def trainable_mask(params: Params, cfg: TrainConfig, xs: bool = False) -> Params:
    """Boolean pytree: True where the param trains."""
    control = (
        jax.tree_util.tree_map_with_path(
            lambda p, _: control_trainable(p, cfg), params.control
        )
        if params.control is not None
        else None
    )
    unet = jax.tree_util.tree_map_with_path(
        lambda p, _: unet_trainable(p, cfg, xs=xs), params.unet
    )
    freeze = lambda tree: jax.tree_util.tree_map(lambda _: False, tree)
    return Params(unet, control, freeze(params.vae), freeze(params.clip))


def count_trainable(params: Params, mask: Params) -> int:
    total = 0
    for p, m in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(mask)
    ):
        if m:
            total += p.size
    return total


def make_optimizer(cfg: TrainConfig, mask: Params) -> optax.GradientTransformation:
    """AdamW matching torch defaults (reference: torch.optim.AdamW(lr);
    betas 0.9/0.999, eps 1e-8, weight decay 1e-2), frozen params zeroed."""
    labels = jax.tree_util.tree_map(lambda m: "train" if m else "freeze", mask)
    adamw = optax.adamw(
        learning_rate=cfg.learning_rate,
        b1=cfg.adam_b1,
        b2=cfg.adam_b2,
        eps=cfg.adam_eps,
        weight_decay=cfg.weight_decay,
    )
    return optax.multi_transform(
        {"train": adamw, "freeze": optax.set_to_zero()}, labels
    )


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Params
    opt_state: Any
    ema: Any = None  # EmaState when TrainConfig.use_ema, else None


def create_train_state(
    params: Params, cfg: TrainConfig, xs: bool = False
) -> tuple[TrainState, optax.GradientTransformation, Params]:
    mask = trainable_mask(params, cfg, xs=xs)
    tx = make_optimizer(cfg, mask)
    opt_state = tx.init(params)
    ema = None
    if cfg.use_ema:
        from ctrlora_tpu.training.ema import ema_init

        ema = ema_init(params, mask)
    return TrainState(jnp.zeros((), jnp.int32), params, opt_state, ema), tx, mask
