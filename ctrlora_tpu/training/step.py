"""The jitted training step: frozen-tower encodes, eps-MSE, masked AdamW.

One fused jit covers what the reference spreads across LatentDiffusion.
get_input + shared_step + DDP backward (ldm/models/diffusion/ddpm.py:432,
cldm/cldm.py:318): VAE-encode of target and hint, CLIP context, q_sample,
UNet+ControlNet forward, gradients (control branch only — the frozen SD
params are stop_gradient'ed so XLA dead-code-eliminates their backward),
AdamW update, optional gradient accumulation via lax.scan.

Batches are dicts of arrays:
  jpg       [B,H,W,3] float32 in [-1,1]   (target image)
  hint      [B,H,W,3] float32 in [0,1]    (condition; latent mode feeds the
            [0,1] hint to the VAE exactly like the reference,
            cldm_ctrlora_finetune.py:76-77)
  token_ids [B,77] int32                  (tokenized prompt; dropout applied
            by the data layer)
  task_idx  [] or [B] int32, optional     (LoRA index; batches are single-
            task by construction, the scheduler guarantees it)
Latent-cached batches (training/latent_cache.py) replace jpg/hint with
  jpg_moments / hint_moments [B,h,w,2*z2]  (VAE posterior mean|logvar;
            the step samples z = mean + std*eps with the same rng stream,
            skipping the 41.6%-of-step frozen encoder — bit-equal loss).
With grad_accum > 1, leading axis is [accum, micro, ...].
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ctrlora_tpu.configs import TrainConfig
from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline, Params
from ctrlora_tpu.training.losses import p_losses
from ctrlora_tpu.training.train_state import TrainState


def _batch_conds(pipe: CtrLoraPipeline, params: Params, batch, rng):
    """Build the Conditioning list for a batch (latent- or image-hint)."""
    if pipe.control is None:
        return None, rng
    hint = batch.get("hint")
    if hint is None and pipe.cfg.control.hint_mode != "latent":
        raise ValueError(
            "latent-cached batches (hint_moments) require hint_mode='latent'; "
            "image-hint models consume raw pixels"
        )
    task_idx = batch.get("task_idx")
    if task_idx is not None and task_idx.ndim > 0:
        task_idx = task_idx[0]  # batches are single-task
    if pipe.cfg.control.hint_mode == "latent":
        rng, h_rng = jax.random.split(rng)
        if hint is None:  # precomputed moments (training/latent_cache.py)
            hint_z = pipe.first_stage_from_moments(batch["hint_moments"], rng=h_rng)
        else:
            hint_z = pipe.encode_first_stage(params, hint, rng=h_rng)
        hint_z = jax.lax.stop_gradient(hint_z)
        return [Conditioning(hint_z, lora_idx=task_idx)], rng
    return [Conditioning(hint, lora_idx=task_idx)], rng


def loss_for_batch(
    pipe: CtrLoraPipeline,
    params: Params,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    sd_locked: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    rng, z_rng, t_rng = jax.random.split(rng, 3)
    if "jpg_moments" in batch:  # latent cache: same rng stream, no encode
        z = pipe.first_stage_from_moments(batch["jpg_moments"], rng=z_rng)
    else:
        z = pipe.encode_first_stage(params, batch["jpg"], rng=z_rng)
    z = jax.lax.stop_gradient(z)
    context = jax.lax.stop_gradient(
        pipe.encode_text_tokens(params, batch["token_ids"])
    )
    conds, rng = _batch_conds(pipe, params, batch, rng)
    is_xs = pipe.cfg.control is not None and pipe.cfg.control.variant == "xs"
    if sd_locked and not is_xs:
        # zero grads for the frozen UNet so XLA DCEs their backward entirely.
        # (ControlNet-XS keeps its trainables INSIDE the unet tree, so it must
        # not be stop-gradient'ed; the optimizer mask freezes the base stream.)
        params = params._replace(unet=jax.lax.stop_gradient(params.unet))
    return p_losses(pipe, params, t_rng, z, context, conds)


def make_train_step(
    pipe: CtrLoraPipeline,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
    donate: bool = True,
    mask: Optional[Params] = None,
):
    """Returns jitted (state, batch, rng) -> (state, metrics).

    `mask` (the trainable mask) bounds the EMA shadow to trained leaves when
    cfg.use_ema; without it the shadow covers the full tree."""

    def grads_for(params, batch, rng):
        return jax.grad(
            lambda p: loss_for_batch(pipe, p, batch, rng, cfg.sd_locked),
            has_aux=True,
        )(params)

    def step_fn(state: TrainState, batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        if cfg.grad_accum > 1:
            def micro(carry, xs):
                acc, i = carry
                mb, = xs
                g, m = grads_for(state.params, mb, jax.random.fold_in(rng, i))
                acc = jax.tree_util.tree_map(jnp.add, acc, g)
                return (acc, i + 1), m

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (gsum, _), metrics = jax.lax.scan(
                micro, (zeros, jnp.int32(0)), (batch,)
            )
            grads = jax.tree_util.tree_map(lambda g: g / cfg.grad_accum, gsum)
            metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        else:
            grads, metrics = grads_for(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(
            (grads.control, grads.unet) if grads.control is not None else grads.unet
        )
        metrics = dict(metrics, grad_norm=gnorm)
        ema = state.ema
        if cfg.use_ema and ema is not None:
            from ctrlora_tpu.training.ema import ema_update

            ema = ema_update(ema, params, cfg.ema_decay, mask)
        return TrainState(state.step + 1, params, opt_state, ema), metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
