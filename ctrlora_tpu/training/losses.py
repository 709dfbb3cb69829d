"""Diffusion training loss (reference: ldm/models/diffusion/ddpm.py:885-921).

loss = l_simple_weight * mean(mse / exp(logvar_t) + logvar_t)
     + original_elbo_weight * mean(lvlb_weights[t] * mse)

With the ctrlora defaults (logvar 0, l_simple_weight 1, elbo weight 0) this
reduces to plain eps-MSE, but the full form is kept for config parity.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ctrlora_tpu.configs import DiffusionConfig
from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline, Params
from ctrlora_tpu.schedules import get_v, q_sample


def p_losses(
    pipe: CtrLoraPipeline,
    params: Params,
    rng: jax.Array,
    z: jnp.ndarray,  # [B,h,w,c] clean latents (already scaled)
    context: jnp.ndarray,  # [B,S,D] text context
    conds: Optional[Sequence[Conditioning]],
    t: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    sched = pipe.schedule
    dcfg: DiffusionConfig = pipe.cfg.diffusion
    B = z.shape[0]
    t_rng, n_rng = jax.random.split(rng)
    if t is None:
        t = jax.random.randint(t_rng, (B,), 0, sched.num_timesteps)
    noise = jax.random.normal(n_rng, z.shape, z.dtype)
    x_noisy = q_sample(
        jnp.asarray(sched.sqrt_alphas_cumprod),
        jnp.asarray(sched.sqrt_one_minus_alphas_cumprod),
        z, t, noise,
    )
    model_output = pipe.apply_model(params, x_noisy, t, context, conds)

    if dcfg.parameterization == "eps":
        target = noise
    elif dcfg.parameterization == "x0":
        target = z
    elif dcfg.parameterization == "v":
        target = get_v(sched, z, noise, t)
    else:
        raise NotImplementedError(dcfg.parameterization)

    mse = jnp.mean((model_output - target) ** 2, axis=(1, 2, 3))  # [B]
    loss_simple = jnp.mean(mse)
    logvar_t = jnp.full((B,), dcfg.logvar_init, jnp.float32)
    loss = dcfg.l_simple_weight * jnp.mean(mse / jnp.exp(logvar_t) + logvar_t)
    lvlb = jnp.mean(jnp.asarray(sched.lvlb_weights)[t] * mse)
    loss = loss + dcfg.original_elbo_weight * lvlb
    return loss, {
        "loss": loss,
        "loss_simple": loss_simple,
        "loss_vlb": lvlb,
        "t_mean": jnp.mean(t.astype(jnp.float32)),
    }
