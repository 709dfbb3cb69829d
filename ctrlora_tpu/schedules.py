"""Diffusion noise schedules and DDIM timestep tables.

Pure functions returning numpy / jax arrays. Numerics follow the standard
DDPM/DDIM formulations (reference behavior: ldm/modules/diffusionmodules/
util.py:21-100 and ldm/models/diffusion/ddpm.py:138-192), recomputed here
from the original papers (Ho et al. 2020; Song et al. 2020).

Everything is computed in float64 and cast to float32 at the end, matching
the reference precision path (betas are float64 tensors there).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Return betas[t] for t in [0, n_timestep) as float64."""
    if schedule == "linear":
        # "linear" in SD parlance is linear in sqrt(beta).
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64)
            ** 2
        )
    elif schedule == "cosine":
        t = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(t / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"unknown beta schedule {schedule!r}")
    return betas


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All per-timestep tables used by training and sampling, as float32.

    Mirrors the buffer set registered by the reference DDPM
    (ldm/models/diffusion/ddpm.py:155-192) so that q_sample / p_losses /
    DDIM have everything they need from one immutable object.
    """

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    log_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray
    lvlb_weights: np.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def make_schedule(
    beta_schedule: str = "linear",
    timesteps: int = 1000,
    linear_start: float = 0.00085,
    linear_end: float = 0.012,
    cosine_s: float = 8e-3,
    given_betas: np.ndarray | None = None,
    v_posterior: float = 0.0,
    parameterization: str = "eps",
) -> DiffusionSchedule:
    if given_betas is not None:
        betas = np.asarray(given_betas, dtype=np.float64)
    else:
        betas = make_beta_schedule(
            beta_schedule, timesteps, linear_start=linear_start, linear_end=linear_end, cosine_s=cosine_s
        )
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

    posterior_variance = (1 - v_posterior) * betas * (1.0 - alphas_cumprod_prev) / (
        1.0 - alphas_cumprod
    ) + v_posterior * betas

    if parameterization == "eps":
        # posterior_variance[0] == 0 -> inf at t=0; patched below like the
        # reference (lvlb_weights[0] = lvlb_weights[1])
        with np.errstate(divide="ignore"):
            lvlb_weights = betas**2 / (
                2 * posterior_variance * alphas * (1 - alphas_cumprod)
            )
    elif parameterization == "x0":
        lvlb_weights = 0.5 * np.sqrt(alphas_cumprod) / (2.0 * 1 - alphas_cumprod)
    elif parameterization == "v":
        lvlb_weights = np.ones_like(betas)
    else:
        raise NotImplementedError(parameterization)
    lvlb_weights = lvlb_weights.copy()
    lvlb_weights[0] = lvlb_weights[1]

    f32 = lambda x: np.asarray(x, dtype=np.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(np.log(np.maximum(posterior_variance, 1e-20))),
        posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        lvlb_weights=f32(lvlb_weights),
    )


def make_ddim_timesteps(
    num_ddim_timesteps: int,
    num_ddpm_timesteps: int,
    discr_method: str = "uniform",
) -> np.ndarray:
    """DDIM sub-sequence of DDPM timesteps (reference: util.py:46-60)."""
    if discr_method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        # identical to the reference's range(0, T, c) when S divides T, but
        # bounded to exactly S steps otherwise (range() would overflow to
        # index T after the +1 shift below)
        ddim_timesteps = np.arange(num_ddim_timesteps) * c
    elif discr_method == "quad":
        ddim_timesteps = (
            np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2
        ).astype(int)
    else:
        raise NotImplementedError(f"unknown ddim discretization {discr_method!r}")
    # Shift by one so the final alpha corresponds to the step that maps all
    # the way back to the data distribution.
    return ddim_timesteps + 1


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Per-DDIM-step tables, ordered from small t to large t (index order)."""

    timesteps: np.ndarray  # int32 [S] ascending DDPM timesteps
    alphas: np.ndarray  # float32 [S] alpha_cumprod at each ddim step
    alphas_prev: np.ndarray  # float32 [S]
    sqrt_one_minus_alphas: np.ndarray  # float32 [S]
    sigmas: np.ndarray  # float32 [S]

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])


def make_ddim_schedule(
    schedule: DiffusionSchedule,
    num_ddim_steps: int,
    eta: float = 0.0,
    discr_method: str = "uniform",
) -> DDIMSchedule:
    """DDIM sampling parameters (reference: util.py:63-74)."""
    ts = make_ddim_timesteps(num_ddim_steps, schedule.num_timesteps, discr_method)
    alphacums = schedule.alphas_cumprod.astype(np.float64)
    alphas = alphacums[ts]
    alphas_prev = np.asarray([alphacums[0]] + alphacums[ts[:-1]].tolist())
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    return DDIMSchedule(
        timesteps=ts.astype(np.int32),
        alphas=alphas.astype(np.float32),
        alphas_prev=alphas_prev.astype(np.float32),
        sqrt_one_minus_alphas=np.sqrt(1.0 - alphas).astype(np.float32),
        sigmas=sigmas.astype(np.float32),
    )


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: int = 10000
) -> jnp.ndarray:
    """Sinusoidal timestep embeddings, [N] -> [N, dim] float32.

    Layout is [cos | sin] (reference: util.py:154-174).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def extract(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather a[t] and reshape to broadcast over an ndim tensor: [B,1,1,...]."""
    out = jnp.take(a, t, axis=0)
    return out.reshape(out.shape[0], *([1] * (ndim - 1)))


def q_sample(
    schedule_sqrt_ac: jnp.ndarray,
    schedule_sqrt_1mac: jnp.ndarray,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Forward diffusion q(x_t | x_0)."""
    ndim = x_start.ndim
    return (
        extract(schedule_sqrt_ac, t, ndim) * x_start
        + extract(schedule_sqrt_1mac, t, ndim) * noise
    )


def get_v(
    schedule: DiffusionSchedule, x: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """v-parameterization target."""
    ndim = x.ndim
    sa = extract(jnp.asarray(schedule.sqrt_alphas_cumprod), t, ndim)
    sb = extract(jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod), t, ndim)
    return sa * noise - sb * x


def predict_eps_from_z_and_v(
    schedule: DiffusionSchedule, x_t: jnp.ndarray, t: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    ndim = x_t.ndim
    sa = extract(jnp.asarray(schedule.sqrt_alphas_cumprod), t, ndim)
    sb = extract(jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod), t, ndim)
    return sa * v + sb * x_t


def predict_start_from_z_and_v(
    schedule: DiffusionSchedule, x_t: jnp.ndarray, t: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    ndim = x_t.ndim
    sa = extract(jnp.asarray(schedule.sqrt_alphas_cumprod), t, ndim)
    sb = extract(jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod), t, ndim)
    return sa * x_t - sb * v
