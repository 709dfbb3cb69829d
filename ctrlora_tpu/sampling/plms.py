"""PLMS sampler (pseudo linear multistep, Liu et al. 2022) as one lax.scan.

Reference: ldm/models/diffusion/plms.py — a host-side python loop carrying a
list of up to 4 old eps predictions and branching on its length. TPU-first
rework: the eps history is a fixed [3, ...] carry buffer and the order
selection is a `lax.switch` on the step counter, so the whole trajectory is
one scan inside one jit. The first step's extra model evaluation at t_next
(plms.py:192-198) runs under a `lax.cond`.

PLMS requires eta=0 (the reference asserts this, plms.py:76).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline, Params
from ctrlora_tpu.sampling.common import make_guided_eps_fn
from ctrlora_tpu.sampling.ddim import DDIMConfig
from ctrlora_tpu.schedules import make_ddim_schedule


def plms_sample(
    pipe: CtrLoraPipeline,
    params: Params,
    rng: jax.Array,
    context: jnp.ndarray,
    uncond_context: Optional[jnp.ndarray],
    conds: Optional[Sequence[Conditioning]],
    latent_shape: Sequence[int],
    cfg: DDIMConfig = DDIMConfig(),
    control_scales: Optional[jnp.ndarray] = None,
    x_T: Optional[jnp.ndarray] = None,
    ip_context: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Returns final latents [B, h, w, c]. eps-parameterization only (the
    reference PLMS sampler predates v-prediction)."""
    assert cfg.eta == 0.0, "PLMS requires eta=0"
    sched = pipe.schedule
    dd = make_ddim_schedule(sched, cfg.steps, eta=0.0)

    rng, init_rng = jax.random.split(rng)
    img = (
        x_T
        if x_T is not None
        else jax.random.normal(init_rng, tuple(latent_shape), jnp.float32)
    )

    eps_fn = make_guided_eps_fn(
        pipe, params, context, uncond_context, conds, cfg.guidance_scale,
        control_scales, cfg.guess_mode, ip_context,
    )

    order = np.arange(dd.num_steps - 1, -1, -1)
    ts = np.asarray(dd.timesteps)[order]
    # t_next for the first step's midpoint correction (plms.py:171):
    # the timestep one rung DOWN the ladder (0 past the end)
    ts_next = np.concatenate([ts[1:], [0]])

    # hoisted time-embedding rows for both eval timesteps per step: one
    # [S+1] table over ts + trailing 0 serves ts (rows [:-1]) and ts_next
    # (rows [1:]) — see make_emb_row_tables for why this is on by default
    rows_xs, rows_next_xs = None, None
    rows_of = lambda block: None
    if cfg.hoist_time_embed:
        from ctrlora_tpu.sampling.common import make_emb_row_tables

        packed, rows_of = make_emb_row_tables(
            pipe, params, conds, np.concatenate([ts, [0]])
        )
        if packed is not None:
            rows_xs, rows_next_xs = packed[:-1], packed[1:]
    a_seq = jnp.asarray(np.asarray(dd.alphas)[order])
    ap_seq = jnp.asarray(np.asarray(dd.alphas_prev)[order])
    s1m_seq = jnp.asarray(np.asarray(dd.sqrt_one_minus_alphas)[order])

    def x_prev_from(x, e_t, a_t, a_prev, s1m_t):
        pred_x0 = (x - s1m_t * e_t) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev, 0.0)) * e_t
        return jnp.sqrt(a_prev) * pred_x0 + dir_xt

    def step(carry, inputs):
        img, eps_buf, count = carry  # eps_buf: [3, B, ...] newest first
        (t_scalar, t_next, a_t, a_prev, s1m_t), blocks = inputs
        blk, blk_next = blocks if blocks is not None else (None, None)

        e_t = eps_fn(img, t_scalar, rows_of(blk))

        def order1(_):
            # Adams-Bashforth warmup: eps midpoint via one Euler probe
            x1 = x_prev_from(img, e_t, a_t, a_prev, s1m_t)
            e_t_next = eps_fn(x1, t_next, rows_of(blk_next))
            return (e_t + e_t_next) / 2.0

        def order2(_):
            return (3.0 * e_t - eps_buf[0]) / 2.0

        def order3(_):
            return (23.0 * e_t - 16.0 * eps_buf[0] + 5.0 * eps_buf[1]) / 12.0

        def order4(_):
            return (
                55.0 * e_t - 59.0 * eps_buf[0] + 37.0 * eps_buf[1]
                - 9.0 * eps_buf[2]
            ) / 24.0

        e_prime = jax.lax.switch(
            jnp.minimum(count, 3), [order1, order2, order3, order4], None
        )
        img_prev = x_prev_from(img, e_prime, a_t, a_prev, s1m_t)
        eps_buf = jnp.concatenate([e_t[None], eps_buf[:2]], axis=0)
        return (img_prev, eps_buf, count + 1), None

    eps_buf0 = jnp.zeros((3, *latent_shape), jnp.float32)
    (img, _, _), _ = jax.lax.scan(
        step,
        (img, eps_buf0, jnp.int32(0)),
        (
            (jnp.asarray(ts), jnp.asarray(ts_next), a_seq, ap_seq, s1m_seq),
            (rows_xs, rows_next_xs) if rows_xs is not None else None,
        ),
    )
    return img
