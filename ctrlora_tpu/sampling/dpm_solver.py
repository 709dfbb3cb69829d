"""DPM-Solver++(2M) sampler as one lax.scan.

Reference: ldm/models/diffusion/dpm_solver/ (vendored dpm_solver_pytorch.py,
Lu et al. 2022) — a host-side multistep loop with model wrappers and
interpolated noise schedules. TPU-first rework: the discrete schedule tables
are gathered per scan step, the multistep history (previous x0 prediction +
previous step size h) lives in the scan carry, and order selection is a
`lax.cond` on the step counter — one jit, no host round trips.

Implements the data-prediction (++) multistep 2nd-order variant with
time-uniform steps and lower-order-final, the configuration the reference's
`DPMSolverSampler` maps to ("dpmsolver++", method="multistep", order=2).
Supports eps- and v-parameterization and classifier-free guidance.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline, Params
from ctrlora_tpu.sampling.common import make_guided_eps_fn
from ctrlora_tpu.sampling.ddim import DDIMConfig


def dpm_solver_sample(
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
    """Returns final latents [B, h, w, c]."""
    sched = pipe.schedule
    T = len(sched.alphas_cumprod)
    N = cfg.steps

    rng, init_rng = jax.random.split(rng)
    x = (
        x_T
        if x_T is not None
        else jax.random.normal(init_rng, tuple(latent_shape), jnp.float32)
    )

    eps_fn = make_guided_eps_fn(
        pipe, params, context, uncond_context, conds, cfg.guidance_scale,
        control_scales, cfg.guess_mode, ip_context,
    )

    # time-uniform nodes T-1 = t_0 > t_1 > ... > t_N = 0; the model is
    # evaluated at nodes 0..N-1 and the state is advanced node i -> i+1
    nodes = np.unique(np.round(np.linspace(T - 1, 0, N + 1)).astype(np.int64))[::-1]
    nodes = np.ascontiguousarray(nodes)
    n_steps = len(nodes) - 1
    ac = np.asarray(sched.alphas_cumprod, np.float64)[nodes]
    alpha = np.sqrt(ac)
    sigma = np.sqrt(1.0 - ac)
    lam = np.log(alpha) - np.log(sigma)

    ts_eval = jnp.asarray(nodes[:-1], jnp.int32)
    a_cur = jnp.asarray(alpha[:-1], jnp.float32)
    s_cur = jnp.asarray(sigma[:-1], jnp.float32)
    s_nxt = jnp.asarray(sigma[1:], jnp.float32)
    a_nxt = jnp.asarray(alpha[1:], jnp.float32)
    h_seq = jnp.asarray(lam[1:] - lam[:-1], jnp.float32)  # > 0
    # lower_order_final: the last step is always 1st order (reference
    # dpm_solver_pytorch.py multistep loop)
    first_order = jnp.arange(n_steps) == 0
    last = jnp.arange(n_steps) == n_steps - 1

    v_param = pipe.cfg.diffusion.parameterization == "v"

    def step(carry, inputs):
        x, prev_x0, prev_h = carry
        t_idx, a_t, s_t, a_n, s_n, h, lo1, lo2 = inputs

        out = eps_fn(x, t_idx)
        if v_param:
            x0 = a_t * x - s_t * out
        else:
            x0 = (x - s_t * out) / a_t

        def order1(_):
            return x0

        def order2(_):
            r = prev_h / h
            return (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * prev_x0

        D = jax.lax.cond(jnp.logical_or(lo1, lo2), order1, order2, None)
        x_next = (s_n / s_t) * x - a_n * (jnp.exp(-h) - 1.0) * D
        return (x_next, x0, h), None

    (x, _, _), _ = jax.lax.scan(
        step,
        (x, jnp.zeros_like(x), jnp.float32(1.0)),
        (ts_eval, a_cur, s_cur, a_nxt, s_nxt, h_seq, first_order, last),
    )
    return x
