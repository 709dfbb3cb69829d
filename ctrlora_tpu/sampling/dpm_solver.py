"""DPM-Solver / DPM-Solver++ multistep samplers as one lax.scan.

Reference: ldm/models/diffusion/dpm_solver/ (vendored dpm_solver_pytorch.py,
Lu et al. 2022) — a host-side multistep loop with model wrappers and
interpolated noise schedules. TPU-first rework: the discrete schedule tables
are gathered per scan step, the multistep history (previous two data/noise
predictions + previous two step sizes) lives in the scan carry, and order
selection is a per-step select on trace-time order codes — one jit, no host
round trips.

Grid covered (the reference's `DPMSolverSampler` maps to algorithm
"dpmsolver++", method multistep, order 2, no thresholding):
  * order 1 / 2 / 3 multistep with warm-up (order ramps 1->order) and
    lower-order-final (last `order-1` steps step down, matching the
    reference's multistep loop when lower_order_final is set);
  * algorithm "dpmsolver++" (data prediction) and "dpmsolver" (noise
    prediction);
  * dynamic thresholding for the ++ variant (dynamic_thresholding_ratio
    0.995, thresholding_max_val; reference dpm_solver_pytorch.py
    `dynamic_thresholding_fn`);
  * time-uniform skip (the sampler wrapper's only mode for discrete
    schedules).
Singlestep method and logSNR/quadratic skips are not ported: no reference
surface reaches them (sampler wrapper hardcodes multistep/time_uniform).

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


def _dynamic_threshold(x0: jnp.ndarray, ratio: float, max_val: float) -> jnp.ndarray:
    """Imagen-style dynamic thresholding (reference
    dpm_solver_pytorch.py::dynamic_thresholding_fn): per-sample |x0|
    quantile, floored at max_val, then clamp-and-rescale into [-max_val*?]
    — the reference divides by s, landing values in [-1, 1]."""
    b = x0.shape[0]
    s = jnp.quantile(jnp.abs(x0).reshape(b, -1), ratio, axis=1)
    s = jnp.maximum(s, max_val).reshape(b, *([1] * (x0.ndim - 1)))
    return jnp.clip(x0, -s, s) / s


def order_schedule(n_steps: int, order: int, lower_order_final: bool = True):
    """Per-step effective solver order: warm-up ramp 1..order, then `order`,
    then (lower_order_final) step down on the final steps — mirrors the
    reference's multistep loop bookkeeping INCLUDING its short-run guard
    (ldm/models/diffusion/dpm_solver/dpm_solver.py:1062: `if
    lower_order_final and steps < 15: step_order = min(order, steps+1-step)`;
    at steps >= 15 the final steps keep full order)."""
    ords = np.minimum(np.arange(n_steps) + 1, order)
    if lower_order_final and n_steps < 15:
        ords = np.minimum(ords, n_steps - np.arange(n_steps))
    return ords


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
    order: int = 2,
    algorithm: str = "dpmsolver++",
    thresholding: bool = False,
    dynamic_thresholding_ratio: float = 0.995,
    thresholding_max_val: float = 1.0,
    lower_order_final: bool = True,
) -> jnp.ndarray:
    """Returns final latents [B, h, w, c]."""
    assert order in (1, 2, 3), order
    assert algorithm in ("dpmsolver++", "dpmsolver"), algorithm
    data_pred = algorithm == "dpmsolver++"
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

    ord_seq = jnp.asarray(
        order_schedule(n_steps, order, lower_order_final), jnp.int32
    )

    v_param = pipe.cfg.diffusion.parameterization == "v"

    # hoisted time-embedding rows, one eval timestep per step (see
    # make_emb_row_tables for the dispatch-cost rationale)
    rows_xs = None
    rows_of = lambda block: None
    if cfg.hoist_time_embed:
        from ctrlora_tpu.sampling.common import make_emb_row_tables

        rows_xs, rows_of = make_emb_row_tables(pipe, params, conds, ts_eval)

    def step(carry, inputs):
        x, m1, m2, h1, h2 = carry  # m1/m2: previous 1/2 model predictions
        (t_idx, a_t, s_t, a_n, s_n, h, ordi), blk = inputs

        out = eps_fn(x, t_idx, rows_of(blk))
        if v_param:  # convert v-output to (eps, x0)
            x0 = a_t * x - s_t * out
            eps = s_t * x + a_t * out
        else:
            eps = out
            x0 = (x - s_t * eps) / a_t
        if data_pred:
            if thresholding:
                x0 = _dynamic_threshold(
                    x0, dynamic_thresholding_ratio, thresholding_max_val
                )
            m0 = x0
        else:
            m0 = eps

        r0 = h1 / h
        r1 = h2 / h
        d1_0 = (m0 - m1) / r0
        d1_1 = (m1 - m2) / r1
        d1 = d1_0 + (r0 / (r0 + r1)) * (d1_0 - d1_1)
        d2 = (d1_0 - d1_1) / (r0 + r1)

        if data_pred:
            # x_t = (s_n/s_t) x - a_n phi_1 m0 [+ a_n phi_2 D1 - a_n phi_3 D2]
            phi_1 = jnp.expm1(-h)
            phi_2 = phi_1 / h + 1.0
            phi_3 = phi_2 / h - 0.5
            base = (s_n / s_t) * x - a_n * phi_1 * m0
            upd1 = base
            upd2 = base - 0.5 * a_n * phi_1 * d1_0
            upd3 = base + a_n * phi_2 * d1 - a_n * phi_3 * d2
        else:
            # noise prediction: x_t = (a_n/a_t) x - s_n phi_1 m0 [- ...]
            phi_1 = jnp.expm1(h)
            phi_2 = phi_1 / h - 1.0
            phi_3 = phi_2 / h - 0.5
            base = (a_n / a_t) * x - s_n * phi_1 * m0
            upd1 = base
            upd2 = base - 0.5 * s_n * phi_1 * d1_0
            upd3 = base - s_n * phi_2 * d1 - s_n * phi_3 * d2

        x_next = jnp.where(
            ordi == 1, upd1, jnp.where(ordi == 2, upd2, upd3)
        )
        return (x_next, m0, m1, h, h1), None

    (x, _, _, _, _), _ = jax.lax.scan(
        step,
        (x, jnp.zeros_like(x), jnp.zeros_like(x), jnp.float32(1.0), jnp.float32(1.0)),
        ((ts_eval, a_cur, s_cur, a_nxt, s_nxt, h_seq, ord_seq), rows_xs),
    )
    return x
