"""PLMS + DPM-Solver++(2M) samplers (reference: ldm/models/diffusion/plms.py
and ldm/models/diffusion/dpm_solver/).

Closed-form check: with the model forced to eps=0, every sampler must follow
the exact probability-flow solution x(t) ∝ alpha(t) (telescoped through its
own schedule tables). Convergence check: on a tiny random model, a 50-step
higher-order run must land near a 200-step DDIM "truth" while a 5-step DDIM
run does not.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ctrlora_tpu.configs import tiny_test_config
from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline
from ctrlora_tpu.sampling.ddim import (
    DDIMConfig, ddim_decode_from, ddim_encode, ddim_sample,
)
from ctrlora_tpu.sampling.dpm_solver import dpm_solver_sample
from ctrlora_tpu.sampling.plms import plms_sample
from ctrlora_tpu.schedules import make_ddim_schedule


def _tiny_pipe():
    cfg = tiny_test_config(n_loras=1)
    pipe = CtrLoraPipeline(cfg)
    params = pipe.init(jax.random.PRNGKey(0), image_size=8)

    def bump(path, x):
        ks = jax.tree_util.keystr(path)
        if "kernel" in ks and any(
            s in ks for s in ("conv_out", "proj_out", "out_conv", "zero_")
        ):
            return jax.random.normal(jax.random.PRNGKey(7), x.shape) * 0.05
        return x

    params = params._replace(
        unet=jax.tree_util.tree_map_with_path(bump, params.unet),
        control=jax.tree_util.tree_map_with_path(bump, params.control),
    )
    return pipe, params


def _common_args(pipe, params, B=1):
    ctx = jnp.ones((B, 16, 64)) * 0.1
    hz = jnp.ones((B, 8, 8, 4)) * 0.1
    conds = [Conditioning(hz, lora_idx=jnp.int32(0))]
    shape = (B, 8, 8, 4)
    return ctx, conds, shape


def test_zero_eps_closed_form():
    pipe, params = _tiny_pipe()
    pipe.apply_model = lambda p, x, t, *a, **kw: jnp.zeros_like(x)
    ctx, conds, shape = _common_args(pipe, params)
    x_T = jax.random.normal(jax.random.PRNGKey(1), shape)
    steps = 20

    dd = make_ddim_schedule(pipe.schedule, steps, eta=0.0)
    factor_dd = float(np.sqrt(dd.alphas_prev[0] / dd.alphas[-1]))

    z = ddim_sample(pipe, params, jax.random.PRNGKey(2), ctx, None, conds,
                    shape, DDIMConfig(steps=steps), x_T=x_T)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x_T) * factor_dd,
                               rtol=1e-4, atol=1e-5)

    z = plms_sample(pipe, params, jax.random.PRNGKey(2), ctx, None, conds,
                    shape, DDIMConfig(steps=steps), x_T=x_T)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x_T) * factor_dd,
                               rtol=1e-4, atol=1e-5)

    T = len(pipe.schedule.alphas_cumprod)
    nodes = np.unique(np.round(np.linspace(T - 1, 0, steps + 1)).astype(int))[::-1]
    ac = np.asarray(pipe.schedule.alphas_cumprod)[nodes]
    factor_dpm = float(np.sqrt(ac[-1] / ac[0]))
    z = dpm_solver_sample(pipe, params, jax.random.PRNGKey(2), ctx, None,
                          conds, shape, DDIMConfig(steps=steps), x_T=x_T)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x_T) * factor_dpm,
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_higher_order_converges_to_ddim_truth():
    pipe, params = _tiny_pipe()
    ctx, conds, shape = _common_args(pipe, params)
    x_T = jax.random.normal(jax.random.PRNGKey(1), shape)

    def run(fn, steps, scale=1.0):
        return np.asarray(
            fn(pipe, params, jax.random.PRNGKey(2), ctx, None, conds, shape,
               DDIMConfig(steps=steps, guidance_scale=scale), x_T=x_T)
        )

    truth = run(ddim_sample, 200)
    err = lambda z: np.abs(z - truth).max()
    e_ddim5 = err(run(ddim_sample, 5))
    e_plms = err(run(plms_sample, 50))
    e_dpm = err(run(dpm_solver_sample, 50))
    assert np.isfinite(e_plms) and np.isfinite(e_dpm)
    assert e_plms < e_ddim5, (e_plms, e_ddim5)
    assert e_dpm < e_ddim5, (e_dpm, e_ddim5)
    # determinism
    assert err(run(dpm_solver_sample, 50)) == e_dpm


def test_ddim_encode_zero_eps_exact_roundtrip():
    # with eps=0 the inversion telescopes to sqrt(alphas[t-1]/alphas_prev[0])
    # and eta-0 decode multiplies by exactly the inverse -> identity
    pipe, params = _tiny_pipe()
    pipe.apply_model = lambda p, x, t, *a, **kw: jnp.zeros_like(x)
    ctx, conds, shape = _common_args(pipe, params)
    x0 = jax.random.normal(jax.random.PRNGKey(3), shape)
    steps, t_enc = 20, 12

    dd = make_ddim_schedule(pipe.schedule, steps)
    x_enc = ddim_encode(pipe, params, x0, t_enc, ctx, conds=conds, steps=steps)
    factor = float(np.sqrt(dd.alphas[t_enc - 1] / dd.alphas_prev[0]))
    np.testing.assert_allclose(np.asarray(x_enc), np.asarray(x0) * factor,
                               rtol=1e-4, atol=1e-5)

    back = ddim_decode_from(pipe, params, x_enc, t_enc, ctx, None, conds,
                            DDIMConfig(steps=steps), jax.random.PRNGKey(4))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x0),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_ddim_encode_model_roundtrip_and_cfg():
    # real tiny model: encode then eta-0 decode must approximately invert
    # (discretization error only), and much better than skipping the encode
    pipe, params = _tiny_pipe()
    ctx, conds, shape = _common_args(pipe, params)
    x0 = jax.random.normal(jax.random.PRNGKey(3), shape) * 0.5
    steps, t_enc = 50, 25

    x_enc = ddim_encode(pipe, params, x0, t_enc, ctx, conds=conds, steps=steps)
    back = np.asarray(
        ddim_decode_from(pipe, params, x_enc, t_enc, ctx, None, conds,
                         DDIMConfig(steps=steps), jax.random.PRNGKey(4))
    )
    err = np.abs(back - np.asarray(x0)).max()
    naive = np.abs(
        np.asarray(
            ddim_decode_from(pipe, params, x0, t_enc, ctx, None, conds,
                             DDIMConfig(steps=steps), jax.random.PRNGKey(4))
        )
        - np.asarray(x0)
    ).max()
    assert err < 0.15, err
    assert err < naive * 0.5, (err, naive)

    # CFG path: runs and differs from the uncond-free encode
    ucond = jnp.zeros_like(ctx)
    x_cfg = ddim_encode(pipe, params, x0, t_enc, ctx, uncond_context=ucond,
                        conds=conds, steps=steps, guidance_scale=3.0)
    assert np.isfinite(np.asarray(x_cfg)).all()
    assert np.abs(np.asarray(x_cfg) - np.asarray(x_enc)).max() > 1e-6


def test_dpm_solver_grid_zero_eps_closed_form():
    """All (order, algorithm) cells must follow x proportional-to alpha
    exactly when eps=0 (the probability-flow solution telescopes through
    every multistep update since all divided differences vanish)."""
    pipe, params = _tiny_pipe()
    pipe.apply_model = lambda p, x, t, *a, **kw: jnp.zeros_like(x)
    ctx, conds, shape = _common_args(pipe, params)
    x_T = jax.random.normal(jax.random.PRNGKey(1), shape)
    steps = 20

    T = len(pipe.schedule.alphas_cumprod)
    nodes = np.unique(np.round(np.linspace(T - 1, 0, steps + 1)).astype(int))[::-1]
    ac = np.asarray(pipe.schedule.alphas_cumprod)[nodes]
    factor = float(np.sqrt(ac[-1] / ac[0]))
    for order in (1, 2, 3):
        for algo in ("dpmsolver++", "dpmsolver"):
            z = dpm_solver_sample(
                pipe, params, jax.random.PRNGKey(2), ctx, None, conds, shape,
                DDIMConfig(steps=steps), x_T=x_T, order=order, algorithm=algo,
            )
            np.testing.assert_allclose(
                np.asarray(z), np.asarray(x_T) * factor, rtol=1e-3, atol=1e-4,
                err_msg=f"order={order} algo={algo}",
            )


@pytest.mark.slow
def test_dpm_solver_order3_converges():
    pipe, params = _tiny_pipe()
    ctx, conds, shape = _common_args(pipe, params)
    x_T = jax.random.normal(jax.random.PRNGKey(1), shape)

    truth = np.asarray(
        ddim_sample(pipe, params, jax.random.PRNGKey(2), ctx, None, conds,
                    shape, DDIMConfig(steps=200), x_T=x_T)
    )

    def err(order, steps=20):
        z = dpm_solver_sample(
            pipe, params, jax.random.PRNGKey(2), ctx, None, conds, shape,
            DDIMConfig(steps=steps), x_T=x_T, order=order,
        )
        return np.abs(np.asarray(z) - truth).max()

    e1, e2, e3 = err(1), err(2), err(3)
    assert np.isfinite([e1, e2, e3]).all()
    # higher order helps at 20 steps on this model
    assert e2 < e1, (e1, e2)
    assert e3 < e1 * 0.9, (e1, e3)


def test_dpm_solver_dynamic_thresholding_bounds_x0():
    """With thresholding on, the data prediction is clamped into [-1, 1]:
    force a huge model output and require the trajectory to stay bounded
    while the unthresholded one blows past it."""
    pipe, params = _tiny_pipe()
    big = 50.0
    pipe.apply_model = lambda p, x, t, *a, **kw: jnp.full_like(x, -big)
    ctx, conds, shape = _common_args(pipe, params)
    x_T = jnp.zeros(shape)
    steps = 8
    z_thr = dpm_solver_sample(
        pipe, params, jax.random.PRNGKey(2), ctx, None, conds, shape,
        DDIMConfig(steps=steps), x_T=x_T, thresholding=True,
    )
    z_raw = dpm_solver_sample(
        pipe, params, jax.random.PRNGKey(2), ctx, None, conds, shape,
        DDIMConfig(steps=steps), x_T=x_T,
    )
    assert float(jnp.abs(z_thr).max()) <= 1.5
    assert float(jnp.abs(z_raw).max()) > 5.0


def test_dpm_order_schedule_matches_reference_loop():
    """Per-step order bookkeeping vs an independent transcription of the
    reference multistep loop (dpm_solver.py:1053-1066): warm-up ramp by
    model_prev_list growth, then `if lower_order_final and steps < 15:
    step_order = min(order, steps + 1 - step)` else full order."""
    from ctrlora_tpu.sampling.dpm_solver import order_schedule

    def reference_orders(steps, order, lower_order_final=True):
        # steps+1 nodes -> `steps` updates; update i uses min(i+1, order)
        # during warm-up (init loop), then the guarded step_order
        out = []
        for i in range(steps):
            warm = min(i + 1, order)
            if warm < order:
                out.append(warm)
                continue
            step = i + 1  # reference's `step` in range(order, steps+1)
            if lower_order_final and steps < 15:
                out.append(min(order, steps + 1 - step))
            else:
                out.append(order)
        return out

    for steps in (4, 8, 14, 15, 20, 50):
        for order in (1, 2, 3):
            for lof in (True, False):
                got = list(order_schedule(steps, order, lof))
                want = reference_orders(steps, order, lof)
                assert got == want, (steps, order, lof, got, want)


def test_dpm_singlestep_orders_match_reference_bookkeeping():
    """Block-order decomposition vs the reference's documented scheme
    (dpm_solver.py:405-462): total evals == steps, uniform blocks with the
    exact lower-order tails."""
    from ctrlora_tpu.sampling.dpm_solver import singlestep_orders

    assert singlestep_orders(20, 2) == [2] * 10
    assert singlestep_orders(21, 2) == [2] * 10 + [1]
    assert singlestep_orders(21, 3) == [3] * 6 + [2, 1]  # K-2 blocks, 2, 1
    assert singlestep_orders(22, 3) == [3] * 7 + [1]
    assert singlestep_orders(23, 3) == [3] * 7 + [2]
    assert singlestep_orders(24, 3) == [3] * 7 + [2, 1]
    assert singlestep_orders(5, 1) == [1] * 5
    for steps in (5, 20, 21, 22, 23, 24, 50):
        for order in (1, 2, 3):
            assert sum(singlestep_orders(steps, order)) == steps


def test_dpm_singlestep_zero_eps_closed_form():
    """With eps=0 the exact flow is x(t) = (alpha_t/alpha_s) x_s; every
    singlestep order must telescope to it exactly (the higher-order
    correction terms vanish because the data prediction x/alpha is constant
    along the exact flow)."""
    from ctrlora_tpu.sampling.dpm_solver import dpm_solver_singlestep_sample

    pipe, params = _tiny_pipe()
    pipe.apply_model = lambda p, x, t, *a, **kw: jnp.zeros_like(x)
    ctx, conds, shape = _common_args(pipe, params)
    x_T = jax.random.normal(jax.random.PRNGKey(1), shape)
    steps = 21
    T = len(pipe.schedule.alphas_cumprod)
    nodes = np.unique(np.round(np.linspace(T - 1, 0, steps + 1)).astype(int))[::-1]
    ac = np.asarray(pipe.schedule.alphas_cumprod)[nodes]
    factor = float(np.sqrt(ac[-1] / ac[0]))
    for order in (1, 2, 3):
        for algo in ("dpmsolver++", "dpmsolver"):
            z = dpm_solver_singlestep_sample(
                pipe, params, jax.random.PRNGKey(2), ctx, None, conds, shape,
                DDIMConfig(steps=steps), x_T=x_T, order=order, algorithm=algo,
            )
            np.testing.assert_allclose(
                np.asarray(z), np.asarray(x_T) * factor, rtol=1e-3, atol=1e-4,
                err_msg=f"order={order} algo={algo}",
            )


def test_dpm_singlestep_order1_matches_multistep_order1():
    """Order 1 is DPM-Solver-1 on the same time-uniform fine grid for both
    methods — they must agree to float tolerance on a real tiny model."""
    from ctrlora_tpu.sampling.dpm_solver import dpm_solver_singlestep_sample

    pipe, params = _tiny_pipe()
    ctx, conds, shape = _common_args(pipe, params)
    x_T = jax.random.normal(jax.random.PRNGKey(1), shape)
    kw = dict(x_T=x_T, order=1)
    z_ss = dpm_solver_singlestep_sample(
        pipe, params, jax.random.PRNGKey(2), ctx, None, conds, shape,
        DDIMConfig(steps=10), **kw,
    )
    z_ms = dpm_solver_sample(
        pipe, params, jax.random.PRNGKey(2), ctx, None, conds, shape,
        DDIMConfig(steps=10), **kw,
    )
    np.testing.assert_allclose(np.asarray(z_ss), np.asarray(z_ms),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_dpm_singlestep_converges():
    """Singlestep orders 2/3 at 48 evals must land near the DDIM-200 truth
    while DDIM-5 does not, and must be deterministic."""
    from ctrlora_tpu.sampling.dpm_solver import dpm_solver_singlestep_sample

    pipe, params = _tiny_pipe()
    ctx, conds, shape = _common_args(pipe, params)
    x_T = jax.random.normal(jax.random.PRNGKey(1), shape)

    truth = np.asarray(
        ddim_sample(pipe, params, jax.random.PRNGKey(2), ctx, None, conds,
                    shape, DDIMConfig(steps=200), x_T=x_T)
    )
    err = lambda z: np.abs(np.asarray(z) - truth).max()
    e_ddim5 = err(
        ddim_sample(pipe, params, jax.random.PRNGKey(2), ctx, None, conds,
                    shape, DDIMConfig(steps=5), x_T=x_T)
    )
    for order in (2, 3):
        z = dpm_solver_singlestep_sample(
            pipe, params, jax.random.PRNGKey(2), ctx, None, conds, shape,
            DDIMConfig(steps=48), x_T=x_T, order=order,
        )
        assert np.isfinite(np.asarray(z)).all()
        assert err(z) < e_ddim5, (order, err(z), e_ddim5)
        z2 = dpm_solver_singlestep_sample(
            pipe, params, jax.random.PRNGKey(2), ctx, None, conds, shape,
            DDIMConfig(steps=48), x_T=x_T, order=order,
        )
        assert err(z2) == err(z)  # deterministic
