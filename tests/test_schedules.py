"""Golden-value tests for noise schedules and DDIM tables.

Cross-checked against an independent torch implementation of the same
formulas (the reference computes betas with torch.linspace in float64,
ldm/modules/diffusionmodules/util.py:21-44) plus hardcoded spot values.
"""

import numpy as np
import pytest

from ctrlora_tpu import schedules


SD15 = dict(linear_start=0.00085, linear_end=0.012, timesteps=1000)


def test_linear_betas_endpoints():
    betas = schedules.make_beta_schedule("linear", 1000, 0.00085, 0.012)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-12)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-12)
    # sqrt-linear interior point: beta_t = (sqrt(b0) + t/(T-1)*(sqrt(bT)-sqrt(b0)))^2
    t = 500
    expected = (0.00085**0.5 + t / 999 * (0.012**0.5 - 0.00085**0.5)) ** 2
    np.testing.assert_allclose(betas[t], expected, rtol=1e-12)


def test_betas_match_torch_float64():
    torch = pytest.importorskip("torch")
    ours = schedules.make_beta_schedule("linear", 1000, 0.00085, 0.012)
    theirs = (
        torch.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=torch.float64) ** 2
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-14)


def test_schedule_tables():
    s = schedules.make_schedule(**SD15)
    assert s.num_timesteps == 1000
    np.testing.assert_allclose(s.alphas_cumprod[0], 1 - 0.00085, rtol=1e-6)
    # known SD1.5 value: final alpha_cumprod ~ 0.0047
    assert 0.004 < s.alphas_cumprod[-1] < 0.005
    np.testing.assert_allclose(
        s.sqrt_alphas_cumprod**2 + s.sqrt_one_minus_alphas_cumprod**2,
        np.ones(1000),
        atol=1e-6,
    )
    assert s.alphas_cumprod_prev[0] == 1.0
    np.testing.assert_allclose(s.alphas_cumprod_prev[1:], s.alphas_cumprod[:-1])
    # lvlb weights finite and first element patched
    assert np.isfinite(s.lvlb_weights).all()
    assert s.lvlb_weights[0] == s.lvlb_weights[1]


def test_ddim_timesteps_uniform():
    ts = schedules.make_ddim_timesteps(50, 1000)
    assert ts.shape == (50,)
    assert ts[0] == 1 and ts[1] == 21 and ts[-1] == 981


def test_ddim_schedule_eta0():
    s = schedules.make_schedule(**SD15)
    d = schedules.make_ddim_schedule(s, 50, eta=0.0)
    assert d.num_steps == 50
    np.testing.assert_allclose(d.sigmas, np.zeros(50), atol=1e-12)
    np.testing.assert_allclose(d.alphas, s.alphas_cumprod[d.timesteps], rtol=1e-6)
    assert d.alphas_prev[0] == s.alphas_cumprod[0]
    np.testing.assert_allclose(d.alphas_prev[1:], s.alphas_cumprod[d.timesteps[:-1]], rtol=1e-6)


def test_ddim_schedule_eta1_sigma_formula():
    s = schedules.make_schedule(**SD15)
    d = schedules.make_ddim_schedule(s, 50, eta=1.0)
    a, ap = d.alphas.astype(np.float64), d.alphas_prev.astype(np.float64)
    expected = np.sqrt((1 - ap) / (1 - a) * (1 - a / ap))
    np.testing.assert_allclose(d.sigmas, expected, rtol=1e-5)


def test_timestep_embedding():
    import jax.numpy as jnp

    t = jnp.array([0, 500, 999])
    emb = schedules.timestep_embedding(t, 320)
    assert emb.shape == (3, 320)
    # t=0: cos(0)=1 for first half, sin(0)=0 for second half
    np.testing.assert_allclose(emb[0, :160], np.ones(160), atol=1e-6)
    np.testing.assert_allclose(emb[0, 160:], np.zeros(160), atol=1e-6)
    # frequency 0 term: cos(t), sin(t)
    np.testing.assert_allclose(emb[1, 0], np.cos(500.0), atol=1e-4)
    np.testing.assert_allclose(emb[1, 160], np.sin(500.0), atol=1e-4)


def test_q_sample_roundtrip():
    import jax.numpy as jnp

    s = schedules.make_schedule(**SD15)
    x = jnp.ones((2, 4, 4, 3))
    noise = jnp.zeros_like(x)
    t = jnp.array([0, 999])
    out = schedules.q_sample(
        jnp.asarray(s.sqrt_alphas_cumprod),
        jnp.asarray(s.sqrt_one_minus_alphas_cumprod),
        x, t, noise,
    )
    np.testing.assert_allclose(out[0], s.sqrt_alphas_cumprod[0], rtol=1e-6)
    np.testing.assert_allclose(out[1], s.sqrt_alphas_cumprod[999], rtol=1e-6)


def test_v_parameterization_consistency():
    import jax.numpy as jnp
    import jax

    s = schedules.make_schedule(**SD15)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    t = jnp.array([100, 700])
    x_t = schedules.q_sample(
        jnp.asarray(s.sqrt_alphas_cumprod),
        jnp.asarray(s.sqrt_one_minus_alphas_cumprod),
        x, t, noise,
    )
    v = schedules.get_v(s, x, noise, t)
    eps = schedules.predict_eps_from_z_and_v(s, x_t, t, v)
    x0 = schedules.predict_start_from_z_and_v(s, x_t, t, v)
    np.testing.assert_allclose(eps, noise, atol=1e-4)
    np.testing.assert_allclose(x0, x, atol=1e-4)
