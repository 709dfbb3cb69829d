"""Hoisted time-embedding tables (pipeline.emb_proj_tables) must be
numerically identical to the in-loop TimestepEmbed + per-block emb_proj
path — same modules, same subtrees, same op order. Covers the runtime-LoRA
control path, the fused-override path, and the full sampler."""

import dataclasses

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ctrlora_tpu.configs import tiny_test_config
from ctrlora_tpu.lora_fuse import fuse_control_tree
from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline
from ctrlora_tpu.sampling.ddim import DDIMConfig, ddim_sample

from tests.test_pipeline import make_pipe


def _randomized_lora(params, scale=0.05):
    """lora_up is zero at init; perturb so LoRA actually contributes."""

    def bump(path, x):
        if "lora_up" in jax.tree_util.keystr(path):
            return jax.random.normal(jax.random.PRNGKey(7), x.shape) * scale
        return x

    return jax.tree_util.tree_map_with_path(bump, params)


@pytest.mark.slow
def test_apply_model_with_rows_matches_inloop():
    pipe, params = make_pipe()
    params = _randomized_lora(params)
    B = 2
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 16, pipe.cfg.clip.hidden_size))
    hint_z = jax.random.normal(jax.random.PRNGKey(3), (B, 16, 16, 4))
    conds = [Conditioning(hint_z, lora_idx=jnp.int32(0))]
    t_scalar = 421
    tvec = jnp.full((B,), t_scalar, jnp.int32)

    ref = pipe.apply_model(params, x, tvec, ctx, conds)

    tables = pipe.emb_proj_tables(params, jnp.asarray([t_scalar]), conds)
    assert tables is not None and tables["unet"] and tables["control"]
    rows = jax.tree.map(lambda a: a[0], tables)
    out = pipe.apply_model(params, x, tvec, ctx, conds, emb_rows=rows)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.slow  # fast-lane budget (VERDICT r5 #7): >25s on CPU
def test_fused_override_rows_match():
    pipe, params = make_pipe()
    params = _randomized_lora(params)
    fused = fuse_control_tree(params.control, 0, pipe.cfg.control.lora)
    B = 1
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 16, pipe.cfg.clip.hidden_size))
    hint_z = jax.random.normal(jax.random.PRNGKey(3), (B, 16, 16, 4))
    conds = [Conditioning(hint_z, control_params=fused)]
    tvec = jnp.full((B,), 33, jnp.int32)

    ref = pipe.apply_model(params, x, tvec, ctx, conds)
    tables = pipe.emb_proj_tables(params, jnp.asarray([33]), conds)
    rows = jax.tree.map(lambda a: a[0], tables)
    out = pipe.apply_model(params, x, tvec, ctx, conds, emb_rows=rows)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.slow  # fast-lane budget (VERDICT r5 #7): >25s on CPU
def test_ddim_sample_hoist_on_off_identical():
    pipe, params = make_pipe()
    params = _randomized_lora(params)
    B = 1
    ctx = pipe.encode_text_tokens(params, jnp.ones((B, 16), jnp.int32))
    uncond = pipe.encode_text_tokens(params, jnp.zeros((B, 16), jnp.int32))
    hint = jax.random.uniform(jax.random.PRNGKey(3), (B, 32, 32, 3))
    hint_z = pipe.encode_first_stage(params, hint)
    conds = [Conditioning(hint_z, lora_idx=jnp.int32(0))]

    def sample(hoist):
        return ddim_sample(
            pipe, params, jax.random.PRNGKey(4), ctx, uncond, conds,
            (B, 16, 16, 4),
            DDIMConfig(steps=3, guidance_scale=7.5, hoist_time_embed=hoist),
        )

    z_on, z_off = sample(True), sample(False)
    assert np.isfinite(np.asarray(z_on)).all()
    # step-level parity is exact (tests above, atol 1e-6); over a 3-step
    # CFG-7.5 trajectory XLA's different batching of the table matmul
    # ([S,.] vs [2B,.]) amplifies last-ulp reassociation to ~3e-5
    np.testing.assert_allclose(np.asarray(z_on), np.asarray(z_off), atol=2e-4)


@pytest.mark.slow  # fast-lane budget (VERDICT r5 #7): >25s on CPU
def test_unsupported_variant_falls_back():
    cfg = tiny_test_config(hint_mode="image")
    cfg = dataclasses.replace(
        cfg, control=dataclasses.replace(cfg.control, variant="xs",
                                         control_model_ratio=0.5)
    )
    pipe = CtrLoraPipeline(cfg)
    params = pipe.init(jax.random.PRNGKey(0), image_size=8)
    assert pipe.emb_proj_tables(params, jnp.asarray([5]), None) is None


def _sampler_io(pipe, params, B=1):
    ctx = pipe.encode_text_tokens(params, jnp.ones((B, 16), jnp.int32))
    uncond = pipe.encode_text_tokens(params, jnp.zeros((B, 16), jnp.int32))
    hint = jax.random.uniform(jax.random.PRNGKey(3), (B, 32, 32, 3))
    hint_z = pipe.encode_first_stage(params, hint)
    return ctx, uncond, [Conditioning(hint_z, lora_idx=jnp.int32(0))]


@pytest.mark.slow
def test_plms_hoist_on_off_identical():
    from ctrlora_tpu.sampling.plms import plms_sample

    pipe, params = make_pipe()
    params = _randomized_lora(params)
    ctx, uncond, conds = _sampler_io(pipe, params)

    def sample(hoist):
        return plms_sample(
            pipe, params, jax.random.PRNGKey(4), ctx, uncond, conds,
            (1, 16, 16, 4),
            DDIMConfig(steps=3, guidance_scale=7.5, hoist_time_embed=hoist),
        )

    z_on, z_off = sample(True), sample(False)
    assert np.isfinite(np.asarray(z_on)).all()
    np.testing.assert_allclose(np.asarray(z_on), np.asarray(z_off), atol=2e-4)


@pytest.mark.slow  # fast-lane budget (VERDICT r5 #7): >25s on CPU
def test_dpm_solver_hoist_on_off_identical():
    from ctrlora_tpu.sampling.dpm_solver import dpm_solver_sample

    pipe, params = make_pipe()
    params = _randomized_lora(params)
    ctx, uncond, conds = _sampler_io(pipe, params)

    def sample(hoist):
        return dpm_solver_sample(
            pipe, params, jax.random.PRNGKey(4), ctx, uncond, conds,
            (1, 16, 16, 4),
            DDIMConfig(steps=4, guidance_scale=7.5, hoist_time_embed=hoist),
            order=2,
        )

    z_on, z_off = sample(True), sample(False)
    assert np.isfinite(np.asarray(z_on)).all()
    np.testing.assert_allclose(np.asarray(z_on), np.asarray(z_off), atol=2e-4)
