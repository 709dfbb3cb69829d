"""Hoisted cross-attention K|V tables (pipeline.xattn_kv_tables) must be
numerically identical to the in-loop `ctx @ [wk|wv]` projection — the table
entry IS that fused dot, computed once outside the sampler scan. Covers the
fused-override path (hoistable), the runtime-LoRA control path (control
branch falls back to in-loop, UNet branch still hoists), and the full DDIM
sampler on/off."""

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


def _io(pipe, params, B=2):
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 16, 16, 4))
    ctx = jax.random.normal(
        jax.random.PRNGKey(2), (B, 16, pipe.cfg.clip.hidden_size)
    )
    hint_z = jax.random.normal(jax.random.PRNGKey(3), (B, 16, 16, 4))
    return x, ctx, hint_z


@pytest.mark.slow  # fast-lane budget: make_pipe compiles minutes on CPU
def test_apply_model_with_kv_rows_matches_inloop():
    pipe, params = make_pipe()
    fused = fuse_control_tree(params.control, 0, pipe.cfg.control.lora)
    x, ctx, hint_z = _io(pipe, params)
    conds = [Conditioning(hint_z, control_params=fused)]
    tvec = jnp.full((x.shape[0],), 421, jnp.int32)

    ref = pipe.apply_model(params, x, tvec, ctx, conds)

    tables = pipe.xattn_kv_tables(params, ctx, conds)
    assert tables is not None and tables["unet"]
    assert tables["control"][0] is not None  # fused tree: hoistable
    out = pipe.apply_model(params, x, tvec, ctx, conds, kv_rows=tables)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.slow
def test_runtime_lora_control_branch_stays_inloop():
    pipe, params = make_pipe()
    x, ctx, hint_z = _io(pipe, params)
    conds = [Conditioning(hint_z, lora_idx=jnp.int32(0))]
    tvec = jnp.full((x.shape[0],), 33, jnp.int32)

    tables = pipe.xattn_kv_tables(params, ctx, conds)
    # the control tree carries lora_down on attn k/v -> that branch is None,
    # the (frozen, lora-free) UNet branch still hoists
    assert tables is not None and tables["unet"]
    assert tables["control"][0] is None

    ref = pipe.apply_model(params, x, tvec, ctx, conds)
    out = pipe.apply_model(params, x, tvec, ctx, conds, kv_rows=tables)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.slow
def test_ddim_sample_kv_hoist_on_off_identical():
    pipe, params = make_pipe()
    fused = fuse_control_tree(params.control, 0, pipe.cfg.control.lora)
    B = 1
    ctx = pipe.encode_text_tokens(params, jnp.ones((B, 16), jnp.int32))
    uncond = pipe.encode_text_tokens(params, jnp.zeros((B, 16), jnp.int32))
    hint = jax.random.uniform(jax.random.PRNGKey(3), (B, 32, 32, 3))
    hint_z = pipe.encode_first_stage(params, hint)
    conds = [Conditioning(hint_z, control_params=fused)]

    def sample(hoist):
        return ddim_sample(
            pipe, params, jax.random.PRNGKey(4), ctx, uncond, conds,
            (B, 16, 16, 4),
            DDIMConfig(steps=3, guidance_scale=7.5, hoist_xattn_kv=hoist),
        )

    z_on, z_off = sample(True), sample(False)
    assert np.isfinite(np.asarray(z_on)).all()
    # the hoisted dot is the same op on the same operands; only XLA fusion
    # context differs (same tolerance rationale as test_emb_hoist)
    np.testing.assert_allclose(np.asarray(z_on), np.asarray(z_off), atol=2e-4)


@pytest.mark.slow
def test_unsupported_variants_return_none():
    cfg = tiny_test_config(hint_mode="image")
    cfg = dataclasses.replace(
        cfg, control=dataclasses.replace(cfg.control, variant="xs",
                                         control_model_ratio=0.5)
    )
    pipe = CtrLoraPipeline(cfg)
    params = pipe.init(jax.random.PRNGKey(0), image_size=8)
    ctx = jnp.zeros((1, 16, pipe.cfg.clip.hidden_size))
    assert pipe.xattn_kv_tables(params, ctx, None) is None
