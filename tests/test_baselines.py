"""Baseline variant pipelines (vanilla CN image-hint, ControlNet-Lite) run
end to end through the train step and sampler on tiny configs."""

import dataclasses

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from ctrlora_tpu.configs import (
    ControlNetConfig, LoRAConfig, TrainConfig, tiny_test_config,
)
from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline
from ctrlora_tpu.sampling.ddim import DDIMConfig, ddim_sample
from ctrlora_tpu.training.step import make_train_step
from ctrlora_tpu.training.train_state import create_train_state


def _tiny_variant(variant):
    cfg = tiny_test_config(hint_mode="image")
    return dataclasses.replace(
        cfg,
        control=dataclasses.replace(cfg.control, variant=variant),
    )


def _run_variant(variant):
    cfg = _tiny_variant(variant)
    pipe = CtrLoraPipeline(cfg)
    params = pipe.init(jax.random.PRNGKey(0), image_size=8)
    B = 1
    ctx = jnp.ones((B, 16, 64))
    x = jnp.zeros((B, 16, 16, 4))
    t = jnp.array([5])
    # tiny VAE downsamples /2 but the hint block always /8, so the pixel
    # hint must be 4x the jpg size for latents to line up in this test
    hint = jnp.ones((B, 128, 128, 3)) * 0.5
    eps = pipe.apply_model(params, x, t, ctx, [Conditioning(hint)])
    assert eps.shape == (B, 16, 16, 4)
    assert np.isfinite(np.asarray(eps)).all()
    # sampling path
    z = ddim_sample(
        pipe, params, jax.random.PRNGKey(1), ctx, jnp.zeros_like(ctx),
        [Conditioning(hint)], (B, 16, 16, 4), DDIMConfig(steps=2),
    )
    assert np.isfinite(np.asarray(z)).all()
    # training step
    tcfg = TrainConfig(learning_rate=1e-4, trainable="all")
    state, tx, _ = create_train_state(params, tcfg)
    step = make_train_step(pipe, tx, tcfg, donate=False)
    batch = {
        "jpg": jnp.zeros((2, 32, 32, 3)),
        "hint": jnp.ones((2, 128, 128, 3)) * 0.5,
        "token_ids": jnp.ones((2, 16), jnp.int32),
    }
    state, m = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
    return float(m["loss"])


@pytest.mark.slow
def test_vanilla_controlnet_pipeline():
    _run_variant("controlnet")


@pytest.mark.slow
def test_lite_pipeline():
    _run_variant("lite")
