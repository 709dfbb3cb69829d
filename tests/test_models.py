"""Shape/behavior tests for UNet, ControlNet, VAE and CLIP on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlora_tpu.configs import tiny_test_config, UNetConfig, ControlNetConfig, LoRAConfig
from ctrlora_tpu.models.unet import UNet, ControlNet, encoder_plan, decoder_plan
from ctrlora_tpu.models.vae import AutoencoderKL, sample_posterior
from ctrlora_tpu.models.clip import CLIPTextModel


CFG = tiny_test_config()


def test_encoder_plan_sd15_shape():
    cfg = UNetConfig()  # full SD1.5
    steps, chans, ch = encoder_plan(cfg)
    assert len(steps) == 12  # conv + 4 levels x 2 res + 3 downs
    assert chans == [320, 320, 320, 320, 640, 640, 640, 1280, 1280, 1280, 1280, 1280]
    assert ch == 1280
    dec = decoder_plan(cfg)
    assert len(dec) == 12
    assert [d.out_ch for d in dec[:3]] == [1280, 1280, 1280]
    assert dec[2].upsample and not dec[0].upsample
    # attention present at ds 4,2,1 but not 8
    assert not dec[0].attn and dec[3].attn


def _init_unet():
    unet = UNet(CFG.unet)
    x = jnp.zeros((2, 16, 16, 4))
    t = jnp.array([3, 5])
    ctx = jnp.zeros((2, 16, 64))
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)
    return unet, params, (x, t, ctx)


def test_unet_forward_shape():
    unet, params, (x, t, ctx) = _init_unet()
    out = unet.apply(params, x, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    assert out.dtype == jnp.float32
    # zero-init output conv -> output must be exactly zero at init
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_controlnet_latent_mode_and_injection():
    unet, uparams, (x, t, ctx) = _init_unet()
    cn = ControlNet(CFG.control)
    hint = jnp.ones((2, 16, 16, 4))
    cparams = cn.init(jax.random.PRNGKey(1), hint, t, ctx)
    control = cn.apply(cparams, hint, t, ctx)
    steps, _, _ = encoder_plan(CFG.unet)
    assert len(control) == len(steps) + 1
    # zero convs -> all residuals are exactly zero at init
    for c in control:
        np.testing.assert_array_equal(np.asarray(c), 0.0)
    # give the zero-init output conv real weights so effects are observable
    def randomize_out(path, v):
        ks = jax.tree_util.keystr(path)
        if "conv_out" in ks and "kernel" in ks:
            return jax.random.normal(jax.random.PRNGKey(2), v.shape) * 0.1
        return v
    uparams = jax.tree_util.tree_map_with_path(randomize_out, uparams)
    # controlled forward == uncontrolled forward when residuals are zero
    out0 = unet.apply(uparams, x, t, ctx)
    out1 = unet.apply(uparams, x, t, ctx, control=control)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-6)
    # non-zero control changes the output
    control2 = tuple(c + 0.5 for c in control)
    out2 = unet.apply(uparams, x, t, ctx, control=control2)
    assert np.abs(np.asarray(out2) - np.asarray(out0)).max() > 1e-4


def test_controlnet_image_mode():
    cfg = tiny_test_config(hint_mode="image")
    cn = ControlNet(cfg.control)
    x = jnp.zeros((1, 16, 16, 4))
    hint = jnp.zeros((1, 128, 128, 3))
    t = jnp.array([0])
    ctx = jnp.zeros((1, 16, 64))
    params = cn.init(jax.random.PRNGKey(0), x, t, ctx, hint=hint)
    control = cn.apply(params, x, t, ctx, hint=hint)
    assert control[0].shape == (1, 16, 16, 32)


def test_lora_switching_changes_output():
    cfg = tiny_test_config(n_loras=3)
    cn = ControlNet(cfg.control)
    hint = jnp.ones((1, 16, 16, 4))
    t = jnp.array([7])
    ctx = jnp.ones((1, 16, 64))
    params = cn.init(jax.random.PRNGKey(0), hint, t, ctx, lora_idx=jnp.int32(0))
    # lora_up is zero-init, so all adapters are identity at init
    c0 = cn.apply(params, hint, t, ctx, lora_idx=jnp.int32(0))
    c1 = cn.apply(params, hint, t, ctx, lora_idx=jnp.int32(1))
    for a, b in zip(c0, c1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # perturb adapter 1's up matrices -> idx 1 differs from idx 0; also give
    # the zero convs real weights so residuals are observable
    def bump(path, x):
        ks = jax.tree_util.keystr(path)
        if "lora_up" in ks:
            return x.at[1].add(0.05)
        # zero-init layers make every block an identity at init; give them
        # real weights so LoRA deltas propagate to the taps
        if "kernel" in ks and any(z in ks for z in ("zero_", "out_conv", "proj_out")):
            return jax.random.normal(jax.random.PRNGKey(3), x.shape) * 0.1
        return x
    perturbed = jax.tree_util.tree_map_with_path(bump, params)
    # run through the *unet-side* effect: residuals differ between indices
    mids0 = cn.apply(perturbed, hint, t, ctx, lora_idx=jnp.int32(0))
    mids1 = cn.apply(perturbed, hint, t, ctx, lora_idx=jnp.int32(1))
    diffs = [np.abs(np.asarray(a) - np.asarray(b)).max() for a, b in zip(mids0, mids1)]
    assert max(diffs) > 0  # switching the index switches weights
    # same index -> identical (pure function of (params, idx))
    again = cn.apply(perturbed, hint, t, ctx, lora_idx=jnp.int32(1))
    for a, b in zip(mids1, again):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_switchable_banks_exist_and_switch():
    cfg = tiny_test_config(n_loras=2, switchable_banks=True)
    cn = ControlNet(cfg.control)
    hint = jnp.ones((1, 16, 16, 4))
    t = jnp.array([3])
    ctx = jnp.ones((1, 16, 64))
    params = cn.init(jax.random.PRNGKey(0), hint, t, ctx, lora_idx=jnp.int32(0))
    flat = jax.tree_util.tree_leaves_with_path(params)
    bank_paths = [
        jax.tree_util.keystr(p) for p, v in flat
        if "zero_" in jax.tree_util.keystr(p) and v.ndim >= 1 and v.shape[0] == 2
    ]
    assert bank_paths, "banked zero convs missing"
    norm_banks = [
        jax.tree_util.keystr(p) for p, v in flat
        if "norm" in jax.tree_util.keystr(p) and v.ndim == 2 and v.shape[0] == 2
    ]
    assert norm_banks, "banked transformer norms missing"
    # perturb bank slot 1 of a zero conv kernel -> outputs differ by index
    def bump(path, x):
        ks = jax.tree_util.keystr(path)
        if "zero_mid" in ks and "kernel" in ks:
            return x.at[1].add(0.1)
        return x
    params2 = jax.tree_util.tree_map_with_path(bump, params)
    c0 = cn.apply(params2, hint, t, ctx, lora_idx=jnp.int32(0))
    c1 = cn.apply(params2, hint, t, ctx, lora_idx=jnp.int32(1))
    assert np.abs(np.asarray(c0[-1]) - np.asarray(c1[-1])).max() > 0


def test_vae_roundtrip_shapes():
    vae = AutoencoderKL(CFG.vae)
    x = jnp.ones((1, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(0), x)
    mean, logvar = vae.apply(params, x, method=AutoencoderKL.encode)
    assert mean.shape == (1, 16, 16, 4)  # 2 levels -> /2
    assert logvar.shape == mean.shape
    z = sample_posterior(mean, logvar, jax.random.PRNGKey(1))
    rec = vae.apply(params, z, method=AutoencoderKL.decode)
    assert rec.shape == (1, 32, 32, 3)


def test_vae_bf16_decode_matches_fp32():
    """bf16 VAE decode (the inference default's A/B candidate) must stay
    numerically close to the fp32 reference decode: outputs are 8-bit
    images downstream, so ~1% relative error is invisible."""
    import dataclasses

    cfg32 = dataclasses.replace(CFG.vae, dtype="float32")
    cfg16 = dataclasses.replace(CFG.vae, dtype="bfloat16")
    vae32, vae16 = AutoencoderKL(cfg32), AutoencoderKL(cfg16)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 3)) * 0.5
    params = vae32.init(jax.random.PRNGKey(0), x)
    # randomize so the decode is a non-trivial map (zero-init-free VAE, but
    # keep scale moderate to mimic trained-weight magnitudes)
    z = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 4))
    r32 = np.asarray(vae32.apply(params, z, method=AutoencoderKL.decode))
    r16 = np.asarray(vae16.apply(params, z, method=AutoencoderKL.decode))
    scale = max(np.abs(r32).max(), 1e-6)
    rel = np.abs(r32 - r16).max() / scale
    assert rel < 0.05, f"bf16 decode diverges: rel={rel:.4f}"
    assert r16.dtype == np.float32  # decode() upcasts its output


def test_clip_shapes_and_causality():
    clip = CLIPTextModel(CFG.clip)
    ids = jnp.zeros((2, 16), jnp.int32).at[:, 0].set(1).at[:, 5].set(99)
    params = clip.init(jax.random.PRNGKey(0), ids)
    out = clip.apply(params, ids)
    assert out.shape == (2, 16, 64)
    # causality: changing a later token must not affect earlier positions
    ids2 = ids.at[:, 10].set(42)
    out2 = clip.apply(params, ids2)
    np.testing.assert_allclose(
        np.asarray(out[:, :10]), np.asarray(out2[:, :10]), atol=1e-5
    )
    assert np.abs(np.asarray(out[:, 10:]) - np.asarray(out2[:, 10:])).max() > 1e-6
