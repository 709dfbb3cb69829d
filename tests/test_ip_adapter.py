"""IP-Adapter tests: vision tower parity, ImageProjModel parity, ip-site
mapping, and the style sampling path on a tiny model."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctrlora_tpu.configs import UNetConfig, tiny_test_config
from ctrlora_tpu.models.ip_adapter import (
    CLIPVisionConfig, CLIPVisionModel, ImageProjModel, convert_clip_vision,
    convert_image_proj, ip_attn_sites, load_ip_adapter_into,
)


def test_ip_sites_sd15_count():
    sites = ip_attn_sites(UNetConfig())
    assert len(sites) == 16  # 6 encoder + 1 middle + 9 decoder
    assert sites[0][0] == "in_1_attn" and sites[6][0] == "mid_attn"
    assert sites[-1][0] == "out_11_attn"


def test_clip_vision_parity():
    torch = pytest.importorskip("torch")
    import transformers

    hf_cfg = transformers.CLIPVisionConfig(
        image_size=28, patch_size=14, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, projection_dim=16,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    ref = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    my_cfg = CLIPVisionConfig(
        image_size=28, patch_size=14, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, projection_dim=16, hidden_act="gelu",
    )
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    tree = convert_clip_vision(sd, my_cfg)
    px = np.random.default_rng(0).standard_normal((2, 3, 28, 28), np.float32)
    with torch.no_grad():
        want = ref(pixel_values=torch.from_numpy(px)).image_embeds.numpy()
    got = CLIPVisionModel(my_cfg).apply(
        jax.tree_util.tree_map(jnp.asarray, tree),
        jnp.asarray(px.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(want, np.asarray(got), atol=2e-4, rtol=2e-3)


def test_image_proj_parity():
    torch = pytest.importorskip("torch")
    # the reference formula (app/gradio_ctrlora_style_transfer.py:93-111):
    # LayerNorm(reshape(Linear(embeds), [-1, 4, 768]))
    torch.manual_seed(1)
    lin = torch.nn.Linear(32, 4 * 16)
    ln = torch.nn.LayerNorm(16)
    x = torch.randn(2, 32)
    with torch.no_grad():
        want = ln(lin(x).reshape(-1, 4, 16)).numpy()
    sd = {
        "proj.weight": lin.weight.detach().numpy(),
        "proj.bias": lin.bias.detach().numpy(),
        "norm.weight": ln.weight.detach().numpy(),
        "norm.bias": ln.bias.detach().numpy(),
    }
    model = ImageProjModel(cross_attention_dim=16, clip_extra_context_tokens=4)
    got = model.apply(
        jax.tree_util.tree_map(jnp.asarray, convert_image_proj(sd)),
        jnp.asarray(x.numpy()),
    )
    np.testing.assert_allclose(want, np.asarray(got), atol=1e-5, rtol=1e-4)


def _tiny_style_cfg():
    cfg = tiny_test_config(n_loras=1, switchable_banks=True)
    return dataclasses.replace(
        cfg, unet=dataclasses.replace(cfg.unet, ip_tokens=2)
    )


@pytest.mark.slow
def test_style_sampling_path():
    from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline
    from ctrlora_tpu.sampling.ddim import DDIMConfig, ddim_sample

    cfg = _tiny_style_cfg()
    pipe = CtrLoraPipeline(cfg)
    params = pipe.init(jax.random.PRNGKey(0), image_size=8)
    B = 1
    ctx = jnp.ones((B, 16, 64))
    unc = jnp.zeros((B, 16, 64))
    hz = jnp.ones((B, 8, 8, 4)) * 0.1
    conds = [Conditioning(hz, lora_idx=jnp.int32(0))]
    ip_zero = jnp.zeros((B, 2, 64))
    z0 = ddim_sample(
        pipe, params, jax.random.PRNGKey(1), ctx, unc, conds, (B, 8, 8, 4),
        DDIMConfig(steps=2), ip_context=ip_zero,
    )
    assert np.isfinite(np.asarray(z0)).all()
    # zero ip tokens attend to zero values -> identical to nonzero ip_scale
    # with zero tokens; perturbing the tokens changes the output only via
    # the (zero-init) to_k_ip/to_v_ip, so perturb those weights first
    def bump(path, x):
        ks = jax.tree_util.keystr(path)
        if "to_k_ip" in ks or "to_v_ip" in ks:
            return jnp.ones_like(x) * 0.1
        if "kernel" in ks and any(s in ks for s in ("conv_out", "proj_out", "out_conv")):
            return jax.random.normal(jax.random.PRNGKey(5), x.shape) * 0.05
        return x
    params2 = params._replace(
        unet=jax.tree_util.tree_map_with_path(bump, params.unet)
    )
    z1 = ddim_sample(
        pipe, params2, jax.random.PRNGKey(1), ctx, unc, conds, (B, 8, 8, 4),
        DDIMConfig(steps=2), ip_context=ip_zero,
    )
    z2 = ddim_sample(
        pipe, params2, jax.random.PRNGKey(1), ctx, unc, conds, (B, 8, 8, 4),
        DDIMConfig(steps=2), ip_context=jnp.ones((B, 2, 64)),
    )
    assert np.abs(np.asarray(z1) - np.asarray(z2)).max() > 1e-6


def test_load_ip_adapter_into_tiny():
    cfg = _tiny_style_cfg()
    from ctrlora_tpu.models.unet import UNet
    from ctrlora_tpu.utils import ckpt_torch as bridge

    unet = UNet(cfg.unet)
    x = jnp.zeros((1, 8, 8, 4))
    params = unet.init(
        jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 18, 64)),
    )
    sites = ip_attn_sites(cfg.unet)
    rng = np.random.default_rng(0)
    inner = cfg.unet.model_channels * 2  # widest attn site dim varies; use per-site
    ip_sd = {}
    tree = bridge.tree_to_mutable(params)
    for j, site in enumerate(sites):
        node = tree["params"]
        for part in site:
            node = node[part]
        d_in, d_out = node["to_k"]["kernel"].shape
        ip_sd[f"{2 * j + 1}.to_k_ip.weight"] = rng.standard_normal((d_out, d_in)).astype(np.float32)
        ip_sd[f"{2 * j + 1}.to_v_ip.weight"] = rng.standard_normal((d_out, d_in)).astype(np.float32)
    load_ip_adapter_into(tree, ip_sd, cfg.unet, ip_scale=0.7, target="all")
    node = tree["params"]
    for part in sites[0]:
        node = node[part]
    assert node["ip_scale"] == np.float32(0.7)
    np.testing.assert_allclose(
        node["to_k_ip"]["kernel"], ip_sd["1.to_k_ip.weight"].T
    )
    # model still applies: trace-level check (eval_shape) — the numeric ip
    # path is covered by the slow tests below; a full CPU compile here cost
    # ~25s of fast-lane budget for no extra coverage
    out = jax.eval_shape(
        unet.apply, jax.tree_util.tree_map(jnp.asarray, tree), x,
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 18, 64)),
    )
    assert out.shape == (1, 8, 8, 4)


@pytest.mark.slow
def test_uncond_ip_context_changes_cfg():
    """The style app feeds image_proj(zeros) to the uncond CFG half
    (app/gradio_ctrlora_style_transfer.py:410); a distinct uncond_ip_context
    must change the guided output."""
    from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline
    from ctrlora_tpu.sampling.ddim import DDIMConfig, ddim_sample

    cfg = _tiny_style_cfg()
    pipe = CtrLoraPipeline(cfg)
    params = pipe.init(jax.random.PRNGKey(0), image_size=8)

    def bump(path, x):
        ks = jax.tree_util.keystr(path)
        if "to_k_ip" in ks or "to_v_ip" in ks:
            return jnp.ones_like(x) * 0.1
        if "kernel" in ks and any(s in ks for s in ("conv_out", "proj_out", "out_conv")):
            return jax.random.normal(jax.random.PRNGKey(5), x.shape) * 0.05
        return x

    params = params._replace(unet=jax.tree_util.tree_map_with_path(bump, params.unet))
    B = 1
    ctx, unc = jnp.ones((B, 16, 64)), jnp.zeros((B, 16, 64))
    conds = [Conditioning(jnp.ones((B, 8, 8, 4)) * 0.1, lora_idx=jnp.int32(0))]
    ip = jnp.ones((B, 2, 64)) * 0.5
    run = lambda u: ddim_sample(
        pipe, params, jax.random.PRNGKey(1), ctx, unc, conds, (B, 8, 8, 4),
        DDIMConfig(steps=2, guidance_scale=4.0), ip_context=ip,
        uncond_ip_context=u,
    )
    z_same = run(None)           # uncond half reuses cond ip
    z_same2 = run(ip)            # explicitly the same -> identical
    z_diff = run(jnp.zeros((B, 2, 64)))
    np.testing.assert_array_equal(np.asarray(z_same), np.asarray(z_same2))
    assert np.abs(np.asarray(z_same) - np.asarray(z_diff)).max() > 1e-6
