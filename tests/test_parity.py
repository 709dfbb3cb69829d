"""Numerical parity vs the reference torch implementation (random weights).

Instantiates the reference modules on CPU with tiny configs, bridges their
state dicts through utils.ckpt_torch, and compares forward passes. This
validates both the checkpoint key mapping and the model math end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_shim import install_shims, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree or torch unavailable"
)

from ctrlora_tpu.configs import (  # noqa: E402
    CLIPTextConfig, ControlNetConfig, LoRAConfig, UNetConfig, VAEConfig,
)
from ctrlora_tpu.utils import ckpt_torch as bridge  # noqa: E402


TINY_UNET = dict(
    image_size=32, in_channels=4, out_channels=4, model_channels=32,
    num_res_blocks=1, attention_resolutions=[2], channel_mult=[1, 2],
    num_heads=2, use_spatial_transformer=True, transformer_depth=1,
    context_dim=48, use_checkpoint=False, legacy=False,
)

MY_UNET = UNetConfig(
    model_channels=32, num_res_blocks=1, attention_resolutions=(2,),
    channel_mult=(1, 2), num_heads=2, context_dim=48, dtype="float32",
    use_checkpoint=False, use_flash_attention=False,
)


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_unet_forward_parity():
    install_shims()
    import torch
    from ldm.modules.diffusionmodules.openaimodel import UNetModel

    torch.manual_seed(0)
    ref = UNetModel(**TINY_UNET).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    entries = bridge.unet_entries(MY_UNET)
    tree, missing = bridge.convert_tree(sd, entries, strict=True)
    # every torch param must be consumed by the mapping
    mapped = {t for t, _, _ in entries}
    unmapped = set(sd) - mapped
    assert not unmapped, f"unmapped torch keys: {sorted(unmapped)[:8]}"

    from ctrlora_tpu.models.unet import UNet

    x = np.random.default_rng(0).standard_normal((2, 4, 16, 16), np.float32)
    t = np.array([3, 977], np.int64)
    ctx = np.random.default_rng(1).standard_normal((2, 7, 48), np.float32)

    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(x), timesteps=torch.from_numpy(t),
            context=torch.from_numpy(ctx),
        ).numpy()

    out = UNet(MY_UNET).apply(
        jax.tree_util.tree_map(jnp.asarray, tree),
        jnp.asarray(to_nhwc(x)), jnp.asarray(t), jnp.asarray(ctx),
    )
    np.testing.assert_allclose(
        to_nhwc(out_ref), np.asarray(out), atol=2e-4, rtol=2e-3
    )


def test_controlled_unet_and_controlnet_parity():
    install_shims()
    import torch
    from cldm.cldm import ControlledUnetModel, ControlNet as RefControlNet

    torch.manual_seed(1)
    ref_unet = ControlledUnetModel(**TINY_UNET).eval()
    cn_kwargs = {k: v for k, v in TINY_UNET.items() if k != "out_channels"}
    ref_cn = RefControlNet(hint_channels=3, **cn_kwargs).eval()
    # zero convs are zero at init; randomize so parity is non-trivial
    with torch.no_grad():
        for n, p in ref_cn.named_parameters():
            if "zero_convs" in n or "middle_block_out" in n or "input_hint" in n:
                p.copy_(torch.randn_like(p) * 0.2)

    my_cfg = ControlNetConfig(unet=MY_UNET, hint_mode="image", lora=LoRAConfig(0))
    tree, _ = bridge.convert_tree(
        {k: v.numpy() for k, v in ref_cn.state_dict().items()},
        bridge.controlnet_entries(my_cfg),
    )
    utree, _ = bridge.convert_tree(
        {k: v.numpy() for k, v in ref_unet.state_dict().items()},
        bridge.unet_entries(MY_UNET),
    )

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 4, 16, 16), np.float32)
    hint = rng.standard_normal((1, 3, 128, 128), np.float32)
    t = np.array([500], np.int64)
    ctx = rng.standard_normal((1, 7, 48), np.float32)

    with torch.no_grad():
        control_ref = ref_cn(
            x=torch.from_numpy(x), hint=torch.from_numpy(hint),
            timesteps=torch.from_numpy(t), context=torch.from_numpy(ctx),
        )
        out_ref = ref_unet(
            torch.from_numpy(x), timesteps=torch.from_numpy(t),
            context=torch.from_numpy(ctx), control=[c.clone() for c in control_ref],
        ).numpy()

    from ctrlora_tpu.models.unet import ControlNet, UNet

    control = ControlNet(my_cfg).apply(
        jax.tree_util.tree_map(jnp.asarray, tree),
        jnp.asarray(to_nhwc(x)), jnp.asarray(t), jnp.asarray(ctx),
        hint=jnp.asarray(to_nhwc(hint)),
    )
    for c_ref, c in zip(control_ref, control):
        a = to_nhwc(c_ref.numpy())
        # residual magnitudes reach ~6e3 here; tolerance is relative fp32 noise
        np.testing.assert_allclose(a, np.asarray(c), atol=1e-5 * max(1.0, np.abs(a).max()), rtol=2e-3)
    out = UNet(MY_UNET).apply(
        jax.tree_util.tree_map(jnp.asarray, utree),
        jnp.asarray(to_nhwc(x)), jnp.asarray(t), jnp.asarray(ctx),
        control=control,
    )
    np.testing.assert_allclose(
        to_nhwc(out_ref), np.asarray(out),
        atol=1e-5 * max(1.0, np.abs(out_ref).max()), rtol=2e-3,
    )


def test_vae_parity():
    install_shims()
    import torch
    from ldm.modules.diffusionmodules.model import Encoder, Decoder

    ddconfig = dict(
        double_z=True, z_channels=4, resolution=64, in_channels=3, out_ch=3,
        ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[], dropout=0.0,
    )
    torch.manual_seed(2)
    enc = Encoder(**ddconfig).eval()
    dec = Decoder(**ddconfig).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    post = torch.nn.Conv2d(4, 4, 1)

    sd = {f"encoder.{k}": v.numpy() for k, v in enc.state_dict().items()}
    sd.update({f"decoder.{k}": v.numpy() for k, v in dec.state_dict().items()})
    sd.update({f"quant_conv.{k}": v.numpy() for k, v in quant.state_dict().items()})
    sd.update({f"post_quant_conv.{k}": v.numpy() for k, v in post.state_dict().items()})

    my_cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, dtype="float32")
    tree, _ = bridge.convert_tree(sd, bridge.vae_entries(my_cfg))
    mapped = {t for t, _, _ in bridge.vae_entries(my_cfg)}
    assert not set(sd) - mapped, f"unmapped: {sorted(set(sd) - mapped)[:8]}"

    from ctrlora_tpu.models.vae import AutoencoderKL

    rng = np.random.default_rng(3)
    img = rng.standard_normal((1, 3, 64, 64), np.float32)
    with torch.no_grad():
        moments_ref = quant(enc(torch.from_numpy(img)))
        mean_ref, _ = torch.chunk(moments_ref, 2, dim=1)
        rec_ref = dec(post(mean_ref)).numpy()

    vae = AutoencoderKL(my_cfg)
    jtree = jax.tree_util.tree_map(jnp.asarray, tree)
    mean, logvar = vae.apply(jtree, jnp.asarray(to_nhwc(img)), method=AutoencoderKL.encode)
    np.testing.assert_allclose(
        to_nhwc(mean_ref.numpy()), np.asarray(mean), atol=2e-4, rtol=2e-3
    )
    rec = vae.apply(jtree, mean, method=AutoencoderKL.decode)
    np.testing.assert_allclose(to_nhwc(rec_ref), np.asarray(rec), atol=3e-4, rtol=2e-3)


def test_clip_parity():
    install_shims()
    import torch
    import transformers

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=16,
    )
    torch.manual_seed(3)
    ref = transformers.CLIPTextModel(hf_cfg).eval()

    my_cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, max_length=16,
    )
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    tree, _ = bridge.convert_tree(sd, bridge.clip_entries(my_cfg), prefix="text_model.")

    from ctrlora_tpu.models.clip import CLIPTextModel

    ids = np.array([[49 % 100, 3, 7, 99] + [0] * 12], np.int64)
    with torch.no_grad():
        out_ref = ref(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    out = CLIPTextModel(my_cfg).apply(
        jax.tree_util.tree_map(jnp.asarray, tree), jnp.asarray(ids, jnp.int32)
    )
    np.testing.assert_allclose(out_ref, np.asarray(out), atol=2e-4, rtol=2e-3)


def test_clip_projected_parity():
    """layer='projected' vs HF CLIPTextModelWithProjection (the style app's
    negative-content text tower, gradio_ctrlora_style_transfer.py:395-403)."""
    install_shims()
    import torch
    import transformers

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=16,
        projection_dim=24, hidden_act="gelu", eos_token_id=99,
    )
    torch.manual_seed(4)
    ref = transformers.CLIPTextModelWithProjection(hf_cfg).eval()

    my_cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, max_length=16,
        layer="projected", projection_dim=24, hidden_act="gelu",
    )
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    tree, _ = bridge.convert_tree(
        sd, bridge.clip_entries(my_cfg), prefix="text_model.", strict=False
    )
    tree["params"]["text_projection"] = {
        "kernel": sd["text_projection.weight"].T.astype(np.float32)
    }

    from ctrlora_tpu.models.clip import CLIPTextModel

    # EOT (id 99, the vocab max) mid-sequence so pooling position is nontrivial
    ids = np.array([[5, 3, 7, 99, 0, 0], [12, 99, 0, 0, 0, 0]], np.int64)
    ids = np.pad(ids, ((0, 0), (0, 10)))
    with torch.no_grad():
        out_ref = ref(input_ids=torch.from_numpy(ids)).text_embeds.numpy()
    out = CLIPTextModel(my_cfg).apply(
        jax.tree_util.tree_map(jnp.asarray, tree), jnp.asarray(ids, jnp.int32)
    )
    np.testing.assert_allclose(out_ref, np.asarray(out), atol=2e-4, rtol=2e-3)
