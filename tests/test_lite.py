"""ControlNet-Lite baseline parity vs the reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_shim import install_shims, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree or torch unavailable"
)

from ctrlora_tpu.configs import UNetConfig  # noqa: E402
from ctrlora_tpu.models.lite import ControlNetLite, lite_entries  # noqa: E402
from ctrlora_tpu.utils import ckpt_torch as bridge  # noqa: E402


MY_CFG = UNetConfig(
    model_channels=32, num_res_blocks=1, attention_resolutions=(2,),
    channel_mult=(1, 2), num_heads=2, context_dim=48, dtype="float32",
    use_checkpoint=False, use_flash_attention=False,
)


@pytest.mark.slow  # mid-weight parity: fast-lane budget (VERDICT r4 #7)
def test_lite_parity():
    install_shims()
    import torch
    from cldm.cldm_lite import ControlNetLite as RefLite, ControlledUnetModel

    torch.manual_seed(0)
    ref = RefLite(
        image_size=32, in_channels=4, model_channels=32, hint_channels=3,
        num_res_blocks=1, channel_mult=[1, 2],
    ).eval()
    with torch.no_grad():
        for n, p in ref.named_parameters():
            if "zero_convs" in n or "middle_block_out" in n or "input_hint" in n:
                p.copy_(torch.randn_like(p) * 0.2)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    entries = lite_entries(MY_CFG)
    mapped = {t for t, _, _ in entries}
    assert not set(sd) - mapped, f"unmapped: {sorted(set(sd) - mapped)[:6]}"
    tree, missing = bridge.convert_tree(sd, entries, strict=True)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 16, 16), np.float32)
    hint = rng.standard_normal((1, 3, 128, 128), np.float32)
    t = np.array([100], np.int64)
    ctx = rng.standard_normal((1, 7, 48), np.float32)
    to_nhwc = lambda a: np.transpose(a, (0, 2, 3, 1))

    with torch.no_grad():
        # reference returns reversed(outs); materialize in tap order
        control_ref = list(
            ref(
                x=torch.from_numpy(x), hint=torch.from_numpy(hint),
                timesteps=torch.from_numpy(t), context=torch.from_numpy(ctx),
            )
        )[::-1]

    control = ControlNetLite(MY_CFG).apply(
        jax.tree_util.tree_map(jnp.asarray, tree),
        jnp.asarray(to_nhwc(x)), jnp.asarray(t), jnp.asarray(ctx),
        hint=jnp.asarray(to_nhwc(hint)),
    )
    assert len(control) == len(control_ref)
    for a, b in zip(control_ref, control):
        an = to_nhwc(a.numpy())
        np.testing.assert_allclose(
            an, np.asarray(b), atol=1e-5 * max(1.0, np.abs(an).max()), rtol=2e-3
        )

    # encoder-side injection through the controlled UNet
    from ctrlora_tpu.models.unet import UNet

    ref_unet = ControlledUnetModel(
        image_size=32, in_channels=4, out_channels=4, model_channels=32,
        num_res_blocks=1, attention_resolutions=[2], channel_mult=[1, 2],
        num_heads=2, use_spatial_transformer=True, transformer_depth=1,
        context_dim=48, use_checkpoint=False, legacy=False,
    ).eval()
    utree, _ = bridge.convert_tree(
        {k: v.numpy() for k, v in ref_unet.state_dict().items()},
        bridge.unet_entries(MY_CFG),
    )
    with torch.no_grad():
        # lite UNet consumes control via pop() from a reversed list
        ctl_torch = [c.clone() for c in control_ref][::-1]
        out_ref = ref_unet(
            torch.from_numpy(x), timesteps=torch.from_numpy(t),
            context=torch.from_numpy(ctx), control=ctl_torch,
        ).numpy()
    out = UNet(MY_CFG).apply(
        jax.tree_util.tree_map(jnp.asarray, utree),
        jnp.asarray(to_nhwc(x)), jnp.asarray(t), jnp.asarray(ctx),
        control=control, control_mode="encoder",
    )
    np.testing.assert_allclose(
        to_nhwc(out_ref), np.asarray(out),
        atol=1e-5 * max(1.0, np.abs(out_ref).max()), rtol=2e-3,
    )
