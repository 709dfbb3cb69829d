"""ControlNet-XS parity vs the reference TwoStreamControlNet."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_shim import install_shims, reference_available

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not reference_available(), reason="reference tree or torch unavailable"
)]

from ctrlora_tpu.configs import UNetConfig  # noqa: E402
from ctrlora_tpu.models.xs import XSUNet, xs_entries  # noqa: E402
from ctrlora_tpu.utils import ckpt_torch as bridge  # noqa: E402


BASE = UNetConfig(
    model_channels=32, num_res_blocks=1, attention_resolutions=(2,),
    channel_mult=(1, 2), num_heads=2, context_dim=48, dtype="float32",
    use_checkpoint=False, use_flash_attention=False,
)


def test_xs_parity():
    install_shims()
    import torch
    from cldm.cldm_xs import TwoStreamControlNet
    from ldm.modules.diffusionmodules.openaimodel import UNetModel

    torch.manual_seed(0)
    common = dict(
        image_size=32, in_channels=4, out_channels=4, model_channels=32,
        num_res_blocks=1, attention_resolutions=[2], channel_mult=[1, 2],
        num_heads=2, use_spatial_transformer=True, transformer_depth=1,
        context_dim=48, use_checkpoint=False, legacy=False,
    )
    ref = TwoStreamControlNet(
        hint_channels=3, infusion2control="cat", infusion2base="add",
        guiding="encoder_double", two_stream_mode="cross",
        control_model_ratio=0.5, learn_embedding=False, fixed=True, **common,
    ).eval()
    base = UNetModel(**common).eval()
    # randomize zero convs + hint block so parity is non-trivial
    with torch.no_grad():
        for n, p in ref.named_parameters():
            if "zero_convs" in n or "middle_block_out" in n or "input_hint" in n:
                p.copy_(torch.randn_like(p) * 0.2)

    sd = {f"base.{k}": v.numpy() for k, v in base.state_dict().items()}
    sd.update({k: v.numpy() for k, v in ref.state_dict().items()})

    entries = xs_entries(
        BASE, ratio=0.5, infusion2control="cat", guiding="encoder_double",
        learn_embedding=False, base_prefix="base.", ctrl_prefix="control_model.",
    )
    # base time_embed comes from the base model, not the (deleted) ctrl one
    tree, missing = bridge.convert_tree(sd, entries, strict=False)
    assert not [m for m in missing if not m.startswith("control_model.time_embed")], missing[:8]

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 16, 16), np.float32)
    hint = rng.standard_normal((1, 3, 128, 128), np.float32)
    t = np.array([321], np.int64)
    ctx = rng.standard_normal((1, 7, 48), np.float32)
    to_nhwc = lambda a: np.transpose(a, (0, 2, 3, 1))

    with torch.no_grad():
        out_ref = ref(
            x=torch.from_numpy(x), hint=torch.from_numpy(hint),
            timesteps=torch.from_numpy(t), context=torch.from_numpy(ctx),
            base_model=base,
        ).numpy()

    model = XSUNet(
        BASE, hint_channels=3, control_model_ratio=0.5,
        infusion2control="cat", guiding="encoder_double", learn_embedding=False,
    )
    out = model.apply(
        jax.tree_util.tree_map(jnp.asarray, tree),
        jnp.asarray(to_nhwc(x)), jnp.asarray(t), jnp.asarray(ctx),
        hint=jnp.asarray(to_nhwc(hint)),
    )
    np.testing.assert_allclose(
        to_nhwc(out_ref), np.asarray(out),
        atol=1e-5 * max(1.0, np.abs(out_ref).max()), rtol=2e-3,
    )

    # no-control path == plain base UNet
    with torch.no_grad():
        out_base = base(
            torch.from_numpy(x), timesteps=torch.from_numpy(t),
            context=torch.from_numpy(ctx),
        ).numpy()
    out_nc = model.apply(
        jax.tree_util.tree_map(jnp.asarray, tree),
        jnp.asarray(to_nhwc(x)), jnp.asarray(t), jnp.asarray(ctx),
        no_control=True,
    )
    np.testing.assert_allclose(
        to_nhwc(out_base), np.asarray(out_nc),
        atol=1e-5 * max(1.0, np.abs(out_base).max()), rtol=2e-3,
    )


def test_xs_pipeline_tiny():
    import dataclasses

    from ctrlora_tpu.configs import tiny_test_config
    from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline

    cfg = tiny_test_config(hint_mode="image")
    cfg = dataclasses.replace(
        cfg,
        control=dataclasses.replace(
            cfg.control, variant="xs", control_model_ratio=0.5
        ),
    )
    pipe = CtrLoraPipeline(cfg)
    params = pipe.init(jax.random.PRNGKey(0), image_size=8)
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.array([3])
    ctx = jnp.ones((1, 16, 64))
    hint = jnp.ones((1, 128, 128, 3)) * 0.5
    out = pipe.apply_model(params, x, t, ctx, [Conditioning(hint)])
    assert out.shape == (1, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()
    out_nc = pipe.apply_model(params, x, t, ctx, None)
    assert np.isfinite(np.asarray(out_nc)).all()


def test_xs_training_learns():
    """XS gradients must flow into the control stream (and only there)."""
    import dataclasses

    from ctrlora_tpu.configs import TrainConfig, tiny_test_config
    from ctrlora_tpu.pipeline import CtrLoraPipeline
    from ctrlora_tpu.training.step import make_train_step
    from ctrlora_tpu.training.train_state import create_train_state, trainable_mask

    cfg = tiny_test_config(hint_mode="image")
    cfg = dataclasses.replace(
        cfg, control=dataclasses.replace(cfg.control, variant="xs",
                                         control_model_ratio=0.5),
    )
    pipe = CtrLoraPipeline(cfg)
    params = pipe.init(jax.random.PRNGKey(0), image_size=8)
    tcfg = TrainConfig(learning_rate=1e-3, trainable="all", sd_locked=True)
    state, tx, mask = create_train_state(params, tcfg, xs=True)
    # mask: ctrl stream trainable, base frozen
    flat = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(mask.unet)
    }
    assert any(v for k, v in flat.items() if "ctrl_" in k)
    assert any(v for k, v in flat.items() if "enc_zero_" in k)
    assert not any(v for k, v in flat.items() if "['in_1_res']" in k)

    step = make_train_step(pipe, tx, tcfg, donate=False)
    batch = {
        "jpg": jnp.zeros((2, 32, 32, 3)),
        "hint": jnp.ones((2, 128, 128, 3)) * 0.5,
        "token_ids": jnp.ones((2, 16), jnp.int32),
    }
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert float(m["grad_norm"]) > 0  # gradients flow despite sd_locked
    # base stream unchanged, ctrl stream changed
    for (pth, old), new, mval in zip(
        jax.tree_util.tree_leaves_with_path(params.unet),
        jax.tree_util.tree_leaves(state.params.unet),
        jax.tree_util.tree_leaves(mask.unet),
    ):
        delta = float(np.abs(np.asarray(old) - np.asarray(new)).max())
        if not mval:
            assert delta == 0, jax.tree_util.keystr(pth)


def test_xs_full_guiding_parity():
    """guiding='full': the control stream has its own decoder with mutual
    infusion at every decoder layer but the last (cldm_xs.py:325-348)."""
    install_shims()
    import torch
    from cldm.cldm_xs import TwoStreamControlNet
    from ldm.modules.diffusionmodules.openaimodel import UNetModel

    torch.manual_seed(1)
    common = dict(
        image_size=32, in_channels=4, out_channels=4, model_channels=32,
        num_res_blocks=1, attention_resolutions=[2], channel_mult=[1, 2],
        num_heads=2, use_spatial_transformer=True, transformer_depth=1,
        context_dim=48, use_checkpoint=False, legacy=False,
    )
    ref = TwoStreamControlNet(
        hint_channels=3, infusion2control="cat", infusion2base="add",
        guiding="full", two_stream_mode="cross",
        control_model_ratio=0.5, learn_embedding=False, fixed=True, **common,
    ).eval()
    base = UNetModel(**common).eval()
    with torch.no_grad():
        for n, p in ref.named_parameters():
            if ("zero_convs" in n or "middle_block_out" in n
                    or "middle_block_in" in n or "input_hint" in n):
                p.copy_(torch.randn_like(p) * 0.2)

    sd = {f"base.{k}": v.numpy() for k, v in base.state_dict().items()}
    sd.update({k: v.numpy() for k, v in ref.state_dict().items()})

    entries = xs_entries(
        BASE, ratio=0.5, infusion2control="cat", guiding="full",
        learn_embedding=False, base_prefix="base.", ctrl_prefix="control_model.",
    )
    tree, missing = bridge.convert_tree(sd, entries, strict=False)
    assert not [m for m in missing if not m.startswith("control_model.time_embed")], missing[:8]

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 16, 16), np.float32)
    hint = rng.standard_normal((1, 3, 128, 128), np.float32)
    t = np.array([123], np.int64)
    ctx = rng.standard_normal((1, 7, 48), np.float32)
    to_nhwc = lambda a: np.transpose(a, (0, 2, 3, 1))

    with torch.no_grad():
        out_ref = ref(
            x=torch.from_numpy(x), hint=torch.from_numpy(hint),
            timesteps=torch.from_numpy(t), context=torch.from_numpy(ctx),
            base_model=base,
        ).numpy()

    model = XSUNet(
        BASE, hint_channels=3, control_model_ratio=0.5,
        infusion2control="cat", guiding="full", learn_embedding=False,
    )
    out = model.apply(
        jax.tree_util.tree_map(jnp.asarray, tree),
        jnp.asarray(to_nhwc(x)), jnp.asarray(t), jnp.asarray(ctx),
        hint=jnp.asarray(to_nhwc(hint)),
    )
    np.testing.assert_allclose(
        to_nhwc(out_ref), np.asarray(out),
        atol=1e-5 * max(1.0, np.abs(out_ref).max()), rtol=2e-3,
    )
