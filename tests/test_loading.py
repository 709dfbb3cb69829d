"""Checkpoint composition tests: SD + BaseCN + LoRA slots -> Params."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctrlora_tpu.configs import tiny_test_config
from ctrlora_tpu.pipeline import CtrLoraPipeline
from ctrlora_tpu.utils import ckpt_torch as bridge
from ctrlora_tpu.utils.loading import load_ctrlora, check_key

torch = pytest.importorskip("torch")


def tiny_inference_cfg():
    import dataclasses

    cfg = tiny_test_config(n_loras=2, switchable_banks=True)
    return cfg


@pytest.fixture
def fake_ckpts(tmp_path):
    """Synthesize reference-format checkpoints from random flax trees."""
    cfg = tiny_inference_cfg()
    pipe = CtrLoraPipeline(cfg)
    params = pipe.init(jax.random.PRNGKey(7), image_size=8)
    rng = np.random.default_rng(0)
    rnd = lambda tree: jax.tree_util.tree_map(
        lambda x: rng.standard_normal(x.shape).astype(np.float32), tree
    )
    uparams, vparams, cparams = rnd(params.unet), rnd(params.vae), rnd(params.clip)

    sd = {}
    sd.update(
        {f"model.diffusion_model.{k}": torch.from_numpy(v) for k, v in
         bridge.export_tree(uparams, bridge.unet_entries(cfg.unet)).items()}
    )
    sd.update(
        {f"first_stage_model.{k}": torch.from_numpy(v) for k, v in
         bridge.export_tree(vparams, bridge.vae_entries(cfg.vae)).items()}
    )
    sd.update(
        {f"cond_stage_model.transformer.text_model.{k}": torch.from_numpy(v)
         for k, v in bridge.export_tree(cparams, bridge.clip_entries(cfg.clip)).items()}
    )
    sd_file = tmp_path / "sd.ckpt"
    torch.save({"state_dict": sd}, sd_file)

    # basecn: control branch base weights (random)
    ctrl = rnd(params.control)
    cn = {
        f"control_model.{k}": torch.from_numpy(v)
        for k, v in bridge.export_tree(
            ctrl, bridge.controlnet_entries(cfg.control)
        ).items()
    }
    cn_file = tmp_path / "basecn.ckpt"
    torch.save(cn, cn_file)

    # two lora ckpts, module-style keys + zero convs + norms
    lora_files = []
    lora_vals = []
    for slot in range(2):
        lsd = {}
        vals = {}
        for tpath, fpath in bridge.lora_site_entries(cfg.control):
            down = rng.standard_normal((4, _in_features(params.control, fpath))).astype(np.float32)
            up = rng.standard_normal((_out_features(params.control, fpath), 4)).astype(np.float32)
            lsd[f"control_model.{tpath}.lora_layer.down.weight"] = torch.from_numpy(down)
            lsd[f"control_model.{tpath}.lora_layer.up.weight"] = torch.from_numpy(up)
            vals[fpath] = (down, up)
        for tpath, fpath in bridge.zero_conv_site_entries(cfg.control):
            c = _bank_shape(params.control, fpath, "kernel")
            w = rng.standard_normal((c[-1], c[-2], 1, 1)).astype(np.float32)
            b = rng.standard_normal((c[-1],)).astype(np.float32)
            lsd[f"control_model.{tpath}.weight"] = torch.from_numpy(w)
            lsd[f"control_model.{tpath}.bias"] = torch.from_numpy(b)
        for tpath, fpath in bridge.norm_site_entries(cfg.control):
            c = _bank_shape(params.control, fpath, "scale")[-1]
            lsd[f"control_model.{tpath}.weight"] = torch.from_numpy(
                rng.standard_normal((c,)).astype(np.float32)
            )
            lsd[f"control_model.{tpath}.bias"] = torch.from_numpy(
                rng.standard_normal((c,)).astype(np.float32)
            )
        f = tmp_path / f"lora{slot}.ckpt"
        torch.save(lsd, f)
        lora_files.append(str(f))
        lora_vals.append(vals)
    return cfg, str(sd_file), str(cn_file), lora_files, lora_vals, uparams


def _node(tree, fpath):
    node = tree["params"]
    for p in fpath:
        node = node[p]
    return node


def _in_features(tree, fpath):
    return _node(tree, fpath)["kernel"].shape[0]


def _out_features(tree, fpath):
    return _node(tree, fpath)["kernel"].shape[1]


def _bank_shape(tree, fpath, name):
    return _node(tree, fpath)[name].shape


def test_check_key():
    assert check_key("control_model.time_embed.0.lora_layer.down.weight")
    assert check_key("control_model.zero_convs.0.0.weight")
    assert check_key("control_model.middle_block_out.0.bias")
    assert check_key("control_model.input_blocks.1.1.norm.weight")
    assert not check_key("control_model.time_embed.0.weight")


def test_three_stage_load(fake_ckpts):
    cfg, sd_file, cn_file, lora_files, lora_vals, uparams = fake_ckpts
    pipe = CtrLoraPipeline(cfg)
    params = load_ctrlora(pipe, sd_file, cn_file, lora_files)

    # SD weights landed in the unet tree
    got = np.asarray(params.unet["params"]["time_embed"]["dense0"]["kernel"])
    want = np.asarray(uparams["params"]["time_embed"]["dense0"]["kernel"])
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # lora banks: slot s carries ckpt s's values (transposed)
    sites = bridge.lora_site_entries(cfg.control)
    tpath, fpath = sites[0]
    node = _node(params.control, fpath)
    for slot in range(2):
        down_ck, up_ck = lora_vals[slot][fpath]
        np.testing.assert_allclose(
            np.asarray(node["lora_down"][slot]), down_ck.T, rtol=1e-6
        )
        np.testing.assert_allclose(np.asarray(node["lora_up"][slot]), up_ck.T, rtol=1e-6)

    # switchable banks differ between slots (distinct random ckpts)
    zk = _node(params.control, ("zero_mid",))["kernel"]
    assert zk.shape[0] == 2
    assert np.abs(np.asarray(zk[0]) - np.asarray(zk[1])).max() > 0

    # and the model runs with the composed params
    import jax.numpy as jnp

    hint = jnp.ones((1, 16, 16, 4))
    t = jnp.array([5])
    ctx = jnp.ones((1, 16, 64))
    taps = pipe.control.apply(params.control, hint, t, ctx, lora_idx=jnp.int32(1))
    assert np.isfinite(np.asarray(taps[0])).all()


def test_lora_file_without_lora_keys_raises(fake_ckpts, tmp_path):
    cfg, sd_file, cn_file, lora_files, _, _ = fake_ckpts
    bogus = tmp_path / "bogus.ckpt"
    torch.save({"control_model.time_embed.0.weight": torch.zeros(1)}, bogus)
    pipe = CtrLoraPipeline(cfg)
    with pytest.raises(ValueError, match="no LoRA keys"):
        load_ctrlora(pipe, None, None, [str(bogus), lora_files[1]])
