"""Config system: presets, YAML round trips, reference-named config files."""

import dataclasses
import os

import pytest
import yaml

from ctrlora_tpu import configs as C

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_presets_exist():
    for name in ("cldm_v15", "cnlite_sd15", "cnxs_sd15", "ctrlora_pretrain",
                 "ctrlora_finetune", "ctrlora_inference", "tiny"):
        cfg = C.load_model_config(name)
        assert isinstance(cfg, C.ModelConfig)


@pytest.mark.parametrize("fname,check", [
    ("configs/cldm_v15.yaml", lambda c: c.control.hint_mode == "image"),
    ("configs/cnxs_sd15.yaml", lambda c: c.control.variant == "xs"
     and c.control.control_model_ratio == 0.2),
    ("configs/ctrlora_pretrain_sd15_9tasks_rank128.yaml",
     lambda c: c.control.lora.n_loras == 9 and c.control.lora.rank == 128
     and len(c.tasks) == 9),
    ("configs/ctrlora_finetune_sd15_rank512.yaml",
     lambda c: c.control.lora.rank == 512 and c.control.lora.n_loras == 1),
    ("configs/ctrlora_finetune_sd15_full.yaml",
     lambda c: c.control.lora.n_loras == 0),
    ("configs/inference/ctrlora_sd15_rank128_2loras.yaml",
     lambda c: c.control.lora.n_loras == 2 and c.control.lora.switchable_banks),
    ("configs/inference/ctrlora_style_sd15_rank128_1lora.yaml",
     lambda c: c.unet.ip_tokens == 4),
])
def test_reference_named_configs(fname, check):
    cfg = C.load_model_config(os.path.join(REPO, fname))
    assert check(cfg), fname


def test_yaml_round_trip(tmp_path):
    cfg = C.ctrlora_pretrain_config(tasks=("canny", "hed"), lora_rank=64)
    path = tmp_path / "cfg.yaml"
    C.save_model_config(cfg, str(path))
    loaded = C.load_model_config(str(path))
    assert loaded == cfg


def test_preset_with_override(tmp_path):
    path = tmp_path / "o.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(
            {"preset": "ctrlora_finetune",
             "model": {"control": {"lora": {"rank": 7}}}}, f,
        )
    cfg = C.load_model_config(str(path))
    assert cfg.control.lora.rank == 7
    assert cfg.control.hint_mode == "latent"  # preset preserved
