"""End-to-end CLI tests: train -> checkpoint -> sample -> evaluate with the
tiny preset on CPU, driven through the real script entry points."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, timeout=540, **kw):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable] + cmd, cwd=REPO, env=env, capture_output=True, text=True,
        timeout=timeout, **kw,
    )
    assert r.returncode == 0, f"cmd failed:\nSTDOUT:{r.stdout[-3000:]}\nSTDERR:{r.stderr[-3000:]}"
    return r


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("ds")
    (root / "source").mkdir()
    (root / "target").mkdir()
    rng = np.random.default_rng(0)
    with open(root / "prompt.json", "w") as f:
        for i in range(4):
            cv2.imwrite(str(root / "source" / f"{i}.png"),
                        rng.integers(0, 255, (32, 32, 3), np.uint8))
            cv2.imwrite(str(root / "target" / f"{i}.png"),
                        rng.integers(0, 255, (32, 32, 3), np.uint8))
            f.write(json.dumps({
                "source": f"source/{i}.png", "target": f"target/{i}.png",
                "prompt": f"tiny image {i}",
            }) + "\n")
    return str(root)


@pytest.mark.slow
def test_train_sample_evaluate_cycle(dataset_dir, tmp_path):
    workdir = str(tmp_path / "run")
    # 1. train 4 steps on the tiny preset
    run([
        "scripts/train_ctrlora_finetune.py", "--config", "tiny",
        "--dataroot", dataset_dir, "--resolution", "32",
        "--bs", "2", "--max_steps", "4", "--lr", "1e-4",
        "--ckpt_logger_freq", "4", "--img_logger_freq", "1000",
        "--name", os.path.relpath(workdir, os.path.join(REPO, "runs")),
        "--num_workers", "2",
    ])
    # trainer wrote metrics and a checkpoint
    runs = os.path.join(REPO, "runs")
    rundir = workdir if os.path.isdir(workdir) else None
    if rundir is None:  # name was made relative to runs/
        cand = [os.path.join(runs, d) for d in os.listdir(runs)]
        rundir = max(cand, key=os.path.getmtime)
    metrics = open(os.path.join(rundir, "metrics.jsonl")).read()
    assert '"event": "init"' in metrics
    ckpts = [d for d in os.listdir(rundir) if d.startswith("ckpt_")]
    assert ckpts, f"no checkpoint written in {rundir}: {os.listdir(rundir)}"
    ckpt = os.path.join(rundir, sorted(ckpts)[-1])

    # 2. sample from the checkpoint
    out_dir = str(tmp_path / "samples")
    run([
        "scripts/sample.py", "--config", "tiny", "--dataroot", dataset_dir,
        "--resolution", "32", "--save_dir", out_dir, "--lora_ckpt", ckpt,
        "--n_samples", "3", "--ddim_steps", "2", "--bs", "2",
    ])
    # 3 samples at bs=2 exercises the padded short final batch
    assert os.path.isfile(os.path.join(out_dir, "sample", "000000.png"))
    assert os.path.isfile(os.path.join(out_dir, "sample", "000002.png"))
    assert not os.path.exists(os.path.join(out_dir, "sample", "000003.png"))
    assert os.path.isfile(os.path.join(out_dir, "prompt.txt"))

    # 3. evaluate condition fidelity
    r = run(["scripts/evaluate_control.py", "--sample_dir", out_dir,
             "--detector", "palette"])
    assert "MSE:" in r.stdout and "SSIM:" in r.stdout


@pytest.mark.slow
def test_tool_make_control_init_and_combine(tmp_path):
    torch = pytest.importorskip("torch")
    # synthesize a tiny "SD checkpoint" for the tiny preset
    import jax

    sys.path.insert(0, REPO)
    from ctrlora_tpu.configs import tiny_test_config
    from ctrlora_tpu.pipeline import CtrLoraPipeline
    from ctrlora_tpu.utils import ckpt_torch as bridge

    cfg = tiny_test_config()
    pipe = CtrLoraPipeline(cfg)
    params = pipe.init(jax.random.PRNGKey(0), image_size=8)
    sd = {
        f"model.diffusion_model.{k}": torch.from_numpy(v)
        for k, v in bridge.export_tree(
            params.unet, bridge.unet_entries(cfg.unet)
        ).items()
    }
    sd_file = tmp_path / "sd_tiny.ckpt"
    torch.save({"state_dict": sd}, sd_file)

    # (full-size script path uses the SD15 config; here we exercise the
    # library function directly at tiny size)
    src, _ = bridge.convert_tree(
        {k: v.numpy() for k, v in sd.items()},
        bridge.unet_entries(cfg.unet, decoder=False),
        prefix="model.diffusion_model.", strict=True,
    )
    out = bridge.export_tree(src, bridge.controlnet_entries(cfg.control),
                             prefix="control_model.")
    assert any(k.startswith("control_model.input_blocks") for k in out)

    # combine tool is format-agnostic: run the real CLI
    lora_file = tmp_path / "lora.ckpt"
    torch.save({"control_model.x.lora_layer.down.weight": torch.zeros(2, 2)}, lora_file)
    base_file = tmp_path / "base.ckpt"
    torch.save({"control_model.time_embed.0.weight": torch.zeros(4, 4)}, base_file)
    out_file = tmp_path / "combined.ckpt"
    run([
        "scripts/tool_combine_weights.py", "--sd_ckpt", str(sd_file),
        "--base_ckpt", str(base_file), "--lora_ckpt", str(lora_file),
        "--save_path", str(out_file),
    ])
    combined = torch.load(out_file, weights_only=False)
    assert "logvar" in combined and combined["logvar"].shape == (1000,)
    assert "control_model.x.lora_layer.down.weight" in combined


@pytest.fixture(scope="module")
def multigen_dir(tmp_path_factory):
    """Tiny 2-task MultiGen-20M-format tree: json_files/ + meta with
    images/ and conditions/ (reference layout: datasets/multigen20m.py)."""
    import cv2

    root = tmp_path_factory.mktemp("mg")
    (root / "json_files").mkdir()
    (root / "images").mkdir()
    (root / "conditions").mkdir()
    rng = np.random.default_rng(1)
    for task in ("hed", "canny"):
        with open(root / "json_files" / f"aesthetics_plus_all_group_{task}_all.json", "w") as f:
            for i in range(4):
                img = f"{task}_{i}.jpg"
                cond = f"{task}_{i}_cond.jpg"
                cv2.imwrite(str(root / "images" / img),
                            rng.integers(0, 255, (40, 48, 3), np.uint8))
                cv2.imwrite(str(root / "conditions" / cond),
                            rng.integers(0, 255, (40, 48, 3), np.uint8))
                f.write(json.dumps({
                    "source": f"./{img}", f"control_{task}": cond,
                    "prompt": f"a {task} image {i}",
                }) + "\n")
    return str(root)


@pytest.mark.slow
def test_pretrain_extract_sample_cycle(multigen_dir, dataset_dir, tmp_path):
    """Mirrors the reference pretrain->deploy flow: multi-task stacked-LoRA
    pretraining (scripts/train_ctrlora_pretrain.py:50-108), per-task LoRA
    extraction (tool_extract_weights.py:55-66), then sampling with one
    extracted LoRA."""
    # the YAML deliberately carries STALE task names at a matching n_loras:
    # --tasks is the slot->task source of truth and must override them even
    # when no n_loras resize happens (regression: extraction previously
    # wrote the depth-trained LoRA under the YAML's leftover name)
    cfg_yaml = str(tmp_path / "tiny_pretrain.yaml")
    with open(cfg_yaml, "w") as f:
        f.write(
            "preset: tiny\n"
            "model:\n"
            "  control:\n"
            "    lora: {n_loras: 2}\n"
            "  tasks: [depth, seg]\n"
        )

    workdir = str(tmp_path / "run")
    run([
        "scripts/train_ctrlora_pretrain.py", "--config", cfg_yaml,
        "--json_dir", os.path.join(multigen_dir, "json_files"),
        "--meta_dir", multigen_dir, "--tasks", "hed", "canny",
        "--resolution", "32", "--bs", "2", "--max_steps", "4",
        "--lr", "1e-4", "--ckpt_logger_freq", "4", "--img_logger_freq", "1000",
        "--name", os.path.relpath(workdir, os.path.join(REPO, "runs")),
        "--num_workers", "2",
    ], timeout=1200)
    runs = os.path.join(REPO, "runs")
    rundir = workdir if os.path.isdir(workdir) else max(
        (os.path.join(runs, d) for d in os.listdir(runs)), key=os.path.getmtime
    )
    ckpts = [d for d in os.listdir(rundir) if d.startswith("ckpt_")]
    assert ckpts, f"no checkpoint in {rundir}: {os.listdir(rundir)}"
    ckpt = os.path.join(rundir, sorted(ckpts)[-1])

    # per-task LoRA extraction from the base (--from_base)
    lora_dir = str(tmp_path / "loras")
    run([
        "scripts/tool_extract_weights.py", "-t", "lora", "--from_base",
        "--ckpt", ckpt, "--save_path", lora_dir, "--config", cfg_yaml,
        "--tasks", "hed", "canny",
    ])
    assert sorted(os.listdir(lora_dir)) == ["canny.ckpt", "hed.ckpt"]

    # sample with the extracted hed LoRA in slot 0 of a 1-LoRA model
    sample_yaml = str(tmp_path / "tiny_1lora.yaml")
    with open(sample_yaml, "w") as f:
        f.write("preset: tiny\nmodel:\n  control:\n    lora: {n_loras: 1}\n")
    out_dir = str(tmp_path / "samples")
    run([
        "scripts/sample.py", "--config", sample_yaml, "--dataroot", dataset_dir,
        "--resolution", "32", "--save_dir", out_dir,
        "--lora_ckpt", os.path.join(lora_dir, "hed.ckpt"),
        "--n_samples", "2", "--ddim_steps", "2", "--bs", "2",
    ])
    assert os.path.isfile(os.path.join(out_dir, "sample", "000000.png"))
