"""End-to-end CLI tests: train -> checkpoint -> sample -> evaluate with the
tiny preset on CPU, driven through the real script entry points."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, **kw):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable] + cmd, cwd=REPO, env=env, capture_output=True, text=True,
        timeout=540, **kw,
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
        "--n_samples", "2", "--ddim_steps", "2", "--bs", "2",
    ])
    assert os.path.isfile(os.path.join(out_dir, "sample", "000000.png"))
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
