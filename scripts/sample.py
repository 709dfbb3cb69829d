#!/usr/bin/env python
"""Batch sampling over a dataset (reference: scripts/sample.py).

Writes sample/ control/ img/ directories plus prompt.txt, sampling each
dataset item with DDIM + CFG. Works with finetune checkpoints (orbax dir or
torch .ckpt via --lora_ckpt) on top of SD + Base ControlNet.

  python scripts/sample.py --dataroot data/mycond --sd_ckpt ... --cn_ckpt ... \
      --lora_ckpt runs/mycond/ckpt_00001000 --save_dir out --n_samples 4
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ctrlora_tpu.utils.platform import ensure_platform_from_env

ensure_platform_from_env()

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", type=str, required=True)
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--sd_ckpt", type=str, default=None)
    p.add_argument("--cn_ckpt", type=str, default=None)
    p.add_argument("--lora_ckpt", type=str, default=None)
    p.add_argument("--config", type=str, default=None,
                   help="preset name or YAML (default: ctrlora_finetune)")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--lora_rank", type=int, default=128)
    p.add_argument("--n_samples", type=int, default=-1, help="-1 = all")
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--sampler", type=str, default="ddim",
                   choices=["ddim", "plms", "dpm_solver"])
    p.add_argument("--dpm_order", type=int, default=2, choices=[1, 2, 3])
    p.add_argument("--dpm_method", type=str, default="multistep",
                   choices=["multistep", "singlestep"])
    p.add_argument("--dpm_algorithm", type=str, default="dpmsolver++",
                   choices=["dpmsolver++", "dpmsolver"])
    p.add_argument("--dpm_thresholding", action="store_true",
                   help="dynamic thresholding (dpmsolver++ only)")
    p.add_argument("--scale", type=float, default=7.5)
    p.add_argument("--strength", type=float, default=1.0)
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--bs", type=int, default=4)
    p.add_argument("--dp", action="store_true",
                   help="data-parallel sampling over all devices (batch "
                        "sharded on a 1-D mesh; --bs must divide evenly)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel size: sample over a (data, model) "
                        "mesh, attention heads / GEGLU hidden sharded N-way "
                        "(latency path for small batches; must divide the "
                        "device count, --bs must divide devices/tp)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ctrlora_tpu.configs import ctrlora_finetune_config
    from ctrlora_tpu.data.datasets import CustomDataset
    from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline
    from ctrlora_tpu.sampling.ddim import DDIMConfig, ddim_sample
    from ctrlora_tpu.sampling.dpm_solver import (
        dpm_solver_sample, dpm_solver_singlestep_sample,
    )
    from ctrlora_tpu.sampling.plms import plms_sample
    from ctrlora_tpu.utils.loading import load_ctrlora, load_lora_slot_into
    from ctrlora_tpu.utils import ckpt_torch as bridge
    from ctrlora_tpu.utils.tokenizer import default_tokenizer

    if args.config:
        from ctrlora_tpu.configs import load_model_config

        cfg = load_model_config(args.config)
    else:
        cfg = ctrlora_finetune_config(lora_rank=args.lora_rank)
    pipe = CtrLoraPipeline(cfg)
    params = load_ctrlora(
        pipe, args.sd_ckpt, args.cn_ckpt, basecn_skip="lora", seed=args.seed
    )
    if args.lora_ckpt:
        if os.path.isdir(args.lora_ckpt):  # orbax TrainState dir
            from ctrlora_tpu.training.train_state import create_train_state
            from ctrlora_tpu.training.trainer import restore_train_state
            from ctrlora_tpu.configs import TrainConfig

            state, _, _ = create_train_state(params, TrainConfig(trainable="lora"))
            state = restore_train_state(args.lora_ckpt, state)
            params = state.params
        else:  # torch-format lora ckpt
            np_params = {
                "unet": bridge.tree_to_mutable(params.unet),
                "control": bridge.tree_to_mutable(params.control),
                "vae": bridge.tree_to_mutable(params.vae),
                "clip": bridge.tree_to_mutable(params.clip),
            }
            n = load_lora_slot_into(
                pipe, np_params, bridge.load_torch_state_dict(args.lora_ckpt), 0
            )
            assert n > 0, f"no LoRA keys in {args.lora_ckpt}"
            from ctrlora_tpu.pipeline import Params

            params = Params(
                *(jax.tree_util.tree_map(jnp.asarray, np_params[k])
                  for k in ("unet", "control", "vae", "clip"))
            )

    ds = CustomDataset(args.dataroot, drop_rate=0.0, resolution=args.resolution)
    n = len(ds) if args.n_samples < 0 else min(args.n_samples, len(ds))
    for sub in ("sample", "control", "img"):
        os.makedirs(os.path.join(args.save_dir, sub), exist_ok=True)

    tok = default_tokenizer()
    ddim = DDIMConfig(steps=args.ddim_steps, guidance_scale=args.scale, eta=args.eta)
    control_scales = None
    f = 2 ** (len(cfg.vae.ch_mult) - 1)

    mesh = None
    wrap_jit = None
    if args.tp > 1:
        from ctrlora_tpu.parallel.tp import create_mesh_2d, tp_sample_jit

        ndev = jax.device_count()
        assert ndev % args.tp == 0, (
            f"--tp {args.tp} must divide the {ndev} devices"
        )
        dp_size = ndev // args.tp
        assert args.bs % dp_size == 0, (
            f"--bs {args.bs} must be a multiple of dp={dp_size} "
            f"({ndev} devices / tp {args.tp})"
        )
        mesh = create_mesh_2d(dp_size, args.tp)
        wrap_jit = tp_sample_jit
        print(f"tensor-parallel sampling: {dp_size}x{args.tp} mesh", flush=True)
    elif args.dp:
        from ctrlora_tpu.parallel.mesh import create_mesh, dp_sample_jit

        mesh = create_mesh()
        ndev = mesh.devices.size
        assert args.bs % ndev == 0, (
            f"--bs {args.bs} must be a multiple of the {ndev} devices"
        )
        wrap_jit = dp_sample_jit
        print(f"data-parallel sampling over {ndev} devices", flush=True)

    sample_jit = None
    prompts = []
    rng0 = np.random.default_rng(args.seed)
    for start in range(0, n, args.bs):
        idxs = list(range(start, min(start + args.bs, n)))
        items = [ds.get(i, rng0) for i in idxs]
        # pad the short final batch to a full one: keeps a single compiled
        # shape and keeps the batch divisible across the mesh under --dp
        padded = items + [items[-1]] * (args.bs - len(items))
        hint = jnp.asarray(np.stack([it["hint"] for it in padded]))
        ids = jnp.asarray(tok([it["txt"] for it in padded]))
        nids = jnp.asarray(tok([""] * len(padded)))
        B, H, W = hint.shape[0], hint.shape[1], hint.shape[2]

        if sample_jit is None:
            taps = pipe.n_control_taps
            scales = jnp.full((taps,), args.strength, jnp.float32)

            def sample_fn(params, hint, ids, nids, rng):
                ctx, unc = pipe.encode_text_cond_uncond(params, ids, nids)
                hz = pipe.encode_first_stage(params, hint)
                import functools

                dpm_fn = (
                    dpm_solver_singlestep_sample
                    if args.dpm_method == "singlestep"
                    else dpm_solver_sample
                )
                sampler_fn = {
                    "ddim": ddim_sample,
                    "plms": plms_sample,
                    "dpm_solver": functools.partial(
                        dpm_fn, order=args.dpm_order,
                        algorithm=args.dpm_algorithm,
                        thresholding=args.dpm_thresholding,
                    ),
                }[args.sampler]
                z = sampler_fn(
                    pipe, params, rng, ctx, unc,
                    [Conditioning(hz, lora_idx=jnp.int32(0))],
                    (hint.shape[0], H // f, W // f, 4), ddim,
                    control_scales=scales,
                )
                img = pipe.decode_first_stage(params, z)
                return jnp.clip(img * 127.5 + 127.5, 0, 255).astype(jnp.uint8)

            sample_jit = (
                wrap_jit(sample_fn, mesh) if mesh is not None
                else jax.jit(sample_fn)
            )

        out = np.asarray(sample_jit(params, hint, ids, nids, jax.random.PRNGKey(args.seed + start)))
        for j, i in enumerate(idxs):
            Image.fromarray(out[j]).save(f"{args.save_dir}/sample/{i:06d}.png")
            Image.fromarray((np.asarray(hint[j]) * 255).astype(np.uint8)).save(
                f"{args.save_dir}/control/{i:06d}.png"
            )
            Image.fromarray(
                ((items[j]["jpg"] + 1) * 127.5).clip(0, 255).astype(np.uint8)
            ).save(f"{args.save_dir}/img/{i:06d}.png")
            prompts.append(f"{i:06d}: {items[j]['txt']}")
        print(f"sampled {min(start + args.bs, n)}/{n}", flush=True)

    with open(os.path.join(args.save_dir, "prompt.txt"), "w") as fp:
        fp.write("\n".join(prompts) + "\n")


if __name__ == "__main__":
    main()
