"""Headline benchmark: 512x512 DDIM-50 batch-4 controlled sampling on TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline: an A100 running the reference (torch, xformers) at this workload
manages ~0.5 img/s (50 steps x 2 CFG model evals of UNet+ControlNet+LoRA at
batch 4, plus per-step hint re-encode). vs_baseline is measured/0.5 — the
north-star target is vs_baseline >= 2.

Flags: --tiny runs the CPU-sized model (CI smoke), --steps/--batch/--size
override the workload, --train benches the rank-128 finetune step instead.
"""

from __future__ import annotations

import argparse
import json
import time

from ctrlora_tpu.utils.platform import ensure_platform_from_env

ensure_platform_from_env()

import jax
import jax.numpy as jnp

from ctrlora_tpu.configs import (
    TrainConfig, ctrlora_inference_config, ctrlora_finetune_config, tiny_test_config,
)
from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline
from ctrlora_tpu.sampling.ddim import DDIMConfig, ddim_sample

A100_BASELINE_IMG_PER_SEC = 0.5
A100_BASELINE_FT_STEPS_PER_SEC = 3.0  # bs-1 rank-128 finetune, reference claims <1h/1k imgs incl. overhead; measured refs ~3 it/s


def bench_sampling(args) -> dict:
    if args.tiny:
        cfg = tiny_test_config(n_loras=1)
        size, steps, batch = 64, 4, 2
    else:
        cfg = ctrlora_inference_config(lora_num=1, lora_rank=128)
        size, steps, batch = args.size, args.steps, args.batch

    pipe = CtrLoraPipeline(cfg)
    params = pipe.init(jax.random.PRNGKey(0), image_size=8)
    lat = size // (2 ** (len(cfg.vae.ch_mult) - 1))

    # inference-path optimizations (both on by default): fold the LoRA into
    # the base weights, and cast kernels to bf16 once outside the scan
    from ctrlora_tpu.lora_fuse import cast_params_for_inference, fuse_control_tree

    fused = None
    if not args.no_fuse and cfg.control.lora.n_loras > 0:
        fused = fuse_control_tree(params.control, 0, cfg.control.lora)
    if not args.fp32_params:
        params = cast_params_for_inference(params)
        if fused is not None:
            fused = cast_params_for_inference(fused)

    hint = jnp.ones((batch, size, size, 3), jnp.float32) * 0.5
    ids = jnp.ones((batch, cfg.clip.max_length), jnp.int32)

    ddim = DDIMConfig(steps=steps, guidance_scale=7.5)

    @jax.jit
    def sample(params, fused, hint, ids, rng):
        ctx = pipe.encode_text_tokens(params, ids)
        uncond = pipe.encode_text_tokens(params, jnp.zeros_like(ids))
        hint_z = pipe.encode_first_stage(params, hint)
        if fused is not None:
            conds = [Conditioning(hint_z, control_params=fused)]
        else:
            conds = [Conditioning(hint_z, lora_idx=jnp.int32(0))]
        z = ddim_sample(
            pipe, params, rng, ctx, uncond, conds, (batch, lat, lat, 4), ddim
        )
        return pipe.decode_first_stage(params, z)

    import numpy as np

    rng = jax.random.PRNGKey(1)
    # warm up + force a REAL host transfer: on remote-execution backends
    # block_until_ready alone can return before the computation ran
    np.asarray(sample(params, fused, hint, ids, rng))
    t0 = time.perf_counter()
    n_rep = args.reps
    outs = [sample(params, fused, hint, ids, jax.random.fold_in(rng, i)) for i in range(n_rep)]
    for o in outs:
        np.asarray(o)
    dt = (time.perf_counter() - t0) / n_rep
    img_per_sec = batch / dt
    return {
        "metric": f"{size}x{size} ddim{steps} b{batch} controlled sampling",
        "value": round(img_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / A100_BASELINE_IMG_PER_SEC, 3),
        "seconds_per_batch": round(dt, 3),
    }


def bench_train(args) -> dict:
    from ctrlora_tpu.training.step import make_train_step
    from ctrlora_tpu.training.train_state import create_train_state

    if args.tiny:
        cfg = tiny_test_config(n_loras=1)
        size, batch = 64, 1
    else:
        cfg = ctrlora_finetune_config(lora_rank=128)
        size, batch = args.size, args.batch

    pipe = CtrLoraPipeline(cfg)
    params = pipe.init(jax.random.PRNGKey(0), image_size=8)
    tcfg = TrainConfig(trainable="lora", batch_size=batch)
    state, tx, _ = create_train_state(params, tcfg)
    step = make_train_step(pipe, tx, tcfg)
    batch_data = {
        "jpg": jnp.zeros((batch, size, size, 3), jnp.float32),
        "hint": jnp.ones((batch, size, size, 3), jnp.float32) * 0.5,
        "token_ids": jnp.ones((batch, cfg.clip.max_length), jnp.int32),
        "task_idx": jnp.zeros((batch,), jnp.int32),
    }
    rng = jax.random.PRNGKey(2)
    state, m = step(state, batch_data, rng)
    float(m["loss"])  # compile+warm, forced host transfer
    t0 = time.perf_counter()
    for _ in range(args.reps):
        state, m = step(state, batch_data, rng)
    float(m["loss"])  # the step chain is sequential on state
    dt = (time.perf_counter() - t0) / args.reps
    img_per_sec = batch / dt
    return {
        "metric": f"rank-128 lora finetune step b{batch} {size}x{size}",
        "value": round(1.0 / dt, 4),
        "unit": "steps/sec/chip",
        # baseline is the reference's ~3 images/sec at bs1 on one GPU;
        # normalize by training images/sec so batch size doesn't skew it
        "vs_baseline": round(img_per_sec / A100_BASELINE_FT_STEPS_PER_SEC, 3),
        "images_per_sec": round(img_per_sec, 3),
        "seconds_per_step": round(dt, 4),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true", help="CPU-sized smoke bench")
    p.add_argument("--train", action="store_true", help="bench finetune step")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--no_fuse", action="store_true", help="keep runtime LoRA (unfused)")
    p.add_argument("--fp32_params", action="store_true", help="fp32 master params in the scan")
    args = p.parse_args()
    result = bench_train(args) if args.train else bench_sampling(args)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
