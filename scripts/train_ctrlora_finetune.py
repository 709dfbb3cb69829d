#!/usr/bin/env python
"""Novel-condition LoRA finetune (reference: scripts/train_ctrlora_finetune.py).

Examples:
  python scripts/train_ctrlora_finetune.py \
      --dataroot data/mycondition --sd_ckpt ckpts/v1-5-pruned.ckpt \
      --cn_ckpt ckpts/ctrlora_sd15_basecn700k.ckpt \
      --lora_rank 128 --bs 1 --max_steps 1000 --name mycondition

  # MultiGen-20M single task:
  python scripts/train_ctrlora_finetune.py --multigen_json path/to/task.json \
      --multigen_meta path/to/meta --task lineart ...
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ctrlora_tpu.utils.platform import ensure_platform_from_env

ensure_platform_from_env()

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", type=str, help="CustomDataset root")
    p.add_argument("--multigen_json", type=str)
    p.add_argument("--multigen_meta", type=str)
    p.add_argument("--task", type=str, default=None)
    p.add_argument("--sd_ckpt", type=str, default=None)
    p.add_argument("--cn_ckpt", type=str, default=None)
    p.add_argument("--resume", type=str, default=None, help="orbax ckpt dir")
    p.add_argument("--config", type=str, default=None,
                   help="preset name or YAML (default: ctrlora_finetune)")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--lora_rank", type=int, default=128)
    p.add_argument("--ft_with_lora", action="store_true", default=True)
    p.add_argument("--no_lora", dest="ft_with_lora", action="store_false")
    p.add_argument("--norm_trainable", action="store_true", default=True)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--bs", type=int, default=1)
    p.add_argument("--gradacc", type=int, default=1)
    p.add_argument("--max_steps", type=int, default=100_000)
    p.add_argument("--drop_rate", type=float, default=0.3)
    p.add_argument("--img_logger_freq", type=int, default=1000)
    p.add_argument("--ckpt_logger_freq", type=int, default=1000)
    p.add_argument("--name", type=str, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel size: train over a (data, model) "
                        "mesh with attention heads / GEGLU hidden sharded "
                        "over N-way model parallelism (must divide device "
                        "count; parallel/tp.py)")
    p.add_argument("--use_ema", action="store_true", help="EMA of trainable params")
    p.add_argument("--shard_opt_state", action="store_true", help="ZeRO-style Adam-moment sharding")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--cache_latents", action="store_true",
                   help="encode the dataset's VAE posterior moments once and "
                        "train from the cache (exact: the per-step posterior "
                        "sample keeps its own rng; CustomDataset only — its "
                        "pipeline has no pixel augmentation). Skips the "
                        "frozen-encoder work, ~41%% of the finetune step.")
    args = p.parse_args()

    from ctrlora_tpu.configs import TrainConfig, ctrlora_finetune_config
    from ctrlora_tpu.data.datasets import CustomDataset, MultiGen20M
    from ctrlora_tpu.data.loader import Loader
    from ctrlora_tpu.data.scheduler import SingleTaskSchedule
    from ctrlora_tpu.parallel.mesh import init_distributed
    from ctrlora_tpu.pipeline import CtrLoraPipeline
    from ctrlora_tpu.training.trainer import Trainer, make_image_log_hook
    from ctrlora_tpu.utils.loading import load_ctrlora

    init_distributed()
    if args.config:
        from ctrlora_tpu.configs import load_model_config

        cfg = load_model_config(args.config)
    else:
        cfg = ctrlora_finetune_config(
            lora_rank=args.lora_rank, ft_with_lora=args.ft_with_lora
        )
    pipe = CtrLoraPipeline(cfg)

    if args.dataroot:
        ds = CustomDataset(
            args.dataroot, drop_rate=args.drop_rate, resolution=args.resolution
        )
    else:
        assert args.multigen_json and args.multigen_meta and args.task
        ds = MultiGen20M(
            args.multigen_json, args.multigen_meta, args.task, drop_rate=args.drop_rate
        )
    params = load_ctrlora(
        pipe, args.sd_ckpt, args.cn_ckpt, basecn_skip="lora", seed=args.seed
    )

    if args.cache_latents:
        if not args.dataroot:
            raise SystemExit("--cache_latents requires --dataroot "
                             "(MultiGen's random crop defeats the cache)")
        from ctrlora_tpu.training.latent_cache import (
            LatentCachedDataset, precompute_moments,
        )

        jm, hm = precompute_moments(pipe, params, ds)
        ds = LatentCachedDataset(ds, jm, hm)

    global_bs = args.bs * jax.process_count()
    sched = SingleTaskSchedule(size=len(ds), batch_size=global_bs, seed=args.seed)
    loader = Loader(
        [ds], sched, num_workers=args.num_workers,
        host_id=jax.process_index(), host_count=jax.process_count(),
        max_length=cfg.clip.max_length,
    )
    tcfg = TrainConfig(
        learning_rate=args.lr, batch_size=args.bs, grad_accum=args.gradacc,
        max_steps=args.max_steps,
        trainable="lora" if args.ft_with_lora else "full",
        norm_trainable=args.norm_trainable, seed=args.seed,
        ckpt_every=args.ckpt_logger_freq, image_log_every=args.img_logger_freq,
        use_ema=args.use_ema, shard_opt_state=args.shard_opt_state,
    )
    import datetime

    name = args.name or datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
    workdir = os.path.join("runs", name)
    trainer = Trainer(pipe, tcfg, workdir, params=params, tp=args.tp)
    if args.resume:
        trainer.restore(args.resume)
    hook = make_image_log_hook(pipe, workdir)
    trainer.fit(loader.iterate(int(trainer.state.step)), sample_hook=hook)
    trainer.save(int(trainer.state.step))


if __name__ == "__main__":
    main()
