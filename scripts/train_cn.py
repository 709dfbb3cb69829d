#!/usr/bin/env python
"""Baseline trainers: vanilla ControlNet and ControlNet-Lite
(reference: scripts/train_cn.py, train_cnlite.py — same trainer shape as the
ctrlora scripts but with image-hint control branches and all control params
trainable).

  python scripts/train_cn.py --variant controlnet --dataroot ... --sd_ckpt ... --cn_ckpt ...
  python scripts/train_cn.py --variant lite ...
"""

import argparse
import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ctrlora_tpu.utils.platform import ensure_platform_from_env

ensure_platform_from_env()

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", choices=["controlnet", "lite", "xs"], default="controlnet")
    p.add_argument("--dataroot", type=str, required=True)
    p.add_argument("--multigen20m", action="store_true")
    p.add_argument("--task", type=str, default=None)
    p.add_argument("--subset", type=int, default=0)
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--sd_ckpt", type=str, default=None)
    p.add_argument("--cn_ckpt", type=str, default=None)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("-n", "--name", type=str, default=None)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--bs", type=int, default=1)
    p.add_argument("--max_steps", type=int, default=100_000)
    p.add_argument("--gradacc", type=int, default=1)
    p.add_argument("--drop_rate", type=float, default=0.3)
    p.add_argument("--img_logger_freq", type=int, default=1000)
    p.add_argument("--ckpt_logger_freq", type=int, default=1000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel size: train over a (data, model) "
                        "mesh with attention heads / GEGLU hidden sharded "
                        "over N-way model parallelism (must divide device "
                        "count; parallel/tp.py)")
    p.add_argument("--use_ema", action="store_true", help="EMA of trainable params")
    p.add_argument("--shard_opt_state", action="store_true", help="ZeRO-style Adam-moment sharding")
    p.add_argument("--num_workers", type=int, default=16)
    args = p.parse_args()

    from ctrlora_tpu.configs import (
        TrainConfig, cnlite_config, cnxs_config, load_model_config, sd15_config,
    )
    from ctrlora_tpu.data.datasets import CustomDataset, MultiGen20M
    from ctrlora_tpu.data.loader import Loader
    from ctrlora_tpu.data.scheduler import SingleTaskSchedule
    from ctrlora_tpu.parallel.mesh import init_distributed
    from ctrlora_tpu.pipeline import CtrLoraPipeline
    from ctrlora_tpu.training.trainer import Trainer, make_image_log_hook
    from ctrlora_tpu.utils.loading import load_ctrlora

    init_distributed()
    if args.config:
        cfg = load_model_config(args.config)
    else:
        cfg = {"lite": cnlite_config, "xs": cnxs_config,
               "controlnet": sd15_config}[args.variant]()
    pipe = CtrLoraPipeline(cfg)

    if args.multigen20m:
        ds = MultiGen20M(
            os.path.join(args.dataroot, "json_files",
                         f"aesthetics_plus_all_group_{args.task}_all.json"),
            args.dataroot, args.task, drop_rate=args.drop_rate,
        )
    else:
        ds = CustomDataset(args.dataroot, drop_rate=args.drop_rate, resolution=512)
    size = min(len(ds), args.subset) if args.subset > 0 else len(ds)
    global_bs = args.bs * jax.process_count()
    sched = SingleTaskSchedule(size=size, batch_size=global_bs, seed=args.seed)
    loader = Loader(
        [ds], sched, num_workers=args.num_workers,
        host_id=jax.process_index(), host_count=jax.process_count(),
        max_length=cfg.clip.max_length,
    )

    params = load_ctrlora(
        pipe, args.sd_ckpt, args.cn_ckpt, basecn_skip="lora", seed=args.seed
    )
    tcfg = TrainConfig(
        learning_rate=args.lr, batch_size=args.bs, grad_accum=args.gradacc,
        max_steps=args.max_steps, trainable="all", seed=args.seed,
        ckpt_every=args.ckpt_logger_freq, image_log_every=args.img_logger_freq,
        use_ema=args.use_ema, shard_opt_state=args.shard_opt_state,
    )
    name = args.name or datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
    trainer = Trainer(pipe, tcfg, os.path.join("runs", name), params=params,
                      tp=args.tp)
    if args.resume:
        trainer.restore(args.resume)
    hook = make_image_log_hook(pipe, trainer.workdir)
    trainer.fit(loader.iterate(int(trainer.state.step)), sample_hook=hook)
    trainer.save(int(trainer.state.step))


if __name__ == "__main__":
    main()
