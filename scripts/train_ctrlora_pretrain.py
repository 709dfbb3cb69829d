#!/usr/bin/env python
"""Base ControlNet + per-task LoRA pretraining on MultiGen-20M
(reference: scripts/train_ctrlora_pretrain.py).

Every batch carries ONE task (the deterministic multi-task schedule), whose
integer id selects the active LoRA bank inside the jitted step.

  python scripts/train_ctrlora_pretrain.py \
      --json_dir data/multigen/json_files --meta_dir data/multigen \
      --tasks hed canny seg depth normal openpose hedsketch bbox outpainting \
      --sd_ckpt ... --cn_ckpt ... --bs 4 --gradacc 4
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
    p.add_argument("--json_dir", type=str, required=True)
    p.add_argument("--meta_dir", type=str, required=True)
    p.add_argument("--tasks", nargs="+", default=list(
        ("hed", "canny", "seg", "depth", "normal", "openpose", "hedsketch",
         "bbox", "outpainting")
    ))
    p.add_argument("--config", type=str, default=None,
                   help="preset name or YAML (default: ctrlora_pretrain)")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--sd_ckpt", type=str, default=None)
    p.add_argument("--cn_ckpt", type=str, default=None, help="control init (tool_make_control_init)")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--lora_rank", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--bs", type=int, default=4, help="per-host batch size")
    p.add_argument("--gradacc", type=int, default=1)
    p.add_argument("--max_steps", type=int, default=700_000)
    p.add_argument("--drop_rate", type=float, default=0.3)
    p.add_argument("--img_logger_freq", type=int, default=10_000)
    p.add_argument("--ckpt_logger_freq", type=int, default=10_000)
    p.add_argument("--name", type=str, default=None)
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

    from ctrlora_tpu.configs import TrainConfig, ctrlora_pretrain_config
    from ctrlora_tpu.data.datasets import MultiGen20M
    from ctrlora_tpu.data.loader import Loader
    from ctrlora_tpu.data.scheduler import MultiTaskSchedule
    from ctrlora_tpu.parallel.mesh import init_distributed
    from ctrlora_tpu.pipeline import CtrLoraPipeline
    from ctrlora_tpu.training.trainer import Trainer, make_image_log_hook
    from ctrlora_tpu.utils.loading import load_ctrlora

    init_distributed()
    if args.config:
        import dataclasses as _dc

        from ctrlora_tpu.configs import LoRAConfig, load_model_config

        cfg = load_model_config(args.config)
        # --tasks is the source of truth for the slot->task mapping (dataset
        # i trains LoRA bank i, and tool_extract_weights names per-slot
        # checkpoints from cfg.tasks) — always sync it, even when the YAML's
        # n_loras already matches, so preset task names can't leak through
        if cfg.control is not None:
            cfg = _dc.replace(
                cfg,
                control=_dc.replace(
                    cfg.control,
                    lora=_dc.replace(cfg.control.lora, n_loras=len(args.tasks)),
                ),
                tasks=tuple(args.tasks),
            )
    else:
        cfg = ctrlora_pretrain_config(tasks=args.tasks, lora_rank=args.lora_rank)
    pipe = CtrLoraPipeline(cfg)

    datasets = [
        MultiGen20M(
            os.path.join(args.json_dir, f"aesthetics_plus_all_group_{t}_all.json"),
            args.meta_dir, t, drop_rate=args.drop_rate,
            resolution=args.resolution,
        )
        for t in args.tasks
    ]
    global_bs = args.bs * jax.process_count()
    sched = MultiTaskSchedule(
        sizes=tuple(len(d) for d in datasets), batch_size=global_bs, seed=args.seed
    )
    loader = Loader(
        datasets, sched, num_workers=args.num_workers,
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
    workdir = os.path.join("runs", name)
    trainer = Trainer(pipe, tcfg, workdir, params=params, tp=args.tp)
    if args.resume:
        trainer.restore(args.resume)
    hook = make_image_log_hook(pipe, workdir)
    trainer.fit(loader.iterate(int(trainer.state.step)), sample_hook=hook)
    trainer.save(int(trainer.state.step))


if __name__ == "__main__":
    main()
